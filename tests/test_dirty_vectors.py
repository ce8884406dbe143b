"""Dimension-coherence contract pins (ragged-vectors fuzz campaign,
round 10): a vector whose length differs from the table's dominant
(modal, tie -> smallest) length — truncated writes, mixed model
versions, empty emissions — degrades to a NULL vector at the
``t()``-level load boundary (``queries.common.valid_dim``), on BOTH
engines (SQL twin ``_EMB_GATED_CTE`` via ``gate_embeddings_oracle``).

Without the gate the family is engine-dependent: DuckDB's
list_inner_product RAISES on a length mismatch while Spark's zip_with
NULL-pads (13 divergent on the fuzz sweep when the leg landed).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from procoggraph_spark.queries.common import (
    _EMB_GATED_CTE,
    gate_embeddings_oracle,
    valid_dim,
)


def _corpus(spark):
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0], 1),   # coherent
        (1, [5.0, 6.0, 7.0, 8.0], 2),   # coherent
        (2, [1.0, 2.0], 1),             # truncated
        (3, [1.0] * 6, 2),              # over-long
        (4, [], 1),                     # empty emission
        (5, None, 2),                   # NULL (already-pinned contract)
        (6, [9.0, 8.0, 7.0, 6.0], 3),   # coherent
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_valid_dim_degrades_ragged_to_null(spark):
    df = _corpus(spark)
    out = valid_dim(df)
    got = {r["vec_id"]: r["embedding"] for r in out.collect()}
    # every row survives (the gate nulls the vector, never drops rows)
    assert set(got) == set(range(7))
    assert got[2] is None and got[3] is None and got[4] is None
    assert got[5] is None
    assert [round(x) for x in got[0]] == [1, 2, 3, 4]
    assert [round(x) for x in got[6]] == [9, 8, 7, 6]


def test_valid_dim_modal_tie_breaks_smallest(spark):
    # two lengths with equal support: the dominant dim is the SMALLER
    # (deterministic on both engines; _dominant_dim agrees driver-side)
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [1.0] * 3), (3, [2.0] * 3)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["embedding"] for r in valid_dim(df).collect()}
    assert got[0] is not None and got[1] is not None
    assert got[2] is None and got[3] is None


def test_valid_dim_all_null_table_keeps_rows(spark):
    # NULL-payload sweep shape: no non-NULL vector exists, the dominant
    # dim is NULL, every embedding stays NULL — and NO row is lost to
    # the broadcast join (the global agg emits exactly one NULL row)
    df = spark.createDataFrame(
        [(0, None, 1), (1, None, 2)],
        "vec_id long, embedding array<float>, label int",
    )
    out = valid_dim(df).collect()
    assert len(out) == 2
    assert all(r["embedding"] is None for r in out)


def test_valid_dim_matches_sql_twin(spark, tmp_path):
    # the two faces of the contract must agree row-for-row on the same
    # parquet — including which ids keep a vector and which degrade
    df = _corpus(spark)
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    spark_kept = {
        r["vec_id"]
        for r in valid_dim(spark.read.parquet(path))
        .filter(F.col("embedding").isNotNull())
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW main.embeddings AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    sql = gate_embeddings_oracle(
        "SELECT vec_id FROM embeddings WHERE embedding IS NOT NULL"
    )
    assert sql.startswith("WITH emb_dim")
    assert _EMB_GATED_CTE in sql
    duck_kept = {r[0] for r in con.execute(sql).fetchall()}
    con.close()
    assert spark_kept == duck_kept == {0, 1, 6}


def test_valid_dim_partition_invariant(spark):
    df = _corpus(spark)
    a = sorted(
        (r["vec_id"], r["embedding"] is None)
        for r in valid_dim(df.repartition(7)).collect()
    )
    b = sorted(
        (r["vec_id"], r["embedding"] is None)
        for r in valid_dim(df.coalesce(1)).collect()
    )
    assert a == b


def test_valid_dim_degrades_null_component_vectors(spark):
    """Round-11 NULL-component leg: a RIGHT-LENGTH vector carrying NULL
    elements (join-assembled vector with a missing feature, JSON null
    mid-array) degrades to a NULL vector at load, like ragged output.
    Without the gate, numpy reads None as NaN (silent rank poison)
    while DuckDB's list_inner_product raises (17 divergent when the
    leg landed)."""
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0], 1),       # clean
        (1, [1.0, None, 3.0, 4.0], 2),      # one NULL hole
        (2, [None, None, None, None], 1),   # all-NULL, right length
        (3, [5.0, 6.0, 7.0, 8.0], 2),       # clean
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {r["vec_id"]: r["embedding"] for r in valid_dim(df).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[1] is None and got[2] is None
    assert [round(x) for x in got[0]] == [1, 2, 3, 4]
    assert [round(x) for x in got[3]] == [5, 6, 7, 8]


def test_emb_gate_sql_twin_protects_inner_product(spark, tmp_path):
    """The SQL twin must not just NULL the holed row — DuckDB's
    vectorized list_inner_product validates the chunk's CHILD buffer
    globally, so a NULL element anywhere in the scanned chunk crashes
    every consumer even after a CASE degrade or a row filter
    (selection vectors keep the dirty child buffer). The CTE's
    list_transform+coalesce rebuild is the load-bearing part: the
    gated view must be safe to feed straight into list_inner_product,
    and must hash-match the Spark-side valid_dim load."""
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0], 1),
        (1, [1.0, None, 3.0, 4.0], 2),
        (2, [None, None, None, None], 3),
        (3, [5.0, 6.0, 7.0, 8.0], 4),
        (4, [1.0, 2.0], 5),   # ragged too, same table
        (5, None, 6),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    sql = gate_embeddings_oracle(
        "SELECT vec_id, "
        "list_inner_product(CAST(embedding AS DOUBLE[]), "
        "CAST(embedding AS DOUBLE[])) AS n2 FROM embeddings ORDER BY vec_id"
    )
    got = con.execute(sql).fetchall()
    # no crash; holed/ragged/NULL rows -> NULL, clean rows -> real norms
    assert [r[0] for r in got] == [0, 1, 2, 3, 4, 5]
    assert got[0][1] == 30.0 and got[3][1] == 174.0
    assert all(got[i][1] is None for i in (1, 2, 4, 5))
    # and the gated view matches the Spark-side load value-for-value
    spark_side = {
        r["vec_id"]: r["embedding"] for r in valid_dim(df).collect()
    }
    duck_side = {
        r[0]: r[1]
        for r in con.execute(
            gate_embeddings_oracle(
                "SELECT vec_id, embedding FROM embeddings"
            )
        ).fetchall()
    }
    assert set(spark_side) == set(duck_side)
    for k in spark_side:
        if spark_side[k] is None:
            assert duck_side[k] is None
        else:
            assert [round(float(x), 6) for x in spark_side[k]] == [
                round(float(x), 6) for x in duck_side[k]
            ]


def test_medoid_row_identity_under_replayed_ids(spark, tmp_path):
    """Row-identity contract (flatline fuzz, round 12): distance is a
    property of the physical ROW, not the id key. A replayed vec_id —
    two rows, perturbed payloads — must NOT have its two deviation
    sums conflated into one doubled d2 (the old oracle's unnest +
    GROUP BY vec_id did exactly that, electing a different medoid per
    engine once the duplicated id became the borderline argmin). The
    closest ROW wins even when its id is duplicated."""
    import os

    from procoggraph_spark.queries import registry

    # label 7 centroid: dim0 = (2+2.4+2.3+0)/4 = 1.675, dims 1-3 = 2.
    # Per-row d2: id1-row-a 0.1056 (argmin), id1-row-b 0.5256, id2
    # 0.3906, id3 2.8056. Conflated by id, id1 sums to 0.6312 and
    # LOSES to id2 — exactly the old oracle's wrong election.
    rows = [
        (1, [2.0, 2.0, 2.0, 2.0], 7),
        (1, [2.4, 2.0, 2.0, 2.0], 7),   # replay, perturbed re-encode
        (2, [2.3, 2.0, 2.0, 2.0], 7),
        (3, [0.0, 2.0, 2.0, 2.0], 7),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    )
    sf = str(tmp_path)
    df.write.parquet(os.path.join(sf, "embeddings.parquet"))

    qs, osql = registry()
    got = {r["label"]: r for r in qs["emb_centroid_medoid"](spark, sf).collect()}
    assert got[7]["medoid_vec_id"] == 1
    assert got[7]["n_vectors"] == 4  # both replay rows count

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    oracle = {r[0]: r for r in con.execute(osql["emb_centroid_medoid"]).fetchall()}
    assert oracle[7][3] == 1, "oracle conflated the replayed id's rows"
    srow = got[7]
    assert (srow["n_vectors"], float(srow["centroid_norm"]),
            srow["medoid_vec_id"], float(srow["medoid_dist"])) == (
        oracle[7][1], float(oracle[7][2]), oracle[7][3], float(oracle[7][4]))
