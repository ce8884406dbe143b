"""Round-6 additions: portable-oracle twins for the engine-hash ANN /
dedup operators the driver could previously only rows-check.

Placed directly after star_llmops2/3 in the registry union so these
rows land inside the round-6 driver sample window (pinned by
tests/test_oracle_parity.py::test_driver_window_rotation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procoggraph_spark.operators import dedup as D
from procoggraph_spark.queries.common import t

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


# --- MinHash + LSH near-dup: portable-hash twin (oracle-backed) ------------
# Same signature -> banded-bucket-join -> estimate pipeline as
# dedup_minhash_lsh, but the per-shingle hash is the portable
# positional-fingerprint + CMS affine mixers (plain int64 arithmetic,
# see operators/sketches) and band buckets key on the exact concatenated
# band values, so DuckDB rebuilds the identical signatures and the
# all-pairs slice comparison in SQL equals the banded equi-join exactly
# (collision-free band keys make "bucket collision" == "band slices
# value-equal").

_MINHASH_PORTABLE_SQL = r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      FROM documents WHERE doc_id < 150
    ),
    sh AS (
      SELECT DISTINCT doc_id, g AS s
      FROM w, LATERAL unnest(list_transform(generate_series(1, len(w) - 1),
                                            i -> w[i] || ' ' || w[i + 1])) AS u(g)
    ),
    fp AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(1, least(length(s), 64)),
                  i -> ascii(substr(s, i, 1)) * i)) % 2147483647 AS BIGINT) AS h
      FROM sh
    ),
    mh AS (
      SELECT doc_id, i,
             MIN((h * (2654435761 + i * 40503) + i * 1009) % 2147483648) AS mv
      FROM fp CROSS JOIN generate_series(0, 63) AS g(i)
      GROUP BY doc_id, i
    ),
    sig AS (SELECT doc_id, list(mv ORDER BY i) AS sg FROM mh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             list_sum(list_transform(generate_series(0, 15),
                  bi -> CASE WHEN a.sg[bi * 4 + 1] = b.sg[bi * 4 + 1]
                              AND a.sg[bi * 4 + 2] = b.sg[bi * 4 + 2]
                              AND a.sg[bi * 4 + 3] = b.sg[bi * 4 + 3]
                              AND a.sg[bi * 4 + 4] = b.sg[bi * 4 + 4]
                             THEN 1 ELSE 0 END)) AS nb,
             list_sum(list_transform(generate_series(1, 64),
                  i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / 64.0
               AS est
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(nb AS BIGINT) AS n_bands_matched,
           ROUND(est, 6) AS est_jaccard
    FROM pairs WHERE nb >= 1 AND est >= 0.2
    """


@q("dedup_minhash_lsh_portable", _MINHASH_PORTABLE_SQL)
def dedup_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures + banded LSH candidate pairs with estimated
    Jaccard — the portable-arithmetic twin of dedup_minhash_lsh
    (positional shingle fingerprints + affine-mixer permutations,
    value-exact band keys), hash-compared against a DuckDB twin that
    replays signatures, banding, and the estimate end-to-end."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    sigs = D.minhash_signatures(
        d, id_col="doc_id", text_col="text", n=2, num_hashes=64, portable=True
    )
    est = D.minhash_lsh_pairs(
        sigs, id_col="doc_id", bands=16, rows_per_band=4, portable_bands=True
    )
    return est.filter(F.col("est_jaccard") >= 0.2).select(
        "id_a", "id_b", "n_bands_matched", "est_jaccard"
    )
