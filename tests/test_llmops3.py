"""Semantics tests for the round-5 third-batch operators: containment
near-dup, incremental-ingest dedup, per-source caps, Zipf auditing, and
embedding outlier QA. Oracle parity for the five registry queries runs
in test_oracle_parity.py; these pin the operator CONTRACTS (direction,
decision taxonomy, determinism, planted-outlier recall) that a
value-hash alone doesn't express.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from procoggraph_spark.operators.dedup import (
    containment_pairs,
    incremental_ingest_dedup,
)
from procoggraph_spark.operators.sampling import exact_k_per_group


def test_containment_direction_and_value(spark):
    # doc 2's bigram set is a strict subset of doc 1's; doc 3 unrelated
    long = "the quick brown fox jumps over the lazy dog tonight"
    short = "quick brown fox jumps over"
    docs = spark.createDataFrame(
        [(1, long), (2, short), (3, "completely different words here now")],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, n=2, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    # the SHORT doc is the contained side, fully covered
    assert (r.contained_id, r.container_id) == (2, 1)
    assert r.containment == 1.0


def test_containment_tie_breaks_by_id(spark):
    docs = spark.createDataFrame(
        [(7, "alpha beta gamma"), (4, "alpha beta gamma")],
        "doc_id long, text string",
    )
    r = containment_pairs(docs, n=2, threshold=0.9).collect()[0]
    assert (r.contained_id, r.container_id) == (4, 7)


def test_containment_hot_shingle_guard_drops_boilerplate(spark):
    # "of the" appears in every doc; with the cap at 2 it is excluded
    # from the shingle universe, so the otherwise-disjoint docs share
    # nothing and no pair survives.
    docs = spark.createDataFrame(
        [(i, f"unique{i} words of the page {i}") for i in range(5)],
        "doc_id long, text string",
    )
    assert containment_pairs(docs, n=2, threshold=0.2, max_shingle_df=2).count() == 0


def test_incremental_ingest_decisions(spark):
    history = spark.createDataFrame(
        [(100, "already ingested"), (101, "also ingested")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "brand new content"),
            (2, "already ingested"),   # in history
            (3, "brand new content"),  # dup of 1 within the batch
            (4, "also ingested"),      # in history
            (5, "another new one"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.decision
        for r in incremental_ingest_dedup(history, batch).collect()
    }
    assert out == {
        1: "new",
        2: "dup_history",
        3: "dup_batch",
        4: "dup_history",
        5: "new",
    }


def test_incremental_ingest_null_text(spark):
    # NULL text must still be classified (md5(NULL) is NULL — a naive
    # key would silently drop these rows from the inner first-
    # occurrence join): NULL-text rows dedup against each OTHER and
    # against NULL-text history rows under the sentinel key, and never
    # collide with the empty string (md5('') is a real hex digest).
    history = spark.createDataFrame([(100, "seen")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "seen")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.decision
        for r in incremental_ingest_dedup(history, batch).collect()
    }
    assert out == {1: "new", 2: "dup_batch", 3: "new", 4: "dup_history"}

    # NULL-text content already in history classifies as dup_history
    hist_null = spark.createDataFrame([(100, None)], "doc_id long, text string")
    out2 = {
        r.doc_id: r.decision
        for r in incremental_ingest_dedup(
            hist_null, spark.createDataFrame([(1, None)], "doc_id long, text string")
        ).collect()
    }
    assert out2 == {1: "dup_history"}


def test_incremental_ingest_history_beats_batch_order(spark):
    # content in history is dup_history even for the batch's FIRST
    # occurrence — the history check dominates the within-batch rank
    history = spark.createDataFrame([(9, "x")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, "x"), (2, "x")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.decision
        for r in incremental_ingest_dedup(history, batch).collect()
    }
    assert out == {1: "dup_history", 2: "dup_history"}


def test_source_cap_exact_and_rerun_stable(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    a = exact_k_per_group(docs, id_col="doc_id", group_col="source", k=5)
    assert a.groupBy("source").count().rdd.map(lambda r: r["count"]).collect() == [
        5,
        5,
        5,
    ]
    # pure function of (source, id): identical pick across repartitions
    b = exact_k_per_group(
        docs.repartition(13), id_col="doc_id", group_col="source", k=5
    )
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_zipf_slope_matches_closed_form(spark):
    # corpus with exact counts 16/8/4/2/1 → slope of ln c on ln rank is
    # computable in closed form; compare against a numpy-free least
    # squares done right here.
    counts = {"aa": 16, "bb": 8, "cc": 4, "dd": 2, "ee": 1}
    text = " ".join(" ".join([w] * c) for w, c in sorted(counts.items()))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")

    from procoggraph_spark.queries.star_llmops3 import text_zipf_slope

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="zipf_")
    docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    row = text_zipf_slope(spark, d).collect()[0]

    xs = [math.log(r) for r in range(1, 6)]
    ys = [math.log(c) for c in sorted(counts.values(), reverse=True)]
    mx, my = sum(xs) / 5, sum(ys) / 5
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert row.n_terms == 5
    assert abs(row.zipf_slope - round(slope, 6)) < 1e-6


def test_emb_outlier_flags_planted_corrupt_vector(spark):
    import os
    import tempfile

    # 40 well-behaved vectors alternating around 0, one corrupt vector
    # with a wild dimension
    rows = [(i, [((-1.0) ** i) * 0.5, 0.1 * ((-1.0) ** i)], 0) for i in range(40)]
    rows.append((99, [0.5, 50.0], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = tempfile.mkdtemp(prefix="embout_")
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    from procoggraph_spark.queries.star_llmops3 import emb_outlier_zscore

    out = emb_outlier_zscore(spark, d).collect()
    assert [r.vec_id for r in out] == [99]
    assert out[0].max_abs_z > 6.0
    assert out[0].n_dims_over_2 == 1


def test_containment_dominates_jaccard_on_shared_pairs(spark):
    """Cross-operator invariant: containment = i/min(na,nb) ≥
    jaccard = i/(na+nb-i) for every pair, so every pair the Jaccard
    generator reports at a threshold must appear in the containment
    generator's output at the same threshold — with a value at least as
    large. Checked on a seeded random corpus with planted overlaps."""
    import random

    from procoggraph_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(60)]
    rows = []
    for i in range(30):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(20)]
        rows.append((i, " ".join(words)))
        if i % 3 == 0:  # plant an overlapping partner: shared prefix
            rows.append((100 + i, " ".join(words[:12] + ["x%d" % i])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    cont = {}
    for r in containment_pairs(docs, threshold=0.2).collect():
        a, b = sorted((r.contained_id, r.container_id))
        cont[(a, b)] = r.containment

    assert jac, "seeded corpus must produce at least one Jaccard pair"
    for pair, jv in jac.items():
        assert pair in cont, f"{pair} reported by jaccard but not containment"
        assert cont[pair] >= jv - 1e-9, (pair, cont[pair], jv)
