"""Semantic tests for the round-6 third-batch operators (the
star_llmops6 registry rows): Gopher structural rules, tokenizer
fertility, perplexity buckets, curriculum ordering, epoch planning,
hard-negative mining, kNN label voting, Z-order layout, and ANN recall
evaluation. Parity with the DuckDB oracles is covered by
test_oracle_parity; these pin the operator SEMANTICS on constructed
inputs where the expected behavior is derivable by hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from procoggraph_spark.operators.layout import (
    zorder_key,
    zorder_locality_stats,
)
from procoggraph_spark.operators.sampling import (
    curriculum_order,
    epoch_repeat_plan,
)
from procoggraph_spark.operators.similarity import (
    brute_force_topk,
    hard_negative_topk,
    knn_label_vote,
    recall_at_k,
)
from procoggraph_spark.operators.text import (
    gopher_quality_rules,
    perplexity_buckets,
    tokenizer_fertility,
)


def test_gopher_rules_flags(spark):
    """A clean doc passes every rule; a too-short doc, an
    all-duplicates doc, and a no-stopword doc each fail exactly the
    intended rule."""
    clean = (
        "the quick brown fox jumps over the lazy dog and runs to its den "
        "with speed and grace while birds are watching from the old oak"
    )
    rows = [
        (1, clean),
        (2, "too short doc"),  # < 10 words
        (3, " ".join(["the"] * 40)),  # dup_word_frac near 1
        (4, " ".join(f"word{i}" for i in range(40))),  # no stopwords, digits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in gopher_quality_rules(df, id_col="doc_id").collect()
    }
    assert out[1]["gopher_keep"] is True
    assert out[2]["n_words"] == 3 and out[2]["gopher_keep"] is False
    assert out[3]["dup_word_frac"] > 0.9 and out[3]["gopher_keep"] is False
    # "word0".."word39" are non-alphabetic (digit suffix) and stopword-free
    assert out[4]["frac_alpha_words"] == 0.0
    assert out[4]["n_stopwords"] == 0 and out[4]["gopher_keep"] is False


def test_tokenizer_fertility_counts(spark):
    """'ab1c de' is 4 BPE-ish tokens (ab / 1 / c / de) over 2 words —
    fertility 2.0; chars per BPE token counts the raw length."""
    df = spark.createDataFrame(
        [(1, "en", "s", "ab1c de"), (2, "en", "s", "ab1c de")],
        "doc_id long, lang string, source string, text string",
    )
    row = tokenizer_fertility(df, group_cols=("lang", "source")).collect()[0]
    assert row["n_docs"] == 2
    assert row["n_bpe_tokens"] == 8 and row["n_ws_tokens"] == 4
    assert row["fertility"] == 2.0
    assert row["chars_per_bpe_token"] == round(14 / 8, 6)


def test_perplexity_buckets_rank_common_vs_rare(spark):
    """Docs made of the corpus's most common word must land in bucket 1
    (lowest cross-entropy) of their source; docs of unique words in the
    last bucket. Bucket sizes split the source evenly."""
    common = [(i, "a a a a", "s") for i in range(4)]
    rare = [(10 + i, f"z{i} y{i} x{i} w{i}", "s") for i in range(8)]
    df = spark.createDataFrame(
        common + rare, "doc_id long, text string, source string"
    )
    out = perplexity_buckets(df, source_col="source", n_buckets=3).collect()
    by_bucket = {r["bucket"]: r for r in out}
    assert set(by_bucket) == {1, 2, 3}
    assert sum(r["n_docs"] for r in out) == 12
    assert by_bucket[1]["avg_score"] < by_bucket[3]["avg_score"]
    # all four common docs rank ahead of every rare doc -> bucket 1
    # (size 4) is exactly the common docs: its token mass is 16
    assert by_bucket[1]["n_docs"] == 4 and by_bucket[1]["total_tokens"] == 16


def test_curriculum_order_bands_and_determinism(spark):
    """Ranks are 1..k, bands are non-increasing along the schedule, and
    the schedule is identical across reruns (deterministic shuffle)."""
    rows = [
        (i, "the quick brown fox jumps over the lazy dog and more " * 3)
        for i in range(20)
    ] + [(100 + i, "zz qq ww") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = curriculum_order(df, k=30).collect()
    b = curriculum_order(df, k=30).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == list(
        range(1, 31)
    )
    bands = [r["band"] for r in sorted(a, key=lambda r: r["rank"])]
    assert bands == sorted(bands, reverse=True)
    # high-quality docs all schedule before the junk docs
    first20 = {r["doc_id"] for r in a if r["rank"] <= 20}
    assert first20 == set(range(20))


def test_epoch_plan_caps_repeats(spark):
    """A tiny source allocated more than max_epochs x its unique tokens
    is capped (excess > 0, epochs_served == max_epochs); a huge source
    takes its full allocation (excess == 0)."""
    rows = [(i, "big", 1000) for i in range(400)] + [(1000, "tiny", 40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {
        r["source"]: r
        for r in epoch_repeat_plan(
            df, budget=100_000, max_epochs=4
        ).collect()
    }
    tiny, big = out["tiny"], out["big"]
    assert tiny["served_tokens"] == 4 * 40
    assert tiny["excess_tokens"] == tiny["alloc_tokens"] - 160 > 0
    assert tiny["epochs_served"] == 4.0
    assert big["excess_tokens"] == 0
    assert big["served_tokens"] == big["alloc_tokens"]


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negatives_exclude_same_label(spark):
    """Nearest same-label vector is skipped; nearest different-label
    vector ranks first even though it is farther."""
    df = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 1),
            (1, [0.99, 0.1], 1),  # closest, same label -> excluded
            (2, [0.7, 0.7], 2),  # closest different-label
            (3, [0.0, 1.0], 2),
            (4, [-1.0, 0.0], 3),
        ],
    )
    out = hard_negative_topk(
        df, df.filter(F.col("vec_id") == 0), k=2
    ).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [2, 3]
    assert all(r["neighbor_label"] != r["query_label"] for r in out)


def test_knn_label_vote_majority_and_tiebreak(spark):
    """2-of-3 majority wins; on a vote tie the smaller label wins."""
    labeled = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 7),
            (2, [0.9, 0.1], 7),
            (3, [0.8, 0.3], 9),
        ],
    )
    unlabeled = _vecs(spark, [(100, [1.0, 0.05], 0)]).drop("label")
    row = knn_label_vote(labeled, unlabeled, k=3).collect()[0]
    assert row["pred_label"] == 7 and row["n_votes"] == 2
    assert row["vote_frac"] == round(2 / 3, 6)
    # tie: two neighbors, one vote each -> smaller label
    row2 = knn_label_vote(
        labeled.filter(F.col("vec_id") >= 2), unlabeled, k=2
    ).collect()[0]
    assert row2["pred_label"] == 7 and row2["n_votes"] == 1


def test_zorder_key_interleave_and_tile_bounds(spark):
    """zorder_key(2, 1) = bit1-of-x at pos 2 (4) + bit0-of-y at pos 1
    (2) = 6; every bucket of the locality stats bounds both dims to a
    16x16 tile (area <= 256) with bits=8, bucket_shift=8."""
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 256, 7) for y in range(0, 256, 11)],
        "zx long, zy long",
    )
    probe = spark.createDataFrame([(2, 1)], "zx long, zy long").select(
        zorder_key(F.col("zx"), F.col("zy")).alias("z")
    )
    assert probe.collect()[0]["z"] == 6
    stats = zorder_locality_stats(df, "zx", "zy").collect()
    assert all(r["tile_area"] <= 256 for r in stats)
    assert all(
        r["x_max"] - r["x_min"] <= 15 and r["y_max"] - r["y_min"] <= 15
        for r in stats
    )
    assert sum(r["n_rows"] for r in stats) == df.count()


def test_recall_at_k_counts_overlap(spark):
    """recall = |approx ∩ exact| / |exact| per query; a query missing
    from the approx side scores 0.0 (left join, not dropped)."""
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, neighbor_id long"
    )
    approx = spark.createDataFrame(
        [(1, 11), (1, 99)], "query_id long, neighbor_id long"
    )
    out = {r["query_id"]: r for r in recall_at_k(approx, exact).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["recall"] == 0.5
    assert out[2]["n_hits"] == 0 and out[2]["recall"] == 0.0


def test_recall_eval_self_consistency(spark):
    """Brute force against itself is recall 1.0 everywhere."""
    import random

    rng = random.Random(7)
    df = _vecs(
        spark,
        [
            (i, [rng.uniform(-1, 1) for _ in range(4)], i % 3)
            for i in range(30)
        ],
    )
    q = df.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(df, q, k=5)
    out = recall_at_k(exact, exact).collect()
    assert len(out) == 3 and all(r["recall"] == 1.0 for r in out)
