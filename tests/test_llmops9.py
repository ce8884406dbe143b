"""Semantic tests for the star_llmops9 registry rows: MMR diversified
rerank, time-to-conversion, cohort LTV, DAU/WAU stickiness, weekly
streaks, embedding dimension covariance, and the hashing-trick bucket
audit. Oracle parity is covered by test_oracle_parity; these pin
operator SEMANTICS on constructed inputs where the expected answer is
derivable by hand.
"""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from procoggraph_spark.operators.analytics import (
    cohort_ltv,
    dau_stickiness,
    time_to_conversion,
    weekly_streaks,
)
from procoggraph_spark.operators.features import (
    dim_covariance_topk,
    hash_bucket_audit,
)
from procoggraph_spark.operators.similarity import (
    brute_force_topk,
    mmr_diversify,
    rocchio_expand_topk,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ts(d, h=0, m=0):
    return datetime(2024, 1, d, h, m)


# --- MMR -------------------------------------------------------------------


def test_mmr_prefers_diverse_over_redundant(spark):
    """Corpus: query vec 0 along x; candidates 1,2 nearly parallel to
    the query (a near-duplicate pair), candidate 3 moderately relevant
    but orthogonal to 1/2. Plain top-3 would return 1,2,3 in that
    order; MMR at lam=0.5 must pick 1 first (pure relevance), then
    prefer the orthogonal 3 over the redundant 2 at pick 2 (hand math:
    score(2) = 0.5*0.992590 - 0.5*0.999767 < 0 < score(3) =
    0.5*0.707107 - 0.5*0.703520; at lam=0.7 the relevance gap would
    still dominate — the test pins the diversity regime)."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # most relevant
        (2, [0.98, 0.12, 0.0]),  # near-duplicate of 1
        (3, [0.7, 0.0, 0.7]),    # less relevant, orthogonal direction
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_diversify(
        df, df.filter(F.col("vec_id") == 0), k=3, pool=3, lam=0.5, mu=0.5
    ).collect()
    picks = {r["pick"]: r["neighbor_id"] for r in out}
    assert picks[1] == 1
    assert picks[2] == 3  # diversity beats the redundant 2
    assert picks[3] == 2
    # relevance column is the rounded cosine vs the query
    rel1 = [r["cosine_sim"] for r in out if r["neighbor_id"] == 1][0]
    expect = 0.99 / math.sqrt(0.99**2 + 0.1**2)
    assert abs(rel1 - round(expect, 6)) < 1e-9


def test_mmr_first_pick_is_pure_relevance_argmax(spark):
    rows = [(i, [float(i == 0), 0.5, float(i) / 10.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_diversify(
        df, df.filter(F.col("vec_id") == 0), k=2, pool=5
    )
    first = [r for r in out.collect() if r["pick"] == 1][0]
    # argmax of rounded cosine with id tiebreak — must equal the
    # brute-force rank-1 neighbor
    from procoggraph_spark.operators.similarity import brute_force_topk

    bf = brute_force_topk(
        df, df.filter(F.col("vec_id") == 0), k=1
    ).collect()[0]
    assert first["neighbor_id"] == bf["neighbor_id"]


# --- time to conversion ----------------------------------------------------


def test_time_to_conversion_gate_and_non_converters(spark):
    rows = [
        # user 1: view at d1, purchase at d2 -> converts in 86400 s
        (0, _ts(1), 1, "view"), (1, _ts(2), 1, "purchase"),
        # user 2: purchase BEFORE the first view only -> kept, not converted
        (2, _ts(1), 2, "purchase"), (3, _ts(2), 2, "view"),
        # user 3: view, no purchase at all -> kept, not converted
        (4, _ts(1), 3, "view"),
        # user 4: never views -> absent from output
        (5, _ts(1), 4, "purchase"),
    ]
    out = {r["user_id"]: r for r in time_to_conversion(_events(spark, rows)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["converted"] and out[1]["secs_to_convert"] == 86400
    assert not out[2]["converted"] and out[2]["secs_to_convert"] is None
    assert not out[3]["converted"]


def test_time_to_conversion_same_instant_counts(spark):
    rows = [(0, _ts(1), 1, "view"), (1, _ts(1), 1, "purchase")]
    out = time_to_conversion(_events(spark, rows)).collect()[0]
    assert out["converted"] and out["secs_to_convert"] == 0


def test_time_to_conversion_dual_typed_config(spark):
    # start_type == goal_type (r12-advice corner): the single-pass form
    # must keep the old join semantics — the first start event itself
    # satisfies the goal gate (ep >= start_ep), so the user converts at
    # latency 0; a gate on ~_is_start would make such configs never
    # convert
    rows = [(0, _ts(1), 1, "view"), (1, _ts(3), 1, "view")]
    out = time_to_conversion(
        _events(spark, rows), start_type="view", goal_type="view"
    ).collect()[0]
    assert out["converted"] and out["secs_to_convert"] == 0


# --- cohort LTV ------------------------------------------------------------


def test_cohort_ltv_cumulative_and_offsets(spark):
    rows = [
        # customer 1: first order Jan (100.00), again Mar (50.00)
        (1, 1, datetime(2024, 1, 5), 100.0),
        (2, 1, datetime(2024, 3, 10), 50.0),
        # customer 2: also Jan cohort (10.00 Jan only)
        (3, 2, datetime(2024, 1, 20), 10.0),
        # customer 3: Feb cohort
        (4, 3, datetime(2024, 2, 1), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = cohort_ltv(df)
    jan = {r["month_offset"]: r for r in out.collect()
           if r["cohort_month"].month == 1}
    assert jan[0]["revenue_cents"] == 11000 and jan[0]["cohort_size"] == 2
    assert jan[2]["revenue_cents"] == 5000
    assert jan[2]["cum_revenue_cents"] == 16000  # running total skips empty Feb
    feb = [r for r in out.collect() if r["cohort_month"].month == 2]
    assert len(feb) == 1 and feb[0]["cohort_size"] == 1


# --- DAU/WAU stickiness ----------------------------------------------------


def test_dau_stickiness_trailing_seven_days(spark):
    rows = [
        (0, _ts(1), 1, "view"), (1, _ts(1), 2, "view"),   # day 1: users 1,2
        (2, _ts(5), 1, "view"),                            # day 5: user 1
        (3, _ts(9), 3, "view"),                            # day 9: user 3
    ]
    out = {r["day"].day: r for r in dau_stickiness(_events(spark, rows)).collect()}
    assert out[1]["dau"] == 2 and out[1]["wau"] == 2
    # day 5 window covers days 1-5: users {1,2} active, DAU=1
    assert out[5]["dau"] == 1 and out[5]["wau"] == 2
    assert out[5]["stickiness"] == 0.5
    # day 9 window covers days 3-9: day-5 user 1 + day-9 user 3
    assert out[9]["dau"] == 1 and out[9]["wau"] == 2


# --- weekly streaks --------------------------------------------------------


def test_weekly_streaks_gaps_and_islands(spark):
    # weeks of 2024-01: Mondays are Jan 1, 8, 15, 22, 29
    rows = [
        # user 1: active weeks 1,2,3 then gap then week 5 -> streak 3
        (0, _ts(2), 1, "view"), (1, _ts(9), 1, "view"), (2, _ts(16), 1, "view"),
        (3, _ts(30), 1, "view"),
        # user 2: single week -> streak 1
        (4, _ts(4), 2, "view"),
        # user 3: weeks 2,3 -> streak 2 (two events in one week count once)
        (5, _ts(8), 3, "view"), (6, _ts(9), 3, "view"), (7, _ts(15), 3, "view"),
    ]
    out = {r["streak_weeks"]: r["n_users"]
           for r in weekly_streaks(_events(spark, rows)).collect()}
    assert out == {3: 1, 1: 1, 2: 1}


# --- dimension covariance --------------------------------------------------


def test_dim_covariance_planted_correlation(spark):
    """Dims 0 and 1 identical (cov = var > 0), dim 2 constant
    (cov 0 with everything): the (0,1) pair must rank first and its
    covariance must equal the planted population covariance."""
    vals = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, [v, v, 5.0, -v]) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dim_covariance_topk(df, top=10).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    var = sum((v - 2.5) ** 2 for v in vals) / 4
    top2 = {(r["i"], r["j"]): r["cov"] for r in by_rank[:3]}
    # (0,1) cov = +var, (0,3) and (1,3) cov = -var: all tied on |cov|,
    # tiebreak (i, j) ascending
    assert [(r["i"], r["j"]) for r in by_rank[:3]] == [(0, 1), (0, 3), (1, 3)]
    assert top2[(0, 1)] == round(var, 6)
    assert top2[(0, 3)] == round(-var, 6)
    # constant dim contributes zero covariance
    zero = [r for r in out if r["j"] == 2 or r["i"] == 2]
    assert all(r["cov"] == 0.0 for r in zero)


# --- hash bucket audit -----------------------------------------------------


def test_hash_bucket_audit_conservation_and_collisions(spark):
    rows = [(f"feat_{i % 10}",) for i in range(100)]
    df = spark.createDataFrame(rows, "f string")
    out = hash_bucket_audit(df, F.col("f"), n_buckets=4).collect()
    assert sum(r["n_rows"] for r in out) == 100
    assert sum(r["n_features"] for r in out) == 10
    # 10 features into 4 buckets: pigeonhole guarantees a collision
    assert any(r["collided"] for r in out)
    for r in out:
        assert r["collided"] == (r["n_features"] > 1)
        assert 0 <= r["bucket"] < 4
        assert r["example_feature"].startswith("feat_")


# --- recency-weighted engagement ------------------------------------------


def test_recency_engagement_hand_computed(spark):
    """ref = newest event; ages 0 / 7 / 21 days give hyperbolic terms
    1.0, 0.5, 0.25 at halflife 7 — summed per user exactly."""
    rows = [
        (0, _ts(22), 1, "view"),   # age 0 (the ref event) -> 1.0
        (1, _ts(15), 1, "view"),   # age 7 d -> 1/(1+1) = 0.5
        (2, _ts(1), 2, "view"),    # age 21 d -> 1/(1+3) = 0.25
    ]
    from procoggraph_spark.operators.analytics import recency_weighted_engagement

    out = {r["user_id"]: r for r in
           recency_weighted_engagement(_events(spark, rows)).collect()}
    assert out[1]["n_events"] == 2 and out[1]["engagement"] == 1.5
    assert out[2]["n_events"] == 1 and out[2]["engagement"] == 0.25


# --- Rocchio ---------------------------------------------------------------


def test_rocchio_matches_numpy_replay(spark):
    """The full operator must equal a pure-numpy replay of its own
    contract (first-pass rounded-cosine top-feedback, integer-quantized
    centroid, fixed q' expression, rounded re-rank with id tiebreak)."""
    import numpy as np

    rng = np.random.RandomState(7)
    V = rng.rand(30, 8).astype(np.float32)
    rows = [(i, [float(x) for x in V[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = rocchio_expand_topk(
        df, df.filter(F.col("vec_id") == 0), k=5, feedback=3, beta=0.5
    ).collect()
    got = [(r["rank"], r["neighbor_id"], r["cosine_sim"]) for r in
           sorted(out, key=lambda r: r["rank"])]

    Vd = V.astype(np.float64)
    q = Vd[0]

    def topk(qv, k):
        sims = []
        for i in range(30):
            if i == 0:
                continue
            s = round(float(qv @ Vd[i] / (np.linalg.norm(qv) * np.linalg.norm(Vd[i]))), 6)
            sims.append((-s, i))
        sims.sort()
        return [(i, -s) for s, i in sims[:k]]

    fb = [i for i, _ in topk(q, 3)]
    cent_int = np.rint(Vd[fb] * 1_000_000).sum(axis=0)
    qq = np.rint(q * 1_000_000)
    ev = qq / 1e6 + 0.5 * (cent_int / 3.0 / 1e6)
    expect = [(r + 1, i, s) for r, (i, s) in enumerate(topk(ev, 5))]
    assert got == expect


def test_rocchio_pulls_query_toward_feedback_cluster(spark):
    """Query on the x-axis; its 2 nearest neighbors lean toward y.
    The expanded query must move TOWARD the feedback direction: cosine
    to the pure-y document strictly increases, cosine to the
    negative-y documents strictly decreases."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.3]),   # feedback
        (2, [0.9, 0.31]),  # feedback
        (3, [0.2, 0.98]),  # the doc the raw query under-ranks
        (4, [0.6, -0.8]),
        (5, [0.5, -0.87]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    first = brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=5)
    second = rocchio_expand_topk(
        df, df.filter(F.col("vec_id") == 0), k=5, feedback=2, beta=0.5
    )
    s1 = {r["neighbor_id"]: r["cosine_sim"] for r in first.collect()}
    s2 = {r["neighbor_id"]: r["cosine_sim"] for r in second.collect()}
    assert s2[3] > s1[3]          # pulled toward the y direction
    assert s2[4] < s1[4] and s2[5] < s1[5]  # pushed off the -y docs
    assert s2[1] > s1[1]          # feedback docs themselves gain too


# --- A/B SRM ---------------------------------------------------------------


def test_ab_srm_balanced_and_broken_segments(spark):
    """A balanced segment must not flag; a segment where one arm got
    (almost) nothing must flag with the dominant chi2; a zero-unit arm
    must be materialized as an n=0 row."""
    from procoggraph_spark.operators.analytics import ab_assignment_srm
    from procoggraph_spark.operators.sampling import hash_bucket

    # segment 'ok': ids 0..199 (hash splits them ~50/50)
    rows = [(i, "ok") for i in range(200)]
    # segment 'broken': 60 ids all FORCED into arm 0 by construction —
    # pick ids whose portable hash lands in arm 0
    probe = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    ).select("doc_id", hash_bucket(F.col("doc_id"), buckets=2).alias("a"))
    arm0_ids = [r["doc_id"] for r in probe.filter("a = 0").limit(60).collect()]
    rows += [(i, "broken") for i in arm0_ids]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = ab_assignment_srm(df).collect()
    ok = [r for r in out if r["segment"] == "ok"]
    broken = {r["arm"]: r for r in out if r["segment"] == "broken"}
    assert len(ok) == 2 and not any(r["srm_flag"] for r in ok)
    # the empty arm is present with n=0, and the flag fires (chi2 = n)
    assert broken[1]["n"] == 0
    assert broken[0]["n"] == 60
    assert all(r["srm_flag"] for r in broken.values())
    assert broken[0]["chi2"] == 60.0


# --- language-ID confusion -------------------------------------------------


def test_langid_confusion_counts_and_shares(spark):
    """Constructed corpus with known predictions: counts land in the
    right (label, pred) cells, row shares sum to 1 per label, and the
    correct flag mirrors the diagonal."""
    from procoggraph_spark.queries.star_llmops9 import text_langid_confusion

    rows = [
        (0, "the cat is of the house", "en", "src", 23),   # pred en, label en
        (1, "the dog and the bird", "en", "src", 20),      # pred en
        (2, "el gato es de la casa", "en", "src", 21),     # pred es, label en
        (3, "der hund ist nicht das", "de", "src", 22),    # pred de, label de
        (4, "xyzzy qwerty", "de", "src", 12),              # pred und, label de
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {(r["lang"], r["pred_lang"]): r
           for r in text_langid_confusion(spark, d).collect()}
    assert out[("en", "en")]["n"] == 2 and out[("en", "es")]["n"] == 1
    assert out[("de", "de")]["n"] == 1 and out[("de", "und")]["n"] == 1
    assert out[("en", "en")]["row_share"] == round(2 / 3, 6)
    for (lab, pred), r in out.items():
        assert r["correct"] == (lab == pred)


def test_searchers_empty_inputs_return_empty(spark):
    """Searching with zero queries or over an empty corpus finds zero
    neighbors — the GEMM and IVF searchers must return the contract
    schema empty, not crash on a zero-row matrix (empty-input sweep,
    round 7). Trainers raise descriptive ValueErrors instead."""
    import pytest as _pytest

    from procoggraph_spark.operators.similarity import (
        brute_force_topk,
        gemm_topk,
        ivf_topk,
        train_centroids,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    full = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    for searcher in (gemm_topk, brute_force_topk):
        assert searcher(full, empty, k=3).count() == 0  # no queries
        assert searcher(empty, full, k=3).count() == 0  # empty corpus
    out = ivf_topk(empty, full, n_cells=4, n_probe=2, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine_sim", "rank"]
    with _pytest.raises(ValueError, match="empty"):
        train_centroids(empty, n_cells=4, iterations=1)


def test_cosine_zero_norm_is_null(spark):
    """cosine() with a zero-norm vector is mathematically undefined and
    must be NULL, not an ANSI divide-by-zero (NULL-input sweep: the
    fake feature kernel emits all-zero vectors for empty payloads and
    the near-dup join condition divided by their norm)."""
    from procoggraph_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    out = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert out[0] is None and out[1] == 1.0


def test_searchers_drop_null_vectors(spark):
    """NULL embeddings are unsearchable/unindexable: searchers drop
    them at the boundary instead of feeding None into numpy kernels."""
    from procoggraph_spark.operators.similarity import (
        brute_force_topk,
        gemm_topk,
        ivf_topk,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]), (4, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, None)], "vec_id long, embedding array<double>"
    )
    for searcher in (brute_force_topk, gemm_topk, ivf_topk):
        out = searcher(corpus, queries, k=2).collect()
        assert {r["query_id"] for r in out} == {10}
        assert all(r["neighbor_id"] != 2 for r in out)
