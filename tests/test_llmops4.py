"""Semantic tests for the round-6 second-batch operators (the
star_llmops5 registry rows): temperature source mixing, weighted
priority sampling, int8 quantization, filtered / Matryoshka search, and
the crawl-novelty curve. Parity with the DuckDB oracles is covered by
test_oracle_parity; these pin the operator SEMANTICS on constructed
inputs where the expected behavior is derivable by hand.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from procoggraph_spark.operators.dedup import crawl_novelty
from procoggraph_spark.operators.sampling import (
    temperature_mix,
    weighted_priority_sample,
)
from procoggraph_spark.operators.similarity import (
    brute_force_topk,
    int8_quantize_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_temperature_mix_flattens_toward_small_sources(spark):
    """τ=0.5 must give the small source a larger share than its natural
    token share (upsample > 1) and the head source a smaller one
    (upsample < 1); shares sum to ~1 and allocations never exceed the
    budget."""
    rows = [(i, "big", 100) for i in range(90)] + [
        (100 + i, "small", 100) for i in range(10)
    ]
    out = temperature_mix(
        _docs(spark, rows), source_col="source", weight_col="n_chars",
        budget=10_000,
    ).collect()
    by = {r["source"]: r for r in out}
    # natural shares: 0.9 / 0.1; sqrt-tempered: ~0.75 / ~0.25
    assert by["small"]["temp_share"] > 0.1
    assert by["big"]["temp_share"] < 0.9
    assert abs(sum(r["temp_share"] for r in out) - 1.0) < 1e-4
    assert sum(r["alloc_tokens"] for r in out) <= 10_000
    assert by["small"]["upsample_factor"] > 1.0 > by["big"]["upsample_factor"]


def test_temperature_mix_equal_sources_equal_shares(spark):
    rows = [(i, f"s{i % 4}", 50) for i in range(400)]
    out = temperature_mix(_docs(spark, rows), budget=1_000_000).collect()
    shares = {r["temp_share"] for r in out}
    assert len(shares) == 1  # identical masses -> identical shares


def test_weighted_priority_sample_favors_heavy_rows(spark):
    """A row with overwhelming weight must always be in the sample;
    ranks are 1..k, rerun-stable, and the sample is weight-biased (the
    heavy half of the corpus wins more slots than the light half)."""
    rows = [(i, "a", 10) for i in range(200)] + [
        (200 + i, "b", 10_000) for i in range(200)
    ]
    df = _docs(spark, rows)
    out = weighted_priority_sample(
        df, id_col="doc_id", weight_col="n_chars", k=50
    ).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, 51)
    )
    heavy = sum(1 for r in out if r["n_chars"] == 10_000)
    assert heavy > 40  # 1000x weight ratio -> the heavy rows dominate
    again = weighted_priority_sample(
        df.repartition(7), id_col="doc_id", weight_col="n_chars", k=50
    ).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in out
    )


def test_weighted_priority_sample_k_exceeds_corpus(spark):
    rows = [(i, "a", 5 + i) for i in range(7)]
    out = weighted_priority_sample(
        _docs(spark, rows), id_col="doc_id", weight_col="n_chars", k=100
    ).collect()
    assert len(out) == 7


def test_int8_quantize_reconstruction(spark):
    """Hand-checkable vector: [1, -0.5, 0] -> codes [127, -64, 0] (round
    half away from zero, ~63.5 -> -64), exact integer norm, one
    saturated lane, near-perfect reconstruction cosine."""
    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.0]), (1, [0.25, 0.25, 0.25])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in int8_quantize_stats(df).collect()}
    assert out[0]["q_norm2"] == 127 * 127 + 64 * 64
    assert out[0]["n_saturated"] == 1
    assert out[0]["recon_cos"] > 0.9999
    # a constant vector saturates every lane and reconstructs exactly
    assert out[1]["n_saturated"] == 3
    assert out[1]["recon_cos"] == 1.0


def test_filtered_topk_only_returns_qualifying_labels(spark):
    from procoggraph_spark.queries.common import t
    from tests.conftest import SF_SMOKE

    e = t(spark, SF_SMOKE, "embeddings")
    out = brute_force_topk(
        e.filter(F.col("label") == 2),
        e.filter(F.col("vec_id") < 3),
        id_col="vec_id",
        vec_col="embedding",
        k=5,
    )
    allowed = {
        r["vec_id"] for r in e.filter(F.col("label") == 2).collect()
    }
    assert {r["neighbor_id"] for r in out.collect()} <= allowed


def test_matryoshka_order_approximates_full_dim_when_front_loaded(spark):
    """On MRL-style embeddings (information front-loaded: cluster signal
    in the first 16 dims, small noise in the tail 48) the truncated
    top-10 must recover most of the full-dimension top-10 — the property
    that makes the coarse-to-fine stack useful. The sf testdata spreads
    its cluster signal across ALL dims, where a 16-dim slice keeps only
    1/4 of the signal (measured overlap ~6/30 there — better than the
    ~2.4/30 of random membership, but no approximation), so the semantic
    pin uses a constructed front-loaded corpus."""
    import random

    rng = random.Random(7)
    centers = [
        [rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)
    ]
    rows = []
    for i in range(200):
        head = [
            c + rng.gauss(0, 0.08) for c in centers[i % 4]
        ]
        tail = [rng.gauss(0, 0.02) for _ in range(48)]
        rows.append((i, head + tail))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.filter(F.col("vec_id") < 3)
    full = brute_force_topk(e, q, id_col="vec_id", vec_col="embedding", k=10)
    sl = F.slice(F.col("embedding"), 1, 16).alias("embedding")
    trunc = brute_force_topk(
        e.select("vec_id", sl), q.select("vec_id", sl),
        id_col="vec_id", vec_col="embedding", k=10,
    )
    fm = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    tm = {(r["query_id"], r["neighbor_id"]) for r in trunc.collect()}
    assert len(fm & tm) >= 24  # >=80% membership overlap across 3 queries


def test_crawl_novelty_on_planted_recrawl(spark):
    """Cycle 0: 3 unique docs. Cycle 1: 2 copies of cycle-0 content +
    1 new. Cycle 2: all copies. Novelty must read 1.0, 1/3, 0."""
    rows = (
        [(0, "alpha"), (1, "beta"), (2, "gamma")]
        + [(50, "alpha"), (51, "beta"), (52, "delta")]
        + [(100, "alpha"), (101, "delta")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["cycle"]: r for r in crawl_novelty(df, cycle_size=50).collect()}
    assert out[0]["n_new_keys"] == 3 and out[0]["novelty_rate"] == 1.0
    assert out[1]["n_new_keys"] == 1
    assert math.isclose(out[1]["novelty_rate"], round(1 / 3, 6))
    assert out[2]["n_new_keys"] == 0 and out[2]["novelty_rate"] == 0.0
    # total new keys across cycles == corpus distinct content
    assert sum(r["n_new_keys"] for r in out.values()) == 4


def test_crawl_novelty_null_text_counts_once(spark):
    rows = [(0, None), (1, "x"), (50, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["cycle"]: r for r in crawl_novelty(df, cycle_size=50).collect()}
    assert out[0]["n_new_keys"] == 2  # NULL sentinel + "x"
    assert out[1]["n_new_keys"] == 0  # the second NULL is a dup


def test_dsir_ranks_target_like_docs_higher(spark):
    """Docs written in the target domain's vocabulary must score a
    higher avg log-ratio than docs in a disjoint vocabulary, and
    target-unseen terms stay finite via smoothing."""
    from procoggraph_spark.operators.text import dsir_logratio

    rows = (
        [(i, "alpha beta gamma delta", "tgt") for i in range(5)]
        + [(10 + i, "zeta eta theta iota", "web") for i in range(5)]
        + [(20, "alpha beta zeta eta", "web"), (21, "alpha beta gamma eta", "web")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_logratio(
        df, df.filter(F.col("source") == "tgt"), id_col="doc_id",
        text_col="text",
    )
    by = {r["doc_id"]: r["avg_log_ratio"] for r in out.collect()}
    assert by[0] > 0 > by[10]          # in-domain positive, off-domain negative
    assert by[0] > by[21] > by[20] > by[10]  # mixing shifts monotonically
    assert all(math.isfinite(v) for v in by.values())


def test_dsir_zero_sign_canonical(spark):
    """A doc whose token log-ratios cancel must report +0.0, never
    -0.0: the average lands at ±epsilon by float summation order and
    round() preserves the sign of zero, which diverged between engines
    (live sf0.1 finding, round 12). The +0.0 canonicalization pins the
    sign on both faces."""
    import math as m

    from procoggraph_spark.operators.text import dsir_logratio

    # one doc, target == raw corpus: every term's smoothed target and
    # raw probabilities are identical, so each _lr is exactly 0.0 and
    # the average is a zero whose sign must come out positive
    df = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    out = dsir_logratio(df, df, id_col="doc_id", text_col="text").collect()
    v = out[0]["avg_log_ratio"]
    assert v == 0.0 and not m.copysign(1.0, v) < 0


def _rand_pad(seed: int, n: int = 42) -> str:
    """Per-doc independent letter pad — no 40-char run can repeat across
    docs (periodic digit pads DO collide cyclically; measured)."""
    import random
    import string

    rng = random.Random(9000 + seed)
    return "".join(rng.choice(string.ascii_uppercase) for _ in range(n))


def test_substring_pairs_planted_passage(spark):
    """Two docs sharing a 60-char passage pair up (21 shared 40-grams);
    docs sharing only a 30-char run do not; a passage pasted into 25
    docs is absorbed by the max_df hot-gram guard."""
    from procoggraph_spark.operators.dedup import substring_ngram_pairs

    passage = "x" * 26 + "the quick brown fox jumps over the lazy dog."  # 70ch
    short = "y" * 30
    boiler = "please subscribe to our newsletter today now!"  # 45ch, disjoint
    # per-doc pads are 40+ chars of UNIQUE content (digit triple repeated),
    # so no 40-window spanning pad+shared-content can match across docs —
    # every cross-doc gram lies fully inside the planted passage/boiler
    rows = (
        [(0, "A" * 10 + passage + "B" * 10), (1, "C" * 10 + passage + "D" * 10)]
        + [(2, "E" * 20 + short + "F" * 20), (3, "G" * 20 + short + "H" * 20)]
        + [
            # a per-doc UNIQUE single char flanks the boiler on both
            # sides: any window spanning out of the boiler contains it,
            # so cross-doc grams lie fully INSIDE the boiler (df=25 >
            # max_df -> all absorbed). The unique char must sit at the
            # immediately adjacent position — multi-char markers sharing
            # their first char (digit pairs) leak a spanning gram to
            # every doc with the same leading digit (measured df=10).
            (100 + i, _rand_pad(2 * i) + chr(0x100 + i) + boiler
             + chr(0x180 + i) + _rand_pad(2 * i + 1))
            for i in range(25)
        ]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in substring_ngram_pairs(df, k=40, max_df=20).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == len(passage) - 39
    assert (2, 3) not in pairs
    # the 25-doc boilerplate exceeds max_df=20: its 6 grams are absorbed
    # at the gram grain, so the boiler docs never pair up
    assert not any(a >= 100 or b >= 100 for a, b in pairs)


def test_substring_pairs_null_and_short_text(spark):
    from procoggraph_spark.operators.dedup import substring_ngram_pairs

    df = spark.createDataFrame(
        [(0, None), (1, "tiny"), (2, "z" * 39)], "doc_id long, text string"
    )
    assert substring_ngram_pairs(df, k=40).count() == 0
