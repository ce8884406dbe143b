"""Semantic tests for the analytics operators (the star_llmops8
registry rows): cohort retention, strict-chained funnels, transition
mining, duplicate-cluster governance, one-pass profiling, gate
sensitivity, class weights, RFM segmentation. Parity with the DuckDB
oracles is covered by test_oracle_parity; these pin operator SEMANTICS
on constructed inputs where the expected answer is derivable by hand.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from procoggraph_spark.operators.analytics import (
    class_weights,
    cluster_size_histogram,
    cohort_retention,
    event_transitions,
    funnel_conversion,
    gate_sensitivity,
    rfm_segments,
    table_profile,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ts(d, h=0):
    return datetime(2024, 1, d, h)


def test_funnel_strict_temporal_chaining(spark):
    """Step k counts only users whose first step-k event is strictly
    after their step-(k-1) timestamp: a view BEFORE signup doesn't
    count, and a purchase before the qualifying view doesn't count."""
    rows = [
        # user 1: signup -> view -> purchase, in order (all 3 steps)
        (0, _ts(1), 1, "signup"), (1, _ts(2), 1, "view"), (2, _ts(3), 1, "purchase"),
        # user 2: view precedes signup, no view after (step 1 only)
        (3, _ts(1), 2, "view"), (4, _ts(2), 2, "signup"),
        # user 3: signup -> view, but the only purchase is BEFORE the view
        (5, _ts(1), 3, "signup"), (6, _ts(2), 3, "purchase"), (7, _ts(3), 3, "view"),
    ]
    out = funnel_conversion(
        _events(spark, rows), ("signup", "view", "purchase")
    ).collect()
    assert [(r["step_name"], r["n_users"]) for r in out] == [
        ("signup", 3),
        ("view_after_signup", 2),
        ("purchase_after_view", 1),
    ]
    assert out[1]["conv_from_prev"] == round(2 / 3, 6)
    assert out[2]["conv_from_prev"] == 0.5


def test_cohort_retention_triangle(spark):
    """u1 active in its cohort week and the next, u2 only in the cohort
    week -> offset 0 retention 1.0, offset 1 retention 0.5. Mid-week
    events truncate into the same Monday cohort."""
    rows = [
        (0, _ts(1), 1, "view"),   # 2024-01-01 is a Monday
        (1, _ts(3), 1, "view"),   # same week, mid-week
        (2, _ts(8), 1, "view"),   # next week
        (3, _ts(2), 2, "view"),   # cohort week only
    ]
    out = {
        (r["week_offset"]): r
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    assert out[0]["cohort_size"] == 2 and out[0]["retention"] == 1.0
    assert out[1]["n_active"] == 1 and out[1]["retention"] == 0.5


def test_event_transitions_counts_and_row_normalization(spark):
    rows = [
        (0, _ts(1), 1, "a"), (1, _ts(2), 1, "b"),
        (2, _ts(3), 1, "a"), (3, _ts(4), 1, "b"),
        (4, _ts(1), 2, "b"), (5, _ts(2), 2, "c"),
    ]
    out = {
        (r["prev_type"], r["next_type"]): r
        for r in event_transitions(_events(spark, rows), top_k=None).collect()
    }
    assert out[("a", "b")]["n"] == 2 and out[("a", "b")]["p_next"] == 1.0
    assert out[("b", "a")]["n"] == 1 and out[("b", "a")]["p_next"] == 0.5
    assert out[("b", "c")]["n"] == 1 and out[("b", "c")]["p_next"] == 0.5


def test_cluster_size_histogram_planted_clusters(spark):
    d = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "z"), (6, None)],
        "doc_id long, text string",
    )
    out = {r["cluster_size"]: r for r in cluster_size_histogram(d).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[1]["n_clusters"] == 1
    # NULL text excluded; shares over the 6 non-null docs
    assert out[3]["doc_share"] == 0.5 and out[1]["doc_share"] == round(1 / 6, 6)


def test_table_profile_nulls_distincts_minmax(spark):
    d = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "b"), (2, None)],
        "x long, s string",
    )
    out = {
        r["col_name"]: r
        for r in table_profile(d, numeric_cols=("x",), string_cols=("s",)).collect()
    }
    assert out["x"]["n_rows"] == 4 and out["x"]["n_nulls"] == 1
    assert out["x"]["n_distinct"] == 2  # distinct ignores NULL
    assert out["x"]["min_num"] == 1.0 and out["x"]["max_num"] == 2.0
    assert out["x"]["min_str"] is None
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None


def test_gate_sensitivity_bucket_cap_and_counts(spark):
    d = spark.createDataFrame(
        [(0, 50), (1, 150), (2, 250), (3, 5000)], "doc_id long, n_chars long"
    )
    out = {r["min_chars"]: r for r in gate_sensitivity(d, n_steps=3).collect()}
    # >=100: 150, 250, 5000; >=200: 250, 5000; >=300 (capped bucket): 5000
    assert out[100]["n_kept"] == 3
    assert out[200]["n_kept"] == 2
    assert out[300]["n_kept"] == 1
    assert out[100]["kept_frac"] == 0.75
    assert out[300]["char_share"] == round(5000 / 5450, 6)


def test_class_weights_balanced_formula(spark):
    d = spark.createDataFrame(
        [(i, "en") for i in range(10)] + [(100 + i, "de") for i in range(30)],
        "doc_id long, lang string",
    )
    out = {r["lang"]: r for r in class_weights(d, class_col="lang").collect()}
    assert out["en"]["weight_balanced"] == 2.0  # 40 / (2 * 10)
    assert out["de"]["weight_balanced"] == round(40 / 60, 6)
    assert out["en"]["weight_sqrt"] == 2.0  # sqrt(40 / 10)


def test_rfm_segments_quartiles_deterministic(spark):
    # 4 customers, strictly ordered on every metric: best-on-everything
    # gets segment 111, worst gets 444; monetary totals ride exact cents.
    rows = []
    for c in range(4):
        # customer c: last order day 20-c*2, (4-c) orders of 100*(4-c)
        for k in range(4 - c):
            rows.append((c * 10 + k, c, float(100 * (4 - c)), _ts(20 - c * 2)))
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    out = {r["segment"]: r for r in rfm_segments(
        o, cents_col=(F.round(F.col("o_totalprice") * 100, 0)).cast("long")
    ).collect()}
    assert set(out) == {"111", "222", "333", "444"}
    assert out["111"]["n_customers"] == 1
    assert out["111"]["total_monetary"] == 1600.0  # 4 orders x 400.00


def test_sessionize_gap_splits_and_stats(spark):
    """Events 10s apart share a session; a >30-min gap starts a new
    one. Duration and purchase counts are per session."""
    rows = [
        (0, datetime(2024, 1, 1, 0, 0, 0), 1, "view"),
        (1, datetime(2024, 1, 1, 0, 0, 10), 1, "purchase"),
        (2, datetime(2024, 1, 1, 2, 0, 0), 1, "view"),   # > 30 min later
        (3, datetime(2024, 1, 1, 0, 0, 0), 2, "view"),
    ]
    from procoggraph_spark.operators.analytics import sessionize

    out = sessionize(_events(spark, rows), gap_seconds=1800).collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert [(r["session_seq"], r["n_events"], r["duration_sec"], r["n_purchases"])
            for r in u1] == [(1, 2, 10, 1), (2, 1, 0, 0)]
    assert len([r for r in out if r["user_id"] == 2]) == 1


def test_volume_anomaly_flags_spike_after_full_window(spark):
    """24 quiet hours then a spike: the spike hour z-scores high and
    flags; hours without a full trailing window emit nothing."""
    from procoggraph_spark.operators.analytics import volume_anomaly

    rows = []
    eid = 0
    for h in range(24):  # baseline: alternate 1 / 3 events per hour
        for k in range(1 if h % 2 == 0 else 3):
            rows.append((eid, datetime(2024, 1, 1, h, k), 1, "view"))
            eid += 1
    for k in range(50):  # spike in hour 24
        rows.append((eid, datetime(2024, 1, 2, 0, k % 60), 1, "view"))
        eid += 1
    out = volume_anomaly(_events(spark, rows), trail=24).collect()
    assert len(out) == 1  # only the spike hour has a full trailing window
    r = out[0]
    assert r["n"] == 50 and r["trail_mean"] == 2.0
    assert r["is_anomaly"] and r["z_score"] > 3


def test_basket_pairs_support_and_bounds(spark):
    li = spark.createDataFrame(
        # order 1: parts {10, 20, 30}; order 2: {10, 20}; order 3: {10}
        [(1, 10), (1, 20), (1, 30), (1, 10), (2, 10), (2, 20), (3, 10)],
        "l_orderkey long, l_partkey long",
    )
    from procoggraph_spark.operators.analytics import basket_pairs

    out = {(r["item_a"], r["item_b"]): r for r in basket_pairs(li).collect()}
    assert out[(10, 20)]["support"] == 2
    assert out[(10, 30)]["support"] == 1 and out[(20, 30)]["support"] == 1
    assert out[(10, 20)]["support_share"] == round(2 / 3, 6)
    assert (20, 10) not in out  # ordered pairs only, no mirror rows


def test_user_activity_pareto_concentration(spark):
    """One whale (90 events) + 9 users with 1 each, 10 tiles: decile 1
    is the whale with ~91% share; cum_share ends at 1.0."""
    from procoggraph_spark.operators.analytics import user_activity_pareto

    rows = [(i, datetime(2024, 1, 1, 0, i % 60), 99, "view") for i in range(90)]
    rows += [(100 + u, datetime(2024, 1, 1, 1, u), u, "view") for u in range(9)]
    out = user_activity_pareto(_events(spark, rows), n_tiles=10).collect()
    assert out[0]["decile"] == 1 and out[0]["n_events"] == 90
    assert out[0]["event_share"] == round(90 / 99, 6)
    assert out[-1]["cum_share"] == 1.0


def test_histogram_quantiles_error_bounded(spark):
    """Estimates fall within one bin width of the exact quantile; a
    degenerate all-equal column returns the constant."""
    from procoggraph_spark.operators.sketches import histogram_quantiles

    vals = spark.createDataFrame([(float(v),) for v in range(1, 101)], "x double")
    out = {r["q"]: r["est"] for r in histogram_quantiles(
        vals, value_col="x", bins=10, quantiles=(0.25, 0.5, 0.9)
    ).collect()}
    width = 99.0 / 10
    for q, exact in ((0.25, 25.75), (0.5, 50.5), (0.9, 90.1)):
        assert abs(out[q] - exact) <= width + 1e-9, (q, out[q], exact)

    const = spark.createDataFrame([(7.0,)] * 5, "x double")
    outc = histogram_quantiles(const, value_col="x", bins=10,
                               quantiles=(0.5,)).collect()
    assert outc[0]["est"] == 7.0


def test_psi_drift_zero_for_identical_positive_for_shifted(spark):
    from procoggraph_spark.operators.sketches import psi_drift

    # identical halves -> every contribution is exactly 0
    same = spark.createDataFrame(
        [(i, 100 * (i % 5)) for i in range(100)], "doc_id long, n_chars long"
    )
    out = psi_drift(same, value_col="n_chars",
                    snapshot_col=(F.col("doc_id") % 2), step=100).collect()
    assert all(r["psi_contrib"] == 0.0 for r in out)

    # snapshot B shifted long -> total PSI clearly positive
    shifted = spark.createDataFrame(
        [(2 * i, 100) for i in range(50)] + [(2 * i + 1, 900) for i in range(50)],
        "doc_id long, n_chars long",
    )
    outs = psi_drift(shifted, value_col="n_chars",
                     snapshot_col=(F.col("doc_id") % 2), step=100).collect()
    assert sum(r["psi_contrib"] for r in outs) > 0.25


def test_funnel_conversion_window_bound(spark):
    """With within_seconds set, a step that happens too long after the
    previous one no longer converts."""
    rows = [
        (0, datetime(2024, 1, 1), 1, "signup"),
        (1, datetime(2024, 1, 2), 1, "view"),      # 1 day after signup
        (2, datetime(2024, 1, 20), 2, "signup"),
        (3, datetime(2024, 1, 30), 2, "view"),     # 10 days after signup
    ]
    out = funnel_conversion(
        _events(spark, rows), ("signup", "view"),
        within_seconds=7 * 86400,
    ).collect()
    assert [(r["step_name"], r["n_users"]) for r in out] == [
        ("signup", 2), ("view_after_signup", 1),
    ]


def test_pairwise_diversity_sum_identity(spark):
    """The one-agg identity must equal the brute-force mean pairwise
    dot, and near-identical vectors drive it toward the self dot."""
    import itertools

    from procoggraph_spark.operators.analytics import pairwise_diversity

    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    e = spark.createDataFrame([(v,) for v in vecs], "embedding array<double>")
    r = pairwise_diversity(e).collect()[0]
    dots = [
        sum(a * b for a, b in zip(x, y))
        for x, y in itertools.permutations(vecs, 2)
    ]
    assert r["n_vectors"] == 3
    assert r["mean_pairwise_dot"] == round(sum(dots) / 6, 6)
    assert r["mean_self_dot"] == round((1 + 1 + 2) / 3, 6)

    clone = spark.createDataFrame([([2.0, 0.0],)] * 4, "embedding array<double>")
    rc = pairwise_diversity(clone).collect()[0]
    assert rc["mean_pairwise_dot"] == rc["mean_self_dot"] == 4.0


def test_last_touch_attribution_credits_previous_event(spark):
    from procoggraph_spark.operators.analytics import last_touch_attribution

    rows = [
        (0, datetime(2024, 1, 1, 0), 1, "view", 0.0),
        (1, datetime(2024, 1, 1, 1), 1, "purchase", 10.50),
        (2, datetime(2024, 1, 1, 2), 1, "click", 0.0),
        (3, datetime(2024, 1, 1, 3), 1, "purchase", 5.25),
        (4, datetime(2024, 1, 1, 0), 2, "purchase", 99.0),  # first event: no touch
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r["touch_type"]: r for r in last_touch_attribution(e).collect()}
    assert set(out) == {"view", "click"}
    assert out["view"]["n_conversions"] == 1 and out["view"]["total_value"] == 10.5
    assert out["click"]["total_value"] == 5.25
    assert out["view"]["conversion_share"] == 0.5


def test_activity_heatmap_iso_weekday_and_share(spark):
    from procoggraph_spark.operators.analytics import activity_heatmap

    rows = [
        (0, datetime(2024, 1, 1, 9), 1, "view"),   # Monday -> isodow 1
        (1, datetime(2024, 1, 7, 23), 1, "view"),  # Sunday -> isodow 7
        (2, datetime(2024, 1, 7, 23), 2, "view"),
    ]
    out = {(r["isodow"], r["hour"]): r for r in activity_heatmap(
        _events(spark, rows)).collect()}
    assert out[(1, 9)]["n"] == 1
    assert out[(7, 23)]["n"] == 2
    assert out[(7, 23)]["share"] == round(2 / 3, 6)


def test_funnel_conversion_quoted_step_names(spark):
    """Caller-supplied step names pass through as SQL string literals —
    a name containing a single quote must not break or alter the
    generated stack() SQL."""
    rows = [
        (0, datetime(2024, 1, 1, 9), 1, "it's a view"),
        (1, datetime(2024, 1, 1, 10), 1, "add'l cart"),
        (2, datetime(2024, 1, 1, 9), 2, "it's a view"),
    ]
    out = {r["step"]: r for r in funnel_conversion(
        _events(spark, rows), steps=("it's a view", "add'l cart")
    ).collect()}
    assert out[1]["step_name"] == "it's a view" and out[1]["n_users"] == 2
    assert out[2]["n_users"] == 1 and out[2]["conv_from_prev"] == 0.5


def test_table_profile_exotic_column_names(spark):
    """Column names with spaces/quotes profile correctly via escaped
    identifiers."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "`odd name` long, `s'tr` string"
    )
    out = {r["col_name"]: r for r in table_profile(
        df, numeric_cols=("odd name",), string_cols=("s'tr",)
    ).collect()}
    assert out["odd name"]["n_nulls"] == 0 and out["odd name"]["max_num"] == 2.0
    assert out["s'tr"]["n_nulls"] == 1 and out["s'tr"]["min_str"] == "a"


def test_srm_n_arms_validation(spark):
    from procoggraph_spark.operators.analytics import chi2_crit_95

    import pytest as _pytest

    assert chi2_crit_95(2) == 3.841459
    assert chi2_crit_95(10) == 16.918978
    with _pytest.raises(ValueError, match="n_arms"):
        chi2_crit_95(11)
    with _pytest.raises(ValueError, match="n_arms"):
        chi2_crit_95(1)


def test_salted_join_rejects_dim_duplicating_how(spark):
    import pytest as _pytest

    from procoggraph_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, 10)], "k long, fid long")
    dim = spark.createDataFrame([(1, "x")], "k long, attr string")
    with _pytest.raises(ValueError, match="fact-preserving"):
        salted_join(fact, dim, key_col="k", salt_from="fid", how="full")
    # inner still equals the plain join
    got = salted_join(fact, dim, key_col="k", salt_from="fid", how="inner")
    assert [tuple(r) for r in got.select("k", "fid", "attr").collect()] == [
        (1, 10, "x")
    ]


def test_funnel_conversion_empty_step_yields_null(spark):
    """An empty upstream funnel step must produce NULL conversion for
    the next step (not an ANSI divide-by-zero crash — hit live on the
    10x scale probe)."""
    rows = [
        (0, datetime(2024, 1, 1, 9), 1, "signup"),
        # no 'view' events at all -> step 2 count 0, step 3 NULL conv
        (1, datetime(2024, 1, 1, 10), 1, "purchase"),
    ]
    out = {r["step"]: r for r in funnel_conversion(
        _events(spark, rows), steps=("signup", "view", "purchase")
    ).collect()}
    assert out[2]["n_users"] == 0 and out[2]["conv_from_prev"] == 0.0
    assert out[3]["n_users"] == 0 and out[3]["conv_from_prev"] is None
