"""Temporal joins: asof semantics (ties, no-prior-row, tolerance) and
range-join boundary/plan properties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from procoggraph_spark.operators.temporal import asof_join, range_join_intervals
from procoggraph_spark.queries import registry
from tests.conftest import SF_ORACLE
from tests.test_plans import plan

UTC = dt.timezone.utc


def ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s, tzinfo=UTC)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(20)), (2, ts(5))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(10), 100.0), (1, ts(15), 150.0), (2, ts(9), 90.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        (r["k"], r["ts"].second): r["right_v"]
        for r in asof_join(left, right, on="k", value_cols=["v"]).collect()
    }
    assert out[(1, 10)] == 100.0  # tie: right at equal ts matches (<=)
    assert out[(1, 20)] == 150.0  # most recent prior
    assert out[(2, 5)] is None    # no prior right row → null


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, ts(30))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(10), 1.0)], "k long, ts timestamp, v double"
    )
    with_tol = asof_join(
        left, right, on="k", value_cols=["v"], tolerance_seconds=5
    ).collect()[0]
    assert with_tol["right_v"] is None  # 20s gap > 5s tolerance
    no_tol = asof_join(left, right, on="k", value_cols=["v"]).collect()[0]
    assert no_tol["right_v"] == 1.0


def test_asof_null_key_and_null_value_semantics(spark):
    """Dirty-telemetry contracts (round-8 fuzz): (1) NULL join keys
    follow SQL equi-join rules — a NULL-key left row matches nothing
    (two anonymous users are not the same user), a NULL-key right row
    matches nothing; (2) the carry returns the matched ROW's value
    even when that value is NULL — it must not skip a NULL-value match
    and resurrect an older non-NULL row."""
    left = spark.createDataFrame(
        [(None, ts(10)), (1, ts(30))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(None, ts(5), 99.0), (1, ts(10), 10.0), (1, ts(20), None)],
        "k long, ts timestamp, v double",
    )
    rows = asof_join(left, right, on="k", value_cols=["v"]).collect()
    by_key = {r["k"]: r["right_v"] for r in rows}
    assert len(rows) == 2              # NULL-key left row is KEPT
    assert by_key[None] is None        # ... but matches nothing
    # most recent prior row at ts(20) has v=NULL: return THAT NULL,
    # not the older 10.0
    assert by_key[1] is None


def test_asof_non_identifier_value_columns(spark):
    """The carried-struct NULL literal is built from a real StructType,
    not a DDL string — value columns whose names are not bare
    identifiers (spaces, dashes, dots) must work (round-8 advice: the
    f-string DDL raised on them)."""
    left = spark.createDataFrame(
        [(1, ts(10)), (2, ts(5))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(8), 100.0, "a")], "k long, ts timestamp, `bid price` double, `src.tag` string"
    )
    out = {
        r["k"]: (r["right_bid price"], r["right_src.tag"])
        for r in asof_join(
            left, right, on="k", value_cols=["bid price", "src.tag"]
        ).collect()
    }
    assert out[1] == (100.0, "a")
    assert out[2] == (None, None)


def test_sessionize_null_event_type_counts_zero(spark):
    """A session consisting only of NULL-type events has n_purchases 0,
    not NULL (an unknown-type event is simply not a purchase)."""
    from procoggraph_spark.operators.analytics import sessionize

    e = spark.createDataFrame(
        [(1, ts(10), 7, None, 0.0, ""), (2, ts(11), 7, None, 0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    row = sessionize(e).collect()[0]
    assert row["n_events"] == 2
    assert row["n_purchases"] == 0


def test_json_extract_malformed_props(spark):
    """f14's regexp extraction over dirty payloads: NULL props, empty
    objects, non-JSON garbage, and wrong-typed fields all contribute
    NULL (nothing) to the sum — an unguarded CAST of the regexp miss
    ('') ANSI-crashes (fuzz finding, both engines)."""
    from procoggraph_spark.queries import registry

    qs, _ = registry()
    e = spark.createDataFrame(
        [
            (1, ts(1), 1, "click", 1.0, '{"k": 7}'),
            (2, ts(2), 1, "click", 1.0, None),
            (3, ts(3), 1, "click", 1.0, "{}"),
            (4, ts(4), 1, "click", 1.0, "not json"),
            (5, ts(5), 1, "click", 1.0, '{"k": "oops"}'),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    k = F.nullif(
        F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1), F.lit("")
    ).cast("long")
    row = e.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"), F.count("*").alias("n")
    ).collect()[0]
    assert row["sum_k"] == 7 and row["n"] == 5


def test_range_join_boundaries(spark):
    events = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(20)), (3, 1, ts(21)), (4, 2, ts(15))],
        "event_id long, k long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, ts(10), ts(20))], "k long, start timestamp, end timestamp"
    )
    got = {
        r["event_id"]
        for r in range_join_intervals(events, iv, on="k", bucket_seconds=7).collect()
    }
    assert got == {1, 2}  # inclusive both ends; 21 outside; user 2 no interval


def test_temporal_plans_no_cartesian(spark):
    qs, _ = registry()
    for name in ["asof_purchase_view", "range_join_signup_window"]:
        # fresh build: a plan-cached DataFrame may carry an executed
        # (AQE-finalized) queryExecution — see tests/test_plans.py
        fn = qs[name]
        p = plan(spark, getattr(fn, "__wrapped__", fn)(spark, SF_ORACLE))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
