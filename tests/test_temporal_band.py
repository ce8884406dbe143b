"""Portable event-time band (valid_ts) contract pins.

A timestamp outside [1970-01-01 00:00:01, 2262-01-01] — the
intersection of the Arrow/pandas datetime64[ns] window, F.window's
bucket arithmetic (overflows at year 10000), and Spark streaming's
epoch-zero watermark admission domain, with a calendar-grain-closed
ceiling — cannot cross every execution face, so the engine degrades it
to NULL at load, on both the batch face (queries.common.t) and the
readStream face (streaming.windows._events_stream), with the DuckDB
oracle twin spliced centrally by the registry (gate_events_oracle).
These tests pin the band's edges, the crash-free pipeline behavior,
and the registry splice so none of the three gates can silently drift.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from procoggraph_spark.queries.common import (
    TS_BAND_MAX,
    TS_BAND_MIN,
    gate_events_oracle,
    t,
    valid_ts,
)
from procoggraph_spark.streaming.windows import (
    streaming_tumbling_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


def _dirty_events_dir(spark, tmp_path):
    """A tiny sf-layout dir whose events table carries every band shape:
    normal, NULL, both in-band edges, and three out-of-band corruptions
    (negative-epoch era, post-ns-bound, year-9999 sentinel)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, None),
        (2, None, 1, "click", 2.0, None),
        (3, TS_BAND_MIN, 2, "click", 4.0, None),  # in-band low edge
        (4, TS_BAND_MAX, 2, "click", 8.0, None),  # in-band high edge
        (5, "1600-01-01 00:00:00", 3, "click", 16.0, None),  # out: pre-ns
        (6, "2300-06-15 12:00:00", 3, "click", 32.0, None),  # out: post-ns
        (7, "9999-12-31 23:59:59", 3, "click", 64.0, None),  # out: sentinel
    ]
    df = spark.createDataFrame(
        [(i, datetime.datetime.fromisoformat(s) if s else None, u, e, v, p)
         for i, s, u, e, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = tmp_path / "sf_band"
    sf_dir.mkdir()
    df.write.mode("overwrite").parquet(str(sf_dir / "events.parquet"))
    return str(sf_dir)


def test_valid_ts_band_edges(spark):
    """Both edges are INSIDE the band (closed interval); everything
    beyond either edge degrades to NULL."""
    df = spark.createDataFrame(
        [(1, "2024-05-05 12:00:00"), (2, TS_BAND_MIN), (3, TS_BAND_MAX),
         (4, "1970-01-01 00:00:00"), (5, "2262-01-01 00:00:01"),
         (6, "9999-12-31 23:59:59"), (7, None)],
        "id long, s string",
    ).select("id", F.col("s").cast("timestamp").alias("ts"))
    got = {r["id"]: r["v"] for r in df.select("id", valid_ts(F.col("ts")).alias("v")).collect()}
    assert got[1] is not None and got[2] is not None and got[3] is not None
    assert got[4] is None and got[5] is None and got[6] is None and got[7] is None


def test_events_load_gate_makes_pipeline_crash_free(spark, tmp_path):
    """With the t() gate, a corpus carrying year-9999 / 2300 / 1600
    timestamps survives the three paths the raw values crash:
    toPandas (OutOfBoundsDatetime), F.window (year-10000 overflow),
    and the windowed aggregation's collect — with the corrupt rows
    degraded to NULL event time and excluded from windows, while both
    in-band edges are kept."""
    sf_dir = _dirty_events_dir(spark, tmp_path)
    ev = t(spark, sf_dir, "events")
    pdf = ev.toPandas()  # would raise OutOfBoundsDatetime ungated
    assert len(pdf) == 7
    assert int(pdf["ts"].notna().sum()) == 3  # normal + two edges
    windowed = tumbling_counts(ev, duration="1 hour").collect()
    assert sum(r["n"] for r in windowed) == 3
    years = {r["window_start"].year for r in windowed}
    assert years == {2024, 1970, 2262}


def test_streaming_face_shares_the_band(spark, tmp_path):
    """The readStream face applies the same gate: an availableNow drain
    over the corrupted corpus completes (no Arrow/window crash in the
    micro-batch) and matches the batch twin exactly."""
    sf_dir = _dirty_events_dir(spark, tmp_path)
    ev = t(spark, sf_dir, "events")
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    agg = streaming_tumbling_counts(spark, path, raw_schema, duration="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("band_tumb")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(
        (r["window_start"], r["event_type"], r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM band_tumb").collect()
    )
    batch_rows = sorted(
        (r["window_start"], r["event_type"], r["n"], r["sum_value"])
        for r in tumbling_counts(ev, duration="1 hour").collect()
    )
    assert stream_rows == batch_rows and len(batch_rows) == 3


def test_gate_events_oracle_splice_forms():
    """The registry splice handles all three oracle head shapes and
    embeds the same band constants valid_ts uses."""
    plain = gate_events_oracle("SELECT COUNT(*) FROM events")
    with_cte = gate_events_oracle("WITH g AS (SELECT 1) SELECT * FROM g, events")
    recursive = gate_events_oracle(
        "WITH RECURSIVE r(n) AS (SELECT 1) SELECT * FROM r, events"
    )
    for s in (plain, with_cte, recursive):
        assert "FROM main.events" in s
        assert TS_BAND_MIN in s and TS_BAND_MAX in s
    assert plain.startswith("WITH events AS (")
    assert with_cte.startswith("WITH events AS (") and ", g AS (" in with_cte
    assert recursive.startswith("WITH RECURSIVE events AS (")


def test_registry_gates_every_events_oracle():
    """Every registry oracle that reads the events table carries the
    gated shadow CTE — the central splice can't be bypassed by a new
    module-level oracle."""
    import re

    from procoggraph_spark.queries import registry

    _, oracles = registry()
    readers = [
        n for n, sql in oracles.items() if re.search(r"\bmain\.events\b|\bFROM events\b|\bJOIN events\b", sql, re.I)
    ]
    assert readers, "expected events-reading oracles in the registry"
    for n in readers:
        assert oracles[n].lstrip().upper().startswith("WITH"), n
        assert "main.events" in oracles[n], n


def test_cohort_ltv_excludes_out_of_band_months(spark):
    """An order dated with a year-9999 sentinel behaves exactly like an
    undated order in the LTV triangle: same result as dropping the row
    (the cohort_month output is a TIMESTAMP — an out-of-band bucket
    would crash the client hop)."""
    from procoggraph_spark.operators.analytics import cohort_ltv

    base = [
        (1, datetime.date(2024, 1, 15), 100.0),
        (1, datetime.date(2024, 2, 20), 50.0),
        (2, datetime.date(2024, 1, 5), 10.0),
    ]
    schema = "o_custkey long, o_orderdate date, o_totalprice double"
    clean = spark.createDataFrame(base, schema)
    dirty = spark.createDataFrame(
        base + [(1, datetime.date(9999, 12, 31), 999.0), (3, None, 5.0)], schema
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(cohort_ltv(dirty)) == key(cohort_ltv(clean))
    # and the triangle is collectable client-side
    cohort_ltv(dirty).toPandas()
