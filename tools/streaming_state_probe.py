"""Streaming state-store scale probe (round-11 verdict item 2).

The bounded-state claims for the stateful streaming twins have been
design-argued (watermark-evicted keys, grain-bounded monitor tables)
and sf0.01-fuzz-verified, but never MEASURED at size. This probe
drains the 10x events corpus (1 M rows / 30 days, the scale_probe.py
layout) through the state-store-backed twins in >=4 time-ordered
micro-batches and records the `stateOperators` progress metrics per
batch — the numbers behind "state tracks the watermark bound, not the
corpus":

- `streaming_dedup` (dropDuplicatesWithinWatermark): state holds only
  keys younger than the watermark. Expected shape: numRowsTotal stays
  ~one arrival-window of keys per batch (eviction of batch N-1's
  expired keys runs during batch N, when the watermark has advanced
  past them), and a final "tick" batch 2 h past the corpus max
  collapses state to the trailing watermark hour — NOT 1 M rows.
- `session_window` streaming aggregation (the stream_session_window
  readStream face): state holds open sessions only; same flat-per-
  batch + tick-collapse shape.
- `streaming_volume_monitor` (foreachBatch, versioned parquet state):
  state rows are O(event_types x hours) — grain x time-span bounded,
  independent of corpus row count.
- `streaming_srm_monitor`: state rows are O(segments x arms) —
  constant.

Usage:
    python3 scale_probe.py                  # generate the 10x corpus once
    python3 tools/streaming_state_probe.py  # then run this

Prints ONE JSON line; exit status 0 iff every bound holds:
  dedup/session state after the tick batch < 2% of corpus rows, and
  monitor state rows within their structural grain bounds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from procoggraph_spark.session import get_spark  # noqa: E402

PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/procoggraph_sfprobe")
N_CHUNKS = int(os.environ.get("SPARK_GRAFT_STATE_CHUNKS", "5"))


def _progress_state(q):
    """Last non-empty stateOperators entry from a drained query's
    recentProgress, as plain dicts (PySpark surfaces progress as JSON
    strings)."""
    out = []
    for p in q.recentProgress:
        d = json.loads(p) if isinstance(p, str) else json.loads(p.json)
        if d.get("stateOperators"):
            out.append(d)
    return out


def _drain(stream_df, ckpt: str, mode: str):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return _progress_state(q)


def _state_rows(progresses):
    """(numInputRows, numRowsTotal, numRowsRemoved, memoryUsedBytes)
    summed over the micro-batches of one availableNow drain; totals
    taken from the LAST batch (the resting state)."""
    if not progresses:
        return {"input": 0, "state_rows": None, "removed": 0, "bytes": None}
    last = progresses[-1]["stateOperators"][0]
    return {
        "input": sum(int(p.get("numInputRows", 0)) for p in progresses),
        "state_rows": int(last["numRowsTotal"]),
        "removed": sum(
            int(p["stateOperators"][0].get("numRowsRemoved", 0))
            for p in progresses
        ),
        "bytes": int(last.get("memoryUsedBytes", 0)),
    }


def probe_stateful(spark, events, work: str, results: dict) -> int:
    """Drain dedup + session aggregation over time-ordered chunks."""
    from procoggraph_spark.streaming.windows import (
        _events_stream,
        streaming_dedup,
    )

    n_total = events.count()
    lo, hi = events.agg(
        F.min("ts").cast("long"), F.max("ts").cast("long")
    ).first()
    span = hi - lo + 1
    # N time-ordered slices = the arrival order a real stream has
    chunks = []
    for i in range(N_CHUNKS):
        a = lo + span * i // N_CHUNKS
        b = lo + span * (i + 1) // N_CHUNKS
        chunks.append(
            events.filter(
                (F.col("ts").cast("long") >= a) & (F.col("ts").cast("long") < b)
            )
        )
    # the tick batch: a handful of events 2 h past the corpus max — it
    # advances the watermark past every earlier event, so the resting
    # state AFTER it is exactly the watermark-trailing residue
    tick = events.limit(50).withColumn(
        "ts", F.timestamp_seconds(F.lit(hi + 2 * 3600))
    )

    failures = 0
    from procoggraph_spark.streaming.windows import stateful_user_totals

    for name, build, mode in (
        (
            "dedup",
            lambda inbox: streaming_dedup(spark, inbox, events.schema),
            "append",
        ),
        (
            # the KEY-bounded (not watermark-bounded) state class:
            # per-user running totals keep one state row per DISTINCT
            # user forever — state must track the user population,
            # never the event count
            "user_totals",
            lambda inbox: stateful_user_totals(
                _events_stream(spark, inbox, events.schema)
            ),
            "update",
        ),
        (
            "session",
            lambda inbox: (
                _events_stream(spark, inbox, events.schema)
                .withWatermark("ts", "1 hour")
                .groupBy(F.session_window("ts", "30 minutes"), "user_id")
                .agg(F.count("*").alias("n_events"))
            ),
            "append",
        ),
    ):
        inbox = os.path.join(work, f"{name}_inbox")
        ckpt = os.path.join(work, f"{name}_ckpt")
        per_batch = []
        for i, chunk in enumerate(chunks + [tick]):
            chunk.coalesce(4).write.mode("append").parquet(inbox)
            per_batch.append(_state_rows(_drain(build(inbox), ckpt, mode)))
        resting = per_batch[-1]["state_rows"]
        peak = max(b["state_rows"] or 0 for b in per_batch)
        if name == "user_totals":
            # key-bounded state: exactly one row per distinct user ever
            # seen — the population bound, independent of event count
            n_users = events.select("user_id").distinct().count()
            ok = resting is not None and resting <= n_users
            results[name] = {
                "per_batch": per_batch,
                "resting_state_rows": resting,
                "peak_state_rows": peak,
                "distinct_users_bound": n_users,
                "corpus_rows": n_total,
                "bound_ok": ok,
            }
        else:
            ok = (
                resting is not None
                and resting < 0.02 * n_total
                and peak < 2 * (n_total // N_CHUNKS) + 1000
            )
            results[name] = {
                "per_batch": per_batch,
                "resting_state_rows": resting,
                "peak_state_rows": peak,
                "corpus_rows": n_total,
                "bound_ok": ok,
            }
        failures += 0 if ok else 1
    return failures


def probe_monitors(spark, events, work: str, results: dict) -> int:
    """foreachBatch monitor family: state is a versioned parquet table;
    its row count must track the GRAIN (types x hours / segments x
    arms), not the event count."""
    from procoggraph_spark.streaming.windows import (
        streaming_srm_monitor,
        streaming_volume_monitor,
    )

    failures = 0
    n_total = events.count()
    # volume monitor over the full corpus in N_CHUNKS id-sliced batches
    inbox = os.path.join(work, "vol_inbox")
    state = os.path.join(work, "vol_state")
    ckpt = os.path.join(work, "vol_ckpt")
    per_batch = []
    for i in range(N_CHUNKS):
        events.filter(F.pmod(F.col("event_id"), N_CHUNKS) == i).coalesce(
            4
        ).write.mode("append").parquet(inbox)
        q = streaming_volume_monitor(
            spark, inbox, events.schema, state, checkpoint=ckpt
        )
        q.awaitTermination(600)
        st = spark.read.parquet(state)
        per_batch.append({"state_rows": st.count()})
    types, hours = events.agg(
        F.countDistinct("event_type"),
        F.countDistinct(F.date_trunc("hour", "ts")),
    ).first()
    grain_bound = types * hours
    ok = per_batch[-1]["state_rows"] <= grain_bound
    results["volume_monitor"] = {
        "per_batch": per_batch,
        "grain_bound_types_x_hours": grain_bound,
        "corpus_rows": n_total,
        "bound_ok": ok,
    }
    failures += 0 if ok else 1

    docs_src = os.path.join(PROBE_DIR, "documents.parquet")
    if os.path.exists(docs_src):
        docs = spark.read.parquet(docs_src).select("doc_id", "source")
        inbox = os.path.join(work, "srm_inbox")
        state = os.path.join(work, "srm_state")
        ckpt = os.path.join(work, "srm_ckpt")
        per_batch = []
        for i in range(N_CHUNKS):
            docs.filter(F.pmod(F.col("doc_id"), N_CHUNKS) == i).coalesce(
                2
            ).write.mode("append").parquet(inbox)
            q = streaming_srm_monitor(
                spark, inbox, docs.schema, state, checkpoint=ckpt
            )
            q.awaitTermination(600)
            per_batch.append({"state_rows": spark.read.parquet(state).count()})
        segs = docs.select("source").distinct().count()
        # NULL-segment row (if any) rides the same grid: segs+1 slack
        grain_bound = (segs + 1) * 2
        ok = per_batch[-1]["state_rows"] <= grain_bound
        results["srm_monitor"] = {
            "per_batch": per_batch,
            "grain_bound_segments_x_arms": grain_bound,
            "corpus_rows": docs.count(),
            "bound_ok": ok,
        }
        failures += 0 if ok else 1
    return failures


def main() -> int:
    src = os.path.join(PROBE_DIR, "events.parquet")
    if not os.path.exists(src):
        print(
            json.dumps(
                {
                    "metric": "streaming_state_scale",
                    "error": f"{src} missing — run `python3 scale_probe.py`",
                }
            )
        )
        return 2
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.read.parquet(src)
    work = tempfile.mkdtemp(prefix="procoggraph_state_probe_")
    results: dict = {}
    try:
        failures = probe_stateful(spark, events, work, results)
        failures += probe_monitors(spark, events, work, results)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "streaming_state_scale",
                "chunks": N_CHUNKS,
                "results": results,
                "bounds_ok": failures == 0,
            }
        )
    )
    return failures


if __name__ == "__main__":
    sys.exit(main())
