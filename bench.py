"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall-clock seconds.

Queries are forced end-to-end with the noop sink (full evaluation, no
collect/IO cost in the measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from procoggraph_spark.queries import registry
from procoggraph_spark.session import apply_adaptive_policy, get_spark

HEADLINE = [
    "a1_pricing_summary",
    "j7_star_join_rollup",
    "q4_report_card",
    "q9_group_by_array",
    "w5_topk_per_group",
    "a7_range_compress",
    "p6_ownership_classify",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "text_quality_score",
    "stream_session_window",
    "training_data_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # scale factor from the dir name only when it actually looks like
    # sf<number>; otherwise report the dir name verbatim
    base = os.path.basename(sf_dir.rstrip("/"))
    m = re.fullmatch(r"sf(\d+(?:\.\d+)?)", base)
    sf: float | str = float(m.group(1)) if m else base
    spark = get_spark("procoggraph_bench")
    # three-regime size policy (<64 MB interactive / 64 MB-1 GB
    # crossover / >=1 GB cluster) — see session.apply_adaptive_policy
    apply_adaptive_policy(spark, sf_dir)
    qs, _ = registry()

    # JVM/codegen warmup outside the measurement: one shuffle + one scan
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    qs["w5_topk_per_group"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Steady-state measurement: run each query three times and report the
    # best. Run 1 pays one-time costs a resident engine amortizes (plan
    # compilation, parquet footer/schema load, codegen); later runs are
    # the latency a served query actually has, and best-of-3 rides out
    # background-load spikes on a shared host. The registry serves the
    # logical plan from its plan cache (build cost sits outside the
    # timed region anyway); every timed run re-executes the plan end to
    # end — full scan, shuffle, aggregation — into the noop sink, so
    # there is no result caching.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            df = qs[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
