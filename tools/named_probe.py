"""Isolated best-of-N timing for named registry queries: one fresh
session under bench.py's policy, warmup run then N timed noop-sink
executions per query — the focused companion to registry_timing_sweep
(whose 194-query interleave inflates absolutes 2-5x via session aging).

Usage: python tools/named_probe.py [-n 3] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procoggraph_spark.queries import registry
from procoggraph_spark.session import apply_adaptive_policy, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("named_probe")
    apply_adaptive_policy(spark, SF_DIR)
    qs, _ = registry()
    for name in args.names:
        if name not in qs:
            print(f"?????  {name} (unknown)")
            continue
        df = qs[name](spark, SF_DIR)
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df.write.format("noop").mode("overwrite").save()  # warmup
        best, runs = float("inf"), []
        for _ in range(args.n):
            df = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(dt)
            best = min(best, dt)
        print(f"{best:7.3f}  {name}  runs={','.join(f'{r:.3f}' for r in runs)}")
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
