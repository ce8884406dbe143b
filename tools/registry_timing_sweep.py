"""Timed noop sweep of EVERY registry query at $SPARK_GRAFT_SF_DIR:
one resident session (bench.py's session policy), per-query
best-of-N wall seconds into the noop sink, sorted slowest-first.

The optimization-round triage tool: the driver's bench times the 13
HEADLINE queries; this answers "is any of the other 181 a hidden
scale or latency outlier?" Queries whose construction collects
model-sized state (k-means seeds, BPE merges, classifier weights)
pay that once at build, outside the timed region — same treatment
bench.py gives plan construction.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procoggraph_spark.queries import registry
from procoggraph_spark.session import apply_adaptive_policy, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("SWEEP_ROUNDS", "2"))


def main() -> None:
    spark = get_spark("registry_timing_sweep")
    apply_adaptive_policy(spark, SF_DIR)
    qs, _ = registry()
    best: dict[str, float] = {}
    err: dict[str, str] = {}
    for r in range(ROUNDS):
        for name in sorted(qs):
            if name in err:
                continue
            try:
                df = qs[name](spark, SF_DIR)
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best[name] = min(best.get(name, 9e9), dt)
            except Exception as e:  # noqa: BLE001 — a failure IS a finding
                err[name] = f"{type(e).__name__}: {e}"
    for name in sorted(best, key=best.get, reverse=True):
        print(f"{best[name]:8.3f}  {name}")
    for name, msg in err.items():
        print(f"     ERR  {name}  {msg}")
    total = sum(best.values())
    print(f"# total(best) {total:.2f} s over {len(best)} queries, {len(err)} errors")
    spark.stop()


if __name__ == "__main__":
    main()
