"""Registry-wide redundant-pass audit: for every declared query, count
how many times the final physical plan scans each parquet source (a
table scanned N>1 times means the corpus lineage re-executes N times
unless the repetition is inherent to the operator, e.g. a self-join),
plus nested-loop joins. Plans render lazily — no execution.

Formatted plans print each scan twice (tree + detail); the detail line
is `Location: InMemoryFileIndex [file:...]`, counted once per node.
Lazy localCheckpoints hide their lineage's scan — a query whose scans
were deliberately folded into a checkpoint shows fewer scans here, not
more.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procoggraph_spark.queries import registry  # noqa: E402
from procoggraph_spark.session import (  # noqa: E402
    apply_adaptive_policy,
    formatted_plan,
    get_spark,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scan_audit")
    apply_adaptive_policy(spark, sf_dir)
    qs, _ = registry()
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERR\t{type(e).__name__}: {e}")
            continue
        locs = re.findall(r"Location: \S+ \[[^\]]*?([a-z_0-9]+)\.parquet", plan)
        # bucketed catalog tables list their table dir instead
        locs += re.findall(r"Location: \S+ \[[^\]]*bucketed/([a-z_0-9]+)", plan)
        c = Counter(locs)
        multi = {t: n for t, n in c.items() if n > 1}
        bnlj = plan.count("BroadcastNestedLoopJoin")
        cart = plan.count("CartesianProduct")
        if multi or bnlj or cart:
            print(
                f"{name}\tmulti={multi or ''}\tbnlj={bnlj}\tcart={cart}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
