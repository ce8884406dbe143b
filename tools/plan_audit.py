"""Plan capture + red-flag audit for the optimization rounds.

Two jobs:

1. ``--capture <outdir> [names...]`` — write ``<name>_<tag>.txt`` files
   holding ``explain("formatted")`` for the given queries (default: the
   bench HEADLINE set) under the same session policy bench.py uses, so
   plan claims in OPTIMIZATION_r*.md are reproducible artifacts.
2. ``--audit`` (default) — walk EVERY registry query, render its
   formatted plan, and report per-query: Exchange count, join strategies,
   Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInPandas
   / FlatMapGroupsInPandas), cartesian products, and whether the scan
   carries PushedFilters. One TSV line per query; nonzero exit when a
   NEW cartesian product or row-at-a-time BatchEvalPython shows up
   outside the allowlist (none expected).

Plans are rendered lazily (no execution), so the audit is cheap — it
times out only if a query's *construction* runs jobs (the eager
dominant-dim derivation in t() is one small aggregate per table load,
memoized across queries).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procoggraph_spark.queries import registry  # noqa: E402
from procoggraph_spark.session import (  # noqa: E402
    apply_adaptive_policy,
    formatted_plan,
    get_spark,
)

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

_PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_audit")
    apply_adaptive_policy(spark, sf_dir)
    qs, _ = registry()

    if args and args[0] == "--capture":
        outdir = args[1]
        tag = os.environ.get("PLAN_TAG", "before")
        names = args[2:] or HEADLINE
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            text = formatted_plan(df)
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(text)
            print(f"wrote {path} ({len(text)} bytes)")
        spark.stop()
        return

    # --audit
    print("query\texchanges\tjoins\tpy_nodes\tcartesian\tpushed_filters\tnotes")
    bad = 0
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # construction failure IS a finding
            print(f"{name}\tERR\t\t\t\t\t{type(e).__name__}: {e}")
            bad += 1
            continue
        exch = len(re.findall(r"\bExchange\b", plan))
        joins = ",".join(
            sorted(
                {
                    m
                    for m in re.findall(
                        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                        r"BroadcastNestedLoopJoin|CartesianProduct)",
                        plan,
                    )
                }
            )
        )
        py = ",".join(sorted({m for m in _PY_NODES if m in plan}))
        cart = "CartesianProduct" in plan
        pushed = "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        )
        notes = []
        if "BatchEvalPython" in plan:
            notes.append("row-at-a-time-python")
            bad += 1
        if cart:
            notes.append("cartesian")
            bad += 1
        print(
            f"{name}\t{exch}\t{joins}\t{py}\t{cart}\t{pushed}\t{';'.join(notes)}"
        )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
