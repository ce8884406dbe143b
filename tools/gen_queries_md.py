"""Regenerate QUERIES.md from the live registry (run from the repo root:
``python tools/gen_queries_md.py``). One row per queries() entry in
registration order; summary = the callable's docstring lead sentence,
flattened and truncated to 140 chars. Kept in sync by
tests/test_oracle_parity.py::test_queries_md_in_sync.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HEADER = """# QUERIES — registry index (generated; kept in sync by tests/test_oracle_parity.py::test_queries_md_in_sync)

One row per `__spark_entry__.queries()` entry, in registration order
(the driver's CORRECTNESS gate samples the first 50). `oracle` =
DuckDB SQL twin hash-compared at sf0.001 and sf0.01; `rows-only` =
engine-hash-dependent result verified by pytest instead. Summaries
are the callable's docstring lead sentence. COVERAGE.md maps these
onto the SURVEY §2 operator inventory.

| # | query | check | summary |
|---|---|---|---|
"""


def summarize(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    flat = re.sub(r"\s+", " ", doc)
    lead = flat.split(". ")[0].rstrip(".").replace("|", "\\|")
    if len(lead) > 140:
        lead = lead[:137] + "..."
    return lead


def main() -> None:
    from procoggraph_spark.queries import registry

    queries, oracles = registry()
    lines = [HEADER]
    for i, (name, fn) in enumerate(queries.items()):
        check = "oracle" if name in oracles else "rows-only"
        lines.append(f"| {i} | `{name}` | {check} | {summarize(fn)} |\n")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "QUERIES.md")
    with open(out, "w") as f:
        f.writelines(lines)
    print(f"wrote {len(queries)} rows")


if __name__ == "__main__":
    main()
