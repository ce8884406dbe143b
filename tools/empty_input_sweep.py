"""Empty-input robustness sweep: run every registry query against a
zero-row copy of the star schema (same schemas, 0 rows). The contract:
SEARCH/ANALYTICS queries return empty results; TRAINER queries raise a
descriptive ValueError (you cannot train a model on nothing); nothing
raises a raw numpy/JVM error. Run from the repo root:

    python tools/empty_input_sweep.py

Round-7 initial run found 8 raw crashes (GEMM on a zero-row query
matrix, np.stack on an empty centroid list, IndexError on empty PQ
seeds) — all fixed; this script is the re-check.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from procoggraph_spark.queries import registry  # noqa: E402
from procoggraph_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_EMPTY_SRC", "/root/testdata/sf0.001")
DST = os.environ.get("SPARK_GRAFT_EMPTY_DIR", "/tmp/procoggraph_empty_sf")


def main() -> None:
    spark = get_spark("empty_input_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for f in os.listdir(SRC):
        out = os.path.join(DST, f)
        if not os.path.exists(out):
            spark.read.parquet(os.path.join(SRC, f)).limit(0).coalesce(
                1
            ).write.mode("overwrite").parquet(out)
    queries, _ = registry()
    crashes = []
    trainer_errors = []
    for name, fn in queries.items():
        try:
            fn(spark, DST).count()
        except ValueError as e:
            trainer_errors.append((name, str(e).splitlines()[0][:80]))
        except Exception as e:  # raw crash: a robustness bug
            crashes.append((name, type(e).__name__, repr(e)[:120]))
    print(f"{len(queries)} queries; {len(crashes)} raw crashes; "
          f"{len(trainer_errors)} designed trainer ValueErrors")
    for row in trainer_errors:
        print("  trainer:", *row)
    for row in crashes:
        print("  CRASH:", *row)
    raise SystemExit(1 if crashes else 0)


if __name__ == "__main__":
    main()
