"""Degenerate-input robustness sweeps: run every registry query against
(a) a zero-row copy of the star schema, and with --nulls (b) a copy
with NULLs injected into the payload columns (text/source, embedding/
label, props/value). The contract: SEARCH/ANALYTICS queries return
empty or NULL-row-free results; TRAINER queries raise a descriptive
ValueError (you cannot train a model on nothing); nothing raises a raw
numpy/JVM/ANSI error. Run from the repo root:

    python tools/empty_input_sweep.py          # empty-table sweep
    python tools/empty_input_sweep.py --nulls  # NULL-injection sweep

Round-7 initial runs found 8 empty-input crashes (GEMM on a zero-row
query matrix, np.stack on an empty centroid list, IndexError on empty
PQ seeds) and 8 NULL-input crashes (NULL vectors reaching the numpy
kernels; zero-norm cosine dividing by zero under ANSI) — all fixed;
this script is the re-check.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from procoggraph_spark.queries import registry  # noqa: E402
from procoggraph_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_EMPTY_SRC", "/root/testdata/sf0.001")
DST = os.environ.get("SPARK_GRAFT_EMPTY_DIR", "/tmp/procoggraph_empty_sf")


def _nullify(df, name):
    from pyspark.sql import functions as F

    mods = {
        "documents": [("text", "doc_id", 7), ("source", "doc_id", 11)],
        "embeddings": [("embedding", "vec_id", 13), ("label", "vec_id", 9)],
        "events": [("props", "event_id", 5), ("value", "event_id", 6)],
    }
    for col, key, mod in mods.get(name, []):
        df = df.withColumn(
            col, F.when(F.col(key) % mod == 0, None).otherwise(F.col(col))
        )
    if name == "embeddings":
        # ragged vectors too (a truncated encoder output): the numpy
        # kernels must drop them at the dimension boundary, never crash
        # np.stack (round-9 liveness contract)
        df = df.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 17 == 3, F.slice(F.col("embedding"), 1, 3)
            ).otherwise(F.col("embedding")),
        )
    return df


def main() -> None:
    nulls = "--nulls" in sys.argv
    dst = DST + ("_nulls" if nulls else "")
    spark = get_spark("empty_input_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(SRC):
        out = os.path.join(dst, f)
        if not os.path.exists(out):
            df = spark.read.parquet(os.path.join(SRC, f))
            if nulls:
                df = _nullify(df, f.replace(".parquet", ""))
            else:
                df = df.limit(0)
            df.coalesce(1).write.mode("overwrite").parquet(out)
    queries, _ = registry()
    crashes = []
    trainer_errors = []
    for name, fn in queries.items():
        try:
            fn(spark, dst).count()
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
