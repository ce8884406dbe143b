"""Decompose sim_bruteforce_topk (operators/similarity.gemm_topk) into
its pipeline stages — parquet scan+searchable (JVM), Arrow transfer,
BLAS GEMM, local+global top-k — at sf0.1 and the 10x/40x synthetic
embeddings, to attribute the exact-scan row's linear growth (round-10
verdict item 5: is it the matmul, as an exact scan must be, or hidden
Arrow serialization overhead?).

Method: four cumulative variants, interleaved best-of-3 in ONE session
(host-noise discipline from BENCH.md):
  scan  — searchable() + sum(size(vec)): forces the full vector read,
          stays JVM-side
  arrow — + mapInPandas pass-through (yields one count row per batch):
          adds the Arrow hop, no math
  gemm  — + V @ Q.T per batch (and the norm divide), result discarded
  full  — gemm_topk itself (adds 6-decimal round, per-partition
          lexsort top-k, global rank window)
Stage attribution = successive differences.

Usage:
    python tools/gemm_decomp_probe.py             # sf0.1 + any probe dirs present
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from procoggraph_spark.operators.similarity import (  # noqa: E402
    gemm_topk,
    searchable,
)
from procoggraph_spark.queries.common import t  # noqa: E402
from procoggraph_spark.session import get_spark  # noqa: E402

DATASETS = [
    ("sf0.1", "/root/testdata/sf0.1", True),
    ("10x", "/tmp/procoggraph_sfprobe", False),
    ("40x", "/tmp/procoggraph_sfprobe40", False),
]
RUNS = 3


def _load(spark, sf_dir: str, via_t: bool):
    if via_t:
        e = t(spark, sf_dir, "embeddings")
    else:
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return e.select("vec_id", "embedding")


def variants(spark, sf_dir: str, via_t: bool):
    e = _load(spark, sf_dir, via_t)
    queries = e.filter(F.col("vec_id") < 5)
    qrows = searchable(queries, "embedding").collect()
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    Qn = np.linalg.norm(Q, axis=1)
    base = searchable(e, "embedding").select("vec_id", "embedding")
    count_schema = T.StructType([T.StructField("n", T.LongType())])

    def passthrough(batches):
        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    def with_gemm(batches):
        for pdf in batches:
            pdf = pdf[pdf["embedding"].notna()]
            if not len(pdf):
                continue
            V = np.array(list(pdf["embedding"]), dtype=np.float64)
            Vn = np.linalg.norm(V, axis=1)
            nz = Vn != 0.0
            V, Vn = V[nz], Vn[nz]
            S = (V @ Q.T) / np.outer(Vn, Qn)
            yield pd.DataFrame({"n": [int(S.shape[0])]})

    return {
        "scan": lambda: base.agg(
            F.sum(F.size("embedding"))
        ).collect(),
        "arrow": lambda: base.mapInPandas(passthrough, count_schema)
        .agg(F.sum("n"))
        .collect(),
        "gemm": lambda: base.mapInPandas(with_gemm, count_schema)
        .agg(F.sum("n"))
        .collect(),
        "full": lambda: gemm_topk(e, queries, k=10).agg(
            F.count("*")
        ).collect(),
    }


def main() -> int:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, sf_dir, via_t in DATASETS:
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            continue
        v = variants(spark, sf_dir, via_t)
        rounds = []
        for name in v:  # warm (stage/memo/JIT) before timing
            v[name]()
        for _ in range(RUNS):
            times = {}
            for name, fn in v.items():  # interleaved
                t0 = time.monotonic()
                fn()
                times[name] = time.monotonic() - t0
            rounds.append(times)
        # Stage attribution per ROUND, then min of the differences
        # (round-11 advisory): subtracting per-variant minima taken
        # independently across interleaved rounds lets a later stage's
        # best undercut an earlier stage's best under host noise,
        # yielding negative/misattributed stage times. Within one round
        # the variants share the same noise regime; clamp at 0 for the
        # residual floor.
        def stage_min(a, b):
            return max(0.0, min(r[b] - r[a] for r in rounds))

        best_full = min(r["full"] for r in rounds)
        stages = {
            "scan": min(r["scan"] for r in rounds),
            "arrow_hop": stage_min("scan", "arrow"),
            "gemm": stage_min("arrow", "gemm"),
            "topk": stage_min("gemm", "full"),
            "full": best_full,
        }
        out[label] = {k: round(s, 3) for k, s in stages.items()}
    print(json.dumps({"metric": "gemm_topk_decomposition", "stages": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
