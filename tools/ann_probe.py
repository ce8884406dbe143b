"""Million-scale ANN quality/cost probe: IVF+PQ recall@10 vs exact
brute force at 1M x 64d, with bytes-scanned accounting.

The billion-scale serving claim for `operators/pq.py` rests on the
IVF cell pruning (scan n_probe/n_cells of the corpus) and the PQ code
compression (16 B/vector instead of 512 B float64 / 256 B float32).
This probe measures what that costs in recall at 1M vectors — 10x the
largest pytest corpus — across an n_probe sweep, and records wall
clock for index build and query.

Corpus: unit-normalized vectors around `N_LATENT` latent cluster
centers (the realistic ANN regime — embedding corpora are clustered;
a uniform-random corpus has no meaningful neighbors to recall). The
per-component noise sigma 0.12 gives a moderately-clustered corpus
(noise norm ~= the center norm); an offline parameter study showed
sigma 0.35 collapses to near-uniform-on-the-sphere where IVF pruning
itself bounds recall below 0.6.
Deterministic end-to-end: numpy Generator seeded per Arrow batch from
the batch's first id, centers from a fixed seed; ground truth is
exact GEMM cosine top-k (unit vectors => cosine order == L2 order, so
the ADC-L2 index and the cosine ground truth rank identically).

Measures BOTH serving shapes per n_probe: ADC-only ranking (codes
rank the final top-k — cheapest, recall-lossy) and ADC-shortlist-100
with exact rerank (`ivf_pq_rerank_topk` — codes cut, raw vectors
rank; the production shape).

Not part of the driver bench contract (bench.py is). Usage:

    python3 tools/ann_probe.py            # ~3-6 min on local[32]
    SPARK_GRAFT_ANN_N=100000 python3 tools/ann_probe.py   # smaller rehearsal

Prints one JSON line per n_probe setting plus a summary line; paste
the summary into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from procoggraph_spark.operators.pq import (
    ivf_pq_index_numpy,
    ivf_pq_rerank_topk,
    ivf_pq_topk,
    train_pq,
)
from procoggraph_spark.operators.similarity import gemm_topk, train_centroids
from procoggraph_spark.session import get_spark

N = int(os.environ.get("SPARK_GRAFT_ANN_N", "1000000"))
DIM = 64
N_LATENT = 1024          # latent cluster centers in the synthetic corpus
N_CELLS = 256            # IVF coarse cells
PQ_M, PQ_K = 16, 16      # 16 codes of 4 bits -> 16 B/vector (int32 here;
                         # a packed layout would be 8 B)
TRAIN_SAMPLE = min(N, 100_000)  # rows used to train centroids + codebooks
N_QUERIES = 50
TOP_K = 10
N_PROBES = (4, 8, 16, 32)
# the ADC shortlist must scale with the per-probe candidate population
# (~n_probe * N/N_CELLS): a fixed 100 at 1M asks ADC to surface the
# true top-10 out of ~60k candidates — offline study shows shortlist
# 1000 recovers the IVF probe bound at 1M (0.87-0.93) where 100 stalls
# at 0.64-0.68.
SHORTLIST = max(100, N // 1000)


def build_corpus(spark, n: int):
    """id -> unit vector near center[id % N_LATENT] + sigma*noise."""
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((N_LATENT, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            g = np.random.default_rng(int(ids[0]) + 1)
            V = centers[ids % N_LATENT] + 0.12 * g.standard_normal(
                (len(ids), DIM)
            )
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(V)})

    return spark.range(n).repartition(64).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def main() -> None:
    spark = get_spark("ann_probe")
    t0 = time.time()
    corpus = build_corpus(spark, N)
    # materialize once: every stage (training sample, index build,
    # ground truth) scans the same frozen corpus
    corpus = corpus.localCheckpoint()
    n = corpus.count()
    gen_s = round(time.time() - t0, 1)

    sample = corpus.filter(F.col("vec_id") % (N // TRAIN_SAMPLE) == 0)
    t0 = time.time()
    # l2 metric: the IVF+PQ index assigns cells by L2 argmin, so the
    # cells must be TRAINED under L2 too — training them under cosine
    # (the ivf_topk convention) costs ~0.1 recall@10 at 1M
    cents = train_centroids(sample, n_cells=N_CELLS, iterations=3, metric="l2")
    books = train_pq(sample, m=PQ_M, k=PQ_K, dim=DIM, iterations=2)
    train_s = round(time.time() - t0, 1)

    t0 = time.time()
    index = ivf_pq_index_numpy(corpus, cents, books).localCheckpoint()
    index.count()
    index_s = round(time.time() - t0, 1)

    qrows = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in corpus.filter(
            F.col("vec_id") % (N // N_QUERIES) == 3
        ).limit(N_QUERIES).collect()
    ]
    qdf = spark.createDataFrame(qrows, "vec_id long, embedding array<double>")

    t0 = time.time()
    gt = {
        (r["query_id"], r["neighbor_id"])
        for r in gemm_topk(corpus, qdf, k=TOP_K).collect()
    }
    gt_s = round(time.time() - t0, 1)

    # cost accounting per query (database side only):
    #   exact scan: N * DIM * 8 B of raw vectors
    #   IVF+PQ:     (n_probe/N_CELLS) * N * PQ_M B of codes
    exact_bytes = n * DIM * 8
    out = {
        "probe": "ivf_pq_1m",
        "n": n,
        "dim": DIM,
        "cells": N_CELLS,
        "pq": f"m{PQ_M}k{PQ_K}",
        "gen_s": gen_s,
        "train_s": train_s,
        "index_s": index_s,
        "gt_s": gt_s,
        "sweep": {},
    }
    for n_probe in N_PROBES:
        # ADC-only: codes rank the final top-k. The query is its own
        # nearest ADC hit (dist ~0) but gemm ground truth excludes
        # self, so drop self-pairs and ask for k+1.
        t0 = time.time()
        adc_rows = ivf_pq_topk(
            index, qrows, cents, books, n_probe=n_probe, top_k=TOP_K + 1
        ).collect()
        adc_s = round(time.time() - t0, 1)
        by_q: dict[int, list] = {}
        for r in sorted(adc_rows, key=lambda r: (r["query_id"], r["rank"])):
            if r["query_id"] != r["vec_id"]:
                by_q.setdefault(r["query_id"], []).append(r["vec_id"])
        got_adc = {
            (q, v) for q, vs in by_q.items() for v in vs[:TOP_K]
        }
        # shortlist + exact rerank: the production shape
        t0 = time.time()
        rr = ivf_pq_rerank_topk(
            index, corpus, qrows, cents, books,
            n_probe=n_probe, shortlist=SHORTLIST, top_k=TOP_K,
            exclude_self=True,
        )
        got_rr = {(r["query_id"], r["vec_id"]) for r in rr.collect()}
        rr_s = round(time.time() - t0, 1)
        recall_adc = round(len(gt & got_adc) / max(1, len(gt)), 4)
        recall_rr = round(len(gt & got_rr) / max(1, len(gt)), 4)
        scanned = int(n * n_probe / N_CELLS) * PQ_M
        row = {
            "n_probe": n_probe,
            "recall_at_10_adc": recall_adc,
            "recall_at_10_rerank": recall_rr,
            "adc_query_s": adc_s,
            "rerank_query_s": rr_s,
            "bytes_scanned_per_query": scanned + SHORTLIST * DIM * 8,
            "vs_exact_bytes": round(
                (scanned + SHORTLIST * DIM * 8) / exact_bytes, 5
            ),
        }
        out["sweep"][str(n_probe)] = row
        print(json.dumps({"probe": "ivf_pq_1m", **row}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
