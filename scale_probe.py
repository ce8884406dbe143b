"""Scale probe: generate a ~10x synthetic star schema (sf≈1: 6M
lineitem / 1.5M orders) and time the relational headline queries on it,
next to sf0.1, to check the scaling exponent empirically.

Not part of the driver bench contract (`bench.py` is). Usage:

    python3 scale_probe.py            # generates to /tmp/procoggraph_sfprobe once
    python3 scale_probe.py fullsuite  # whole headline suite vs DuckDB
    SPARK_GRAFT_PROBE_SCALE=40 SPARK_GRAFT_PROBE_DIR=/tmp/procoggraph_sfprobe40 \
        python3 scale_probe.py structural   # floor-bound rows at 30-50x

The synthetic tables use the generic multi-file path (no single-file
staging, no bucketing) — i.e. the layout/plan a real cluster run has.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from procoggraph_spark.queries import registry
from procoggraph_spark.session import get_spark

PROBE_DIR = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/procoggraph_sfprobe")
SCALE = int(os.environ.get("SPARK_GRAFT_PROBE_SCALE", "10"))  # x sf0.1
RELATIONAL = [
    "a1_pricing_summary",
    "j7_star_join_rollup",
    "q4_report_card",
    "q9_group_by_array",
    "w5_topk_per_group",
    "a7_range_compress",
    "p6_ownership_classify",
    "dedup_exact",
    "u7_cofactor_priority",
]


def probe_part(spark):
    """Probe part table (p_type/p_size drive u7_cofactor_priority)."""
    n_part = 20_000 * SCALE
    return spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.lit("Brand#"), F.pmod(F.col("id"), F.lit(25)).cast("string")
        ).alias("p_brand"),
        F.element_at(
            F.array(*[F.lit(x) for x in (
                "ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"
            )]),
            (F.pmod(F.col("id") * 2654435761, F.lit(6)) + 1).cast("int"),
        ).alias("p_type"),
        (F.pmod(F.col("id"), F.lit(50)) + 1).cast("int").alias("p_size"),
    )


def generate(spark) -> None:
    n_li = 600_000 * SCALE
    n_ord = n_li // 4
    n_cust = 15_000 * SCALE
    n_part = 20_000 * SCALE
    n_supp = 1_000 * SCALE

    li = spark.range(n_li).select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        (F.pmod(F.col("id") * 2654435761, F.lit(n_part))).cast("long").alias("l_partkey"),
        (F.pmod(F.col("id") * 40503, F.lit(n_supp))).cast("long").alias("l_suppkey"),
        (F.pmod(F.col("id"), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(F.col("id"), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        ((F.pmod(F.col("id") * 9176, F.lit(90000)) + 10000) / 100.0).alias("l_extendedprice"),
        (F.pmod(F.col("id"), F.lit(11)) / 100.0).alias("l_discount"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            (F.pmod(F.col("id"), F.lit(2)) + 1).cast("int"),
        ).alias("l_linestatus"),
        # timestamp like the driver testdata (the a1 oracle compares
        # against a TIMESTAMP literal on both engines)
        F.date_add(
            F.lit("1995-01-01").cast("date"), F.pmod(F.col("id"), F.lit(2400)).cast("int")
        ).cast("timestamp").alias("l_shipdate"),
    )
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.col("id") * 48271, F.lit(n_cust)).cast("long").alias("o_custkey"),
        (F.pmod(F.col("id") * 7, F.lit(100000)) / 100.0 + 1000.0).alias("o_totalprice"),
        F.concat(F.lit("P"), F.pmod(F.col("id"), F.lit(5)).cast("string")).alias("o_orderpriority"),
    )
    part = probe_part(spark)
    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.pmod(F.col("id"), F.lit(25)).cast("int").alias("c_nationkey"),
    )
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id").cast("string")).alias("n_name"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("n_regionkey"),
    )
    region = spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.concat(F.lit("REGION_"), F.col("id").cast("string")).alias("r_name"),
    )
    for name, df in [
        ("lineitem", li), ("orders", orders), ("part", part),
        ("customer", cust), ("nation", nation), ("region", region),
    ]:
        df.write.mode("overwrite").parquet(os.path.join(PROBE_DIR, f"{name}.parquet"))
    generate_docs_supplier(spark)


def generate_docs_supplier(spark) -> None:
    # documents stand-in with DIVERSE token content: each unique text is
    # a sequence of id-derived pseudo-words, so unrelated docs share few
    # bigram shingles (a template-heavy corpus would make every doc a
    # near-dup of every other and LSH candidate generation — correctly —
    # blows up toward O(n^2)). ids >= n_unique duplicate earlier texts,
    # planting one exact-dup partner for 20% of the corpus.
    n_docs = 5_000 * SCALE
    n_unique = 4_000 * SCALE
    uid = F.pmod(F.col("id"), F.lit(n_unique))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(14)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(uid, i), F.lit(50_000)).cast("string"),
        ),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("doc "), uid.cast("string"), F.lit(" "), F.array_join(words, " ")
        ).alias("text"),
        F.lit("probe").alias("source"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(PROBE_DIR, "documents.parquet"))
    supplier = spark.range(1_000 * SCALE).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id").cast("string")).alias("s_name"),
        F.pmod(F.col("id"), F.lit(25)).cast("int").alias("s_nationkey"),
        (F.pmod(F.col("id") * 7919, F.lit(1_000_000)) / 100.0).alias("s_acctbal"),
    )
    supplier.write.mode("overwrite").parquet(os.path.join(PROBE_DIR, "supplier.parquet"))


def generate_events(spark) -> None:
    """Events at SCALE× the sf0.1 shape (100 k rows / 1 500 users /
    5 types over 30 days): xxhash-scattered timestamps so per-user
    streams have realistic gaps for sessionization."""
    n_ev = 100_000 * SCALE
    base_epoch = 1_704_067_200  # 2024-01-01T00:00:00Z
    ev = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(base_epoch)
            + F.pmod(F.xxhash64(F.col("id")), F.lit(30 * 24 * 3600))
        ).alias("ts"),
        F.pmod(F.col("id") * 48271, F.lit(1_500 * SCALE)).cast("long").alias("user_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in ("view", "click", "purchase", "signup", "refund")]),
            (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("id") * 9176, F.lit(10_000)) / 100.0).alias("value"),
        F.concat(F.lit('{"k":'), F.pmod(F.col("id"), F.lit(9)).cast("string"), F.lit("}")).alias("props"),
    )
    ev.write.mode("overwrite").parquet(os.path.join(PROBE_DIR, "events.parquet"))


def generate_embeddings(spark) -> None:
    n_vec = 10_000 * SCALE
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) - 1000) / 1000.0,
        ).alias("embedding"),
        F.concat(F.lit("lab"), F.pmod(F.col("id"), F.lit(8)).cast("string")).alias("label"),
    )
    emb.write.mode("overwrite").parquet(os.path.join(PROBE_DIR, "embeddings.parquet"))


def llmops_probe(spark) -> dict:
    """Scale the near-dup + ANN operators to the FULL probe corpus
    (50k docs / 100k vectors at SCALE=10) — no doc_id cap, the size
    where the LSH/IVF candidate-pruning is actually load-bearing."""
    import time as _t

    from procoggraph_spark.operators import dedup as D
    from procoggraph_spark.operators import similarity as S

    out = {}
    docs = spark.read.parquet(os.path.join(PROBE_DIR, "documents.parquet"))
    t0 = _t.perf_counter()
    sigs = D.minhash_signatures(docs, id_col="doc_id", text_col="text", n=2, num_hashes=64)
    pairs = D.minhash_lsh_pairs(sigs, id_col="doc_id", bands=16, rows_per_band=4)
    n_pairs = pairs.filter(F.col("est_jaccard") >= 0.5).count()
    out["minhash_lsh_fullcorpus"] = {
        "sec": round(_t.perf_counter() - t0, 2),
        "docs": docs.count(),
        "neardup_pairs": n_pairs,
    }

    # corpus-scoring family at full corpus: TF-IDF (vocabulary-keyed
    # shuffle join) and unigram-LM cross-entropy — the two ops whose
    # vocabulary-sized intermediates only show their cost at corpus size
    from procoggraph_spark.operators import text as X

    t0 = _t.perf_counter()
    n_tfidf = X.tfidf_top_terms(docs, id_col="doc_id", text_col="text", k=3).count()
    out["tfidf_fullcorpus"] = {
        "sec": round(_t.perf_counter() - t0, 2),
        "result_rows": n_tfidf,
    }
    t0 = _t.perf_counter()
    n_lm = X.unigram_logprob(docs, id_col="doc_id", text_col="text").count()
    out["unigram_lm_fullcorpus"] = {
        "sec": round(_t.perf_counter() - t0, 2),
        "result_rows": n_lm,
    }

    emb = spark.read.parquet(os.path.join(PROBE_DIR, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 8)
    t0 = _t.perf_counter()
    topk = S.ivf_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                      n_cells=64, n_probe=8, k=10)
    n_rows = topk.count()
    out["ivf_ann_fullcorpus"] = {
        "sec": round(_t.perf_counter() - t0, 2),
        "vectors": emb.count(),
        "result_rows": n_rows,
    }
    return out


ANALYTICS_EVENTS = [
    # the star_llmops8/9 events family (round-7 driver window rows):
    # every op reads ONLY the events table, so the probe isolates their
    # scaling on 10x events (1M rows / 15k users at SCALE=10)
    "events_sessionize",
    "events_funnel_conversion",
    "events_top_transitions",
    "events_cohort_retention",
    "events_volume_anomaly",
    "events_user_pareto",
    "events_activity_heatmap",
    "events_last_touch_attribution",
    "events_time_to_conversion",
    "events_dau_stickiness",
    "events_weekly_streaks",
    "events_recency_engagement",
]


def analytics_probe(spark) -> dict:
    """Time the events-analytics family (sessionization, funnels,
    retention, transition mining, engagement) at sf0.1 vs the 10x
    probe — the empirical check that their window partitioning keys
    (user_id, bounded grains) hold as event volume grows."""
    qs, _ = registry()
    out = {}
    for sf_dir, label in [
        ("/root/testdata/sf0.1", "sf0.1"),
        (PROBE_DIR, f"sf0.1x{SCALE}"),
    ]:
        timings = {}
        for name in ANALYTICS_EVENTS:
            best = float("inf")
            for _ in range(2):
                df = qs[name](spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        out[label] = timings
    out["ratio"] = {
        k: round(out[f"sf0.1x{SCALE}"][k] / max(out["sf0.1"][k], 1e-9), 1)
        for k in ANALYTICS_EVENTS
    }
    return out


def crossover_probe(spark) -> dict:
    """The sf1 crossover record (round-1 task 8): the four queries whose
    sf0.1 ratios are floor-dominated (a1/w5/dedup_exact/sim_bruteforce),
    Spark vs DuckDB running the SAME oracle SQL on the SAME probe
    parquet, best-of-3 interleaved in one process. At 10x data the
    fixed per-query scheduling constant amortizes and the ratio reflects
    engine throughput, not launch overhead."""
    import duckdb

    from procoggraph_spark.queries import registry as _registry

    qs, oracles = _registry()
    names = [
        "a1_pricing_summary",
        "w5_topk_per_group",
        "dedup_exact",
        "sim_bruteforce_topk",
    ]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for tbl in ("lineitem", "orders", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{PROBE_DIR}/{tbl}.parquet/*.parquet')"
        )
    out = {}
    spark_best = {n: float("inf") for n in names}
    duck_best = {n: float("inf") for n in names}
    for _ in range(3):
        for n in names:
            df = qs[n](spark, PROBE_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            spark_best[n] = min(spark_best[n], time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(oracles[n]).fetchall()
            duck_best[n] = min(duck_best[n], time.perf_counter() - t0)
    for n in names:
        out[n] = {
            "spark_sec": round(spark_best[n], 3),
            "duckdb_sec": round(duck_best[n], 3),
            "ratio": round(spark_best[n] / max(duck_best[n], 1e-9), 2),
        }
    return out


STRUCTURAL = [
    # the persistent >2x-at-sf0.1 rows (single-node scan-agg floors /
    # deliberate exchange-free plans) + q4, whose 10x ratio was the only
    # one creeping in the round-9 record — the round-9 verdict's item 3:
    # prove growth stays <= linear at 30-50x, the last unproven span
    # between "sub-linear at 10x" and the 100x claim
    "a1_pricing_summary",
    "dedup_exact",
    "j7_star_join_rollup",
    "sim_bruteforce_topk",
    "q4_report_card",
]


def fullsuite_probe(spark, names=None) -> dict:
    """The ENTIRE headline suite at the probe scale (sf≈1 at SCALE=10),
    Spark vs DuckDB executing the SAME oracle SQL on the SAME probe
    parquet, best-of-3 interleaved in one process (the round-4 verdict's
    top-next item: the crossover record covered only 4 queries; this
    answers the per-query 2× question at sf1 for all of them).
    ``dedup_minhash_lsh`` has no SQL oracle — Spark timing only.
    ``names`` narrows the suite (the ``structural`` mode runs just the
    floor-bound rows at SCALE=30-50)."""
    import duckdb

    from bench import HEADLINE
    from procoggraph_spark.queries import registry as _registry
    from procoggraph_spark.session import apply_adaptive_policy

    names = list(names or HEADLINE)
    apply_adaptive_policy(spark, PROBE_DIR)
    qs, oracles = _registry()
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for tbl in ("lineitem", "orders", "part", "customer", "nation", "region",
                "supplier", "documents", "embeddings", "events"):
        loc = os.path.join(PROBE_DIR, f"{tbl}.parquet")
        if os.path.isdir(loc):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{loc}/*.parquet')"
            )
    # warmup both engines once per query
    for n in names:
        qs[n](spark, PROBE_DIR).write.format("noop").mode("overwrite").save()
        if n in oracles:
            con.execute(oracles[n]).fetchall()
    spark_best = {n: float("inf") for n in names}
    duck_best = {n: float("inf") for n in names}
    for _ in range(3):
        for n in names:
            df = qs[n](spark, PROBE_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            spark_best[n] = min(spark_best[n], time.perf_counter() - t0)
            if n in oracles:
                t0 = time.perf_counter()
                con.execute(oracles[n]).fetchall()
                duck_best[n] = min(duck_best[n], time.perf_counter() - t0)
    out = {}
    for n in names:
        row = {"spark_sec": round(spark_best[n], 3)}
        if n in oracles:
            row["duckdb_sec"] = round(duck_best[n], 3)
            row["ratio"] = round(spark_best[n] / max(duck_best[n], 1e-9), 2)
        out[n] = row
    return out


def main() -> None:
    import sys

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("scale_probe")
    if not os.path.isdir(os.path.join(PROBE_DIR, "lineitem.parquet")):
        t0 = time.perf_counter()
        generate(spark)
        print(f"generated {SCALE}x probe tables in {time.perf_counter()-t0:.1f}s")
    if not os.path.isdir(os.path.join(PROBE_DIR, "events.parquet")):
        generate_events(spark)
    # backfill guard: probe dirs created by earlier rounds have lineitem
    # (so generate() is skipped) but may predate these tables
    if not os.path.isdir(os.path.join(PROBE_DIR, "supplier.parquet")) or not os.path.isdir(
        os.path.join(PROBE_DIR, "documents.parquet")
    ):
        generate_docs_supplier(spark)
    if not os.path.isdir(os.path.join(PROBE_DIR, "embeddings.parquet")):
        generate_embeddings(spark)
    # backfill guard: round-7 added p_type/p_size to the probe part
    # table (u7_cofactor_priority); regenerate a stale copy in place
    part_loc = os.path.join(PROBE_DIR, "part.parquet")
    if os.path.isdir(part_loc) and "p_type" not in spark.read.parquet(part_loc).columns:
        probe_part(spark).write.mode("overwrite").parquet(part_loc)

    if mode == "fullsuite":
        print(json.dumps({"fullsuite_vs_duckdb": fullsuite_probe(spark), "xdata": SCALE}))
        spark.stop()
        return

    if mode == "structural":
        # round-9 verdict item 3: the floor-bound rows at SCALE=30-50
        # (set SPARK_GRAFT_PROBE_SCALE / SPARK_GRAFT_PROBE_DIR), vs
        # DuckDB on the same probe parquet, interleaved best-of-3
        print(json.dumps({
            "structural_vs_duckdb": fullsuite_probe(spark, names=STRUCTURAL),
            "xdata": SCALE,
            "loadavg": os.getloadavg()[0],
        }))
        spark.stop()
        return

    qs, _ = registry()
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for sf_dir, label in [("/root/testdata/sf0.1", "sf0.1"), (PROBE_DIR, f"sf0.1x{SCALE}")]:
        timings = {}
        for name in RELATIONAL:
            best = float("inf")
            for _ in range(2):
                df = qs[name](spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        out[label] = timings
    ratios = {
        k: round(out[f"sf0.1x{SCALE}"][k] / max(out["sf0.1"][k], 1e-9), 1)
        for k in RELATIONAL
    }
    llm = llmops_probe(spark)
    analytics = analytics_probe(spark)
    crossover = crossover_probe(spark)
    print(
        json.dumps(
            {
                "timings": out,
                "xdata_time_ratio": ratios,
                "xdata": SCALE,
                "llmops": llm,
                "analytics_events": analytics,
                "crossover_vs_duckdb": crossover,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
