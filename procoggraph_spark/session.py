"""SparkSession factory tuned for both the local test harness and the
100 TB posture.

Local mode is a single JVM; the knobs that matter there are shuffle
partition count (match cores, not the 200 default) and AQE. The same
builder is correct on a real cluster: AQE re-plans partition counts and
skew joins at runtime, so the static settings are starting points, not
load-bearing constants.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "procoggraph_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE + coalesce + skew-join are on so runtime statistics fix partition
    sizing at any scale factor; Arrow is on for the Pandas-UDF operators;
    session timezone is pinned to UTC so timestamp semantics match the
    DuckDB oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # managed-table home for the bucketed node/edge layout
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/procoggraph_warehouse"),
        )
        # 128 MB parquet split targets keep partitions executor-memory-sized
        # at large SF while still parallelizing small local runs.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # collect_set/collect_list aggregations: this engine's layout
        # discipline buckets AND sorts fact tables on their group key,
        # so sort-based aggregation streams each group with O(1) state
        # and no hash map — measured ~2x on the set-heavy report-card
        # query at two scales. Workloads aggregating unsorted streams
        # can flip it back via SPARK_GRAFT_CONF.
        .config("spark.sql.execution.useObjectHashAggregateExec", "false")
        # Long-lived sessions (the driver runs dozens of queries in one)
        # degrade set-heavy aggregations 2-5x as dereferenced shuffle /
        # broadcast state accumulates: the ContextCleaner only reclaims
        # it after a driver GC, and an idle 16 GB heap can go 30+ min
        # (the default periodicGC interval) without one. Force the cycle
        # every 2 min; overridable via SPARK_GRAFT_CONF.
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    if master.startswith("local"):
        # single-JVM shuffle never crosses a network and its files sit in
        # page cache; LZ4 encode/decode is pure CPU overhead there (~10%
        # on sort/window-heavy plans). Cluster deployments keep the
        # defaults — compression pays for itself as soon as blocks move.
        builder = builder.config("spark.shuffle.compress", "false").config(
            "spark.shuffle.spill.compress", "false"
        )
    # runtime tuning without code edits: SPARK_GRAFT_CONF="k=v;k2=v2"
    # (deploy-site overrides — executor sizing, compression codec, AQE
    # advisory sizes); explicit extra_conf still wins.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in filter(None, (p.strip() for p in env_conf.split(";"))):
        k, _, v = pair.partition("=")
        if k and v:
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_adaptive_policy(
    spark: SparkSession, sf_dir: str, *, threshold_bytes: int = 1 << 30
) -> bool:
    """Size-gated AQE: adaptive execution pays for itself by re-planning
    shuffles from runtime statistics, but on sub-GB interactive inputs
    its per-query re-optimization rounds cost more than they save
    (measured: 30-40% of wall-clock on the sub-0.3 s dashboard queries,
    a1 0.25→0.16 s at sf0.1). Below ``threshold_bytes`` of total input
    under ``sf_dir``, turn AQE off for the session; at or above it —
    and always on a real cluster, where skew-join and partition
    coalescing are load-bearing — leave it on. Returns the resulting
    AQE state. The decision is by DATA SIZE, not a bench flag, so the
    same session serves sf0.01 interactively and sf1+ adaptively.

    Below the gate the policy also applies AQE's partition-coalescing
    rule STATICALLY: a shuffle moving a few MB does not need one task
    per core — launching 32 tasks per exchange costs more scheduling
    than the work they carry (measured at sf0.1, best-of-3 interleaved:
    full 12-query suite 3.47→3.08 s at 8 partitions; the floor-bound
    a1/p6/stream_session each ~0.24→~0.15 s). One shuffle partition per
    ~2 MB of input, clamped to [4, cores]; at/above the gate the static
    count returns to cores and AQE coalesces from runtime statistics
    instead."""
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
    except OSError:
        total = threshold_bytes  # unknown input: keep AQE on
    enabled = total >= threshold_bytes
    spark.conf.set("spark.sql.adaptive.enabled", "true" if enabled else "false")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    base = int(cpus) if cpus.isdigit() else 32
    if enabled:
        spark.conf.set("spark.sql.shuffle.partitions", str(base))
    else:
        target = max(4, min(base, total // (2 << 20)))
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
    return enabled


def register_sql_functions(spark: SparkSession) -> None:
    """Register the engine's custom kernels as SQL functions so the
    ``spark.sql`` surface is self-contained (SURVEY §4: parity_score,
    canonical_smiles, ec_range_compress, inscode_sort — ad-hoc SQL
    replaces ad-hoc Cypher, §3.3). These are the legitimately-Python
    kernels; relational logic stays in built-ins."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from procoggraph_spark.functions import chem

    spark.udf.register("canonical_smiles", chem.canonical_smiles)
    spark.udf.register("molecular_descriptors", chem.molecular_descriptors)

    @F.pandas_udf(T.DoubleType())
    def parity_score(a, b):
        import pandas as pd

        out = chem.score_pairs_batch(
            pd.DataFrame({"pdb_smiles": a, "cognate_smiles": b})
        )
        return out["score"]

    spark.udf.register("parity_score", parity_score)

    def _ec_range_compress(nums):
        if not nums:
            return ""
        vals = sorted(set(nums))
        segs, lo = [], vals[0]
        prev = lo
        for v in vals[1:]:
            if v != prev + 1:
                segs.append((lo, prev))
                lo = v
            prev = v
        segs.append((lo, prev))
        return ",".join(str(a) if a == b else f"{a}-{b}" for a, b in segs)

    spark.udf.register("ec_range_compress", _ec_range_compress, T.StringType())

    def _inscode_sort(tokens):
        import re

        def k(tok):
            m = re.match(r"^(\d+)_*(\D*)", tok)
            return (int(m.group(1)) if m and m.group(1) else 0,
                    m.group(2) if m else "", tok)

        return "|".join(sorted(tokens or [], key=k))

    spark.udf.register("inscode_sort", _inscode_sort, T.StringType())


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, *, register_views: bool = True):
    """Load the driver's star-schema parquet tables; optionally register
    each as a temp view so ``spark.sql`` is a full query surface
    (SURVEY §3.3: arbitrary SQL replaces arbitrary Cypher).
    """
    from procoggraph_spark.queries.common import t

    dfs = {}
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = t(spark, sf_dir, name)
            dfs[name] = df
            if register_views:
                df.createOrReplaceTempView(name)
    return dfs
