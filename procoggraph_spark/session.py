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
        # 128 MB parquet split targets keep partitions executor-memory-sized
        # at large SF while still parallelizing small local runs.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


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
