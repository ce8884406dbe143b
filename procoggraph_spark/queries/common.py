"""Shared helpers for the oracle-checked query surface.

Determinism discipline (the driver hash-compares Spark vs DuckDB):

- Money/measure sums go through ``DECIMAL`` so addition is exact and
  associative (double summation order differs between engines); the final
  column is cast back to DOUBLE so both engines hand pandas a float64.
- Every computed column is aliased identically in the Spark plan and the
  oracle SQL.
- Top-k queries always order by a unique tiebreak key.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


_TABLE_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table (per-table read keeps parquet column
    pruning and predicate pushdown visible in the plan). DataFrame
    handles are memoized per (session, dir, table): schema/footer
    resolution costs ~100ms per call and the driver runs dozens of
    queries against the same session.

    The driver's `events` table stores TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as long (runtime-settable legacy
    conf) and truncate to micros with exact integer division — the same
    ns→us truncation DuckDB applies, so oracles agree.
    """
    # Pin UTC at query time: the caller's session may not have it, and
    # timestamp values otherwise collect tz-shifted vs the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (id(spark), sf_dir, name)
    if key in _TABLE_MEMO:
        return _TABLE_MEMO[key]
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = spark.read.parquet(path)
    _TABLE_MEMO[key] = df
    return df


def dec2(c: Column) -> Column:
    return c.cast("decimal(18,2)")


def dec4(c: Column) -> Column:
    return c.cast("decimal(18,4)")


def dsum2(c: Column) -> Column:
    """Exact sum of a 2-decimal measure, returned as double."""
    return F.sum(dec2(c)).cast("double")


def dsum4(c: Column) -> Column:
    return F.sum(dec4(c)).cast("double")
