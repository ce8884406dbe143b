"""Temporal joins Spark lacks as primitives: as-of join and
interval-containment range join, built as compositions of existing
DataFrame ops (the (a)-tier strategy — no UDFs, no cross products).

As-of: the classic union-merge formulation — tag both sides, sort by
(key, ts, side), carry the right side's payload forward with
``last_value(ignorenulls)``; one shuffle on the key, no point-wise
probing. This is how kdb/QuestDB-style asof semantics map onto a
shuffle engine.

Range join: bucketize. Each interval is exploded into the fixed-width
buckets it covers, probes equi-join on (key, bucket), and an exact
predicate refines. Work scales with events + interval-spans/bucket, not
events × intervals — the survival property a naive theta-join lacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from procoggraph_spark.functions.timeutil import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row: the most recent right row with
    ``right.ts <= left.ts`` on the same key (ties: right wins —
    standard asof ``<=`` semantics). NULL value columns when no prior
    right row exists (or it is older than ``tolerance_seconds``).

    Output: all left columns + the right value columns.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lt = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).cast("timestamp").alias("_r_ts"),
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "_l",
        "_ts",
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_c_ts"),
    ).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            epoch_seconds(F.col("_ts")) - epoch_seconds(F.col("_c_ts"))
        ) <= tolerance_seconds
        carried = carried.select(
            "_l",
            *[
                F.when(in_tol, F.col(f"_c_{c}")).alias(f"_c_{c}")
                for c in value_cols
            ],
        )
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_c_{c}").alias(f"right_{c}") for c in value_cols],
    )


def range_join_intervals(
    events: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """events ⋈ intervals where ``start <= ts <= end`` on a shared key,
    via bucket-equi-join + exact refine. ``bucket_seconds`` trades
    replication (long intervals → more buckets) against probe fan-in;
    pick it near the median interval length."""
    ev = events.withColumn(
        "_bucket", F.floor(epoch_seconds(F.col(ts_col)) / bucket_seconds)
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(F.col(start_col)) / bucket_seconds),
                F.floor(epoch_seconds(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    joined = ev.join(iv, [on, "_bucket"], how).filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")
