"""Data-layout operators: Z-order (Morton) clustering keys for
multi-dimensional write layout.

Why this is a first-class 100 TB operator: parquet scan pruning works
off per-file/per-row-group min-max statistics, and a table sorted on ONE
column has useless stats on every other column. Interleaving the bits of
two (or more) filter columns into a Morton key and sorting the write on
that key bounds EVERY interleaved dimension inside each file — so
point/range predicates on either column skip most files. This is the
same public technique Delta Lake's OPTIMIZE ZORDER BY and ClickHouse /
Databricks publish; here it is plain integer column algebra so any
engine reproduces the identical keys.

Everything below is overflow-safe ANSI 64-bit arithmetic (no engine
bit-intrinsics), deterministic, and shuffle-free until the caller's
write-time ``repartitionByRange``/``sortWithinPartitions`` on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, *, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns into one Z-order key: bit i of ``x`` lands at
    position 2i, bit i of ``y`` at 2i+1. Portable arithmetic —
    ``(v div 2^i) mod 2`` per bit — identical in any SQL engine."""
    xl = x.cast("long")
    yl = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        xbit = (xl / F.lit(1 << i)).cast("long") % 2
        ybit = (yl / F.lit(1 << i)).cast("long") % 2
        z = z + xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
    return z


def zorder_locality_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bits: int = 8,
    bucket_shift: int = 8,
) -> DataFrame:
    """Z-order locality audit: key every row with the Morton interleave
    of (x, y), group rows into write buckets by the key's high bits
    (``bucket = z >> bucket_shift`` — each bucket is one would-be file),
    and report per-bucket row counts and min/max bounds of BOTH
    dimensions plus the bounded tile area.

    The point of the output: with ``bits=8, bucket_shift=8`` every
    bucket's (x, y) bounds form at most a 16×16 tile (area ≤ 256) out
    of the 256×256 domain — both columns are simultaneously skippable
    from file stats, where a linear sort on x alone leaves y spanning
    its full range in every file. Scale shape: scan-side key algebra +
    one hash aggregation on the bucket; the production write is
    ``df.repartitionByRange(N, zkey).sortWithinPartitions(zkey)``.
    """
    x = F.col(x_col)
    y = F.col(y_col)
    z = zorder_key(x, y, bits=bits)
    keyed = df.select(
        (z / F.lit(1 << bucket_shift)).cast("long").alias("bucket"),
        x.cast("long").alias("_x"),
        y.cast("long").alias("_y"),
    )
    return keyed.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("_x").alias("x_min"),
        F.max("_x").alias("x_max"),
        F.min("_y").alias("y_min"),
        F.max("_y").alias("y_max"),
        (
            (F.max("_x") - F.min("_x") + 1) * (F.max("_y") - F.min("_y") + 1)
        ).alias("tile_area"),
    )
