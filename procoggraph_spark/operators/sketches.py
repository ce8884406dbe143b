"""Mergeable frequency sketches for 100 TB-scale profiling.

Count-Min Sketch (CMS) as pure DataFrame algebra: the sketch is a tiny
(d rows × w buckets) count table produced by one hash aggregation, so
it map-side-combines, merges across partitions/days by plain addition
(`groupBy(row_id, bucket).sum`), and never moves per-key state to the
driver. Estimation joins probe keys against the broadcast sketch.

The bucket hash is the repo's portable-arithmetic discipline (plain
64-bit integer ops over a positional char fingerprint, no engine hash
builtin), so a DuckDB oracle can replicate the sketch bit-for-bit —
the same trick `operators/sampling` uses for split/sample buckets.

Complements the built-in sketch tier: `approx_count_distinct`
(HyperLogLog, `a3_approx_count_distinct`) and `percentile_approx`
(KLL-ish, `a5_quantile`). The reference has no sketch surface at all
(SURVEY §2.4 A3 notes the 100 TB tier); this is the beyond-reference
heavy-hitters primitive a corpus pipeline uses to find runaway
boilerplate terms without a vocabulary-sized exact aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from procoggraph_spark.operators.text import positional_fingerprint

# Per-row mixers: pairwise-independent-ish affine maps over the
# fingerprint, kept inside int64 (max h ~ 2^31 × max mult ~ 2.66e9
# ≈ 5.7e18 < 2^63-1). All constants are plain integers so the oracle
# SQL reproduces the exact bucket of every key.
_MOD = 2147483648  # 2^31
_MULT_BASE = 2654435761  # Knuth multiplicative constant
_MULT_STEP = 40503
_ADD_STEP = 1009


def _bucket(h: Column, r: int, w: int) -> Column:
    mult = F.lit(_MULT_BASE + r * _MULT_STEP)
    return ((h * mult + F.lit(r * _ADD_STEP)) % F.lit(_MOD)) % F.lit(w)


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build a Count-Min Sketch over the (multiset of) values in
    ``key_col``: returns ``(row_id, bucket, cnt)`` with one row per
    non-empty cell. One explode (depth× fan-out of the input — depth is
    4, not a blow-up) into one hash aggregation with map-side partials;
    output cardinality is ≤ depth × width regardless of input size."""
    h = positional_fingerprint(F.col(key_col))
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_id"),
                        _bucket(h, r, width).cast("long").alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.row_id").alias("row_id"), F.col("c.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Estimate the frequency of each distinct probe key: recompute the
    key's ``depth`` buckets, join the (broadcast — it is ≤ depth×width
    rows) sketch, and take the min cell count. Estimates never
    undercount; overcounts are bounded by collision mass ~N/width per
    row, minimized across rows."""
    h = positional_fingerprint(F.col(key_col))
    probe_cells = probes.select(key_col).distinct().select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row_id"),
                        _bucket(h, r, width).cast("long").alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row_id", "c.bucket")
    joined = probe_cells.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )


def bloom_build(
    df: DataFrame, key_col: str, *, n_bits: int = 4096, n_hashes: int = 3
) -> DataFrame:
    """Build a Bloom-filter membership sketch over ``key_col``: each key
    sets ``n_hashes`` bit positions (the CMS affine mixers over the
    portable positional fingerprint), and the sketch is the DISTINCT set
    of set positions — one hash aggregation, mergeable across shards by
    plain union-distinct, bounded by ``n_bits`` rows regardless of input
    size. No false negatives by construction; false-positive rate is the
    standard ``(1 - e^{-kn/m})^k``.

    Portable-arithmetic discipline as in `cms_build`: every position is
    plain 64-bit integer math, so a SQL oracle rebuilds the identical
    sketch bit-for-bit.
    """
    h = positional_fingerprint(F.col(key_col))
    pos = F.array(*[_bucket(h, r, n_bits) for r in range(n_hashes)])
    return df.select(F.explode(pos).alias("bit")).distinct()


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bits: DataFrame,
    *,
    n_bits: int = 4096,
    n_hashes: int = 3,
    flag_col: str = "bloom_hit",
) -> DataFrame:
    """Probe every row's ``key_col`` against a Bloom sketch from
    `bloom_build`: true iff ALL ``n_hashes`` positions are set (possible
    member); false is definitive (provably absent).

    Scale shape: the sketch collapses to a single broadcast map row
    (≤ ``n_bits`` entries — the bitmap, in map form for O(1)
    `element_at` lookups), so the probe is map-only on the scan: no
    shuffle of the probe side at all. This is the DataFrame spelling of
    a runtime bloom-pushdown — prune a 100 TB scan against a compact
    digest of the other side before any join.
    """
    h = positional_fingerprint(F.col(key_col))
    positions = [_bucket(h, r, n_bits) for r in range(n_hashes)]
    bitmap = bits.agg(
        F.map_from_arrays(
            F.collect_list("bit"),
            F.array_repeat(F.lit(True), F.size(F.collect_list("bit"))),
        ).alias("_bloom")
    )
    out = df.crossJoin(F.broadcast(bitmap))
    cond = F.lit(True)
    for p in positions:
        cond = cond & F.element_at(F.col("_bloom"), p).isNotNull()
    return out.withColumn(flag_col, cond).drop("_bloom")
