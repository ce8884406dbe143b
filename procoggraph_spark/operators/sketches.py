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

from pyspark.sql import Column, DataFrame, Window
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


def cms_build_counts(
    df: DataFrame,
    key_col: str,
    count_col: str,
    *,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """`cms_build` from pre-aggregated ``(key, count)`` rows: each cell
    sums the counts of the keys hashing into it, which is exactly the
    COUNT over the expanded multiset — the sketch is bit-identical to
    ``cms_build`` over the raw stream. Use when a consumer already
    materializes the key-grain frequency table (e.g. the heavy-hitters
    query, whose probe side needs every distinct key anyway): the
    explode fans out ``depth×`` the VOCABULARY, not the corpus."""
    h = positional_fingerprint(F.col(key_col))
    cells = df.select(
        F.col(count_col).alias("_c"),
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
    )
    return cells.groupBy(
        F.col("c.row_id").alias("row_id"), F.col("c.bucket").alias("bucket")
    ).agg(F.sum("_c").alias("cnt"))


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


def histogram_quantiles(
    df,
    *,
    value_col: str,
    bins: int = 64,
    quantiles: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
):
    """Histogram-based quantile sketch: equi-width bin counts between
    the observed min/max (bounded ``bins``-row state, cell-wise
    mergeable across partitions/streams exactly like the CMS count
    table), answered by walking the cumulative histogram — the
    quantile tier of the sketch family next to CMS (frequency), Bloom
    (membership) and HLL (cardinality). Error is bounded by one bin
    width ((max-min)/bins), pinned by pytest against the exact
    quantile.

    Estimate = right edge of the first bin whose cumulative count
    reaches ceil(q * n) — pure integer/double arithmetic an oracle can
    replay bit-for-bit (no engine interpolation semantics). The
    cumulative window runs over the bounded histogram only; the
    min/max row broadcasts back to the scan."""
    from pyspark.sql import Window

    mm = df.agg(
        F.min(value_col).cast("double").alias("_mn"),
        F.max(value_col).cast("double").alias("_mx"),
        F.count(value_col).alias("_n"),
    )
    binned = (
        df.select(F.col(value_col).cast("double").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .crossJoin(F.broadcast(mm))
        .select(
            # degenerate range (all values equal) -> single bin 0
            F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.floor((F.col("_v") - F.col("_mn"))
                            / ((F.col("_mx") - F.col("_mn")) / float(bins))),
                    F.lit(bins - 1),
                )
            ).cast("long").alias("bin"),
            "_mn", "_mx", "_n",
        )
        .groupBy("bin", "_mn", "_mx", "_n")
        .agg(F.count("*").alias("cnt"))
    )
    cum = binned.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spark = df.sparkSession
    grid = spark.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    hit = (
        grid.join(
            F.broadcast(cum), cum.cum >= F.ceil(grid.q * cum._n), "left"
        )
        .groupBy("q")
        .agg(
            F.min("bin").alias("bin"),
            F.first("_mn").alias("_mn"),
            F.first("_mx").alias("_mx"),
        )
    )
    # est stays an UNROUNDED double: both engines derive it with the
    # identical op sequence on identical doubles (bit-exact), while
    # ROUND(x, 6) at a decimal half-boundary is engine-specific
    # (HALF_UP on the decimal repr vs round-half-away on the binary).
    return hit.select(
        "q",
        (
            F.col("_mn")
            + (F.col("bin") + 1)
            * ((F.col("_mx") - F.col("_mn")) / float(bins))
        ).alias("est"),
    ).orderBy("q")


def psi_drift(
    df,
    *,
    value_col: str,
    snapshot_col,
    step: int = 100,
    n_buckets: int = 10,
):
    """Population stability index between two corpus snapshots: bucket
    a feature into a bounded fixed-width histogram (floor(v/step)
    capped at n_buckets), compare the two snapshots' bucket
    distributions with add-one smoothing (so empty buckets stay
    finite and the arithmetic is engine-portable), and report each
    bucket's PSI contribution plus the shares. Sum of psi_contrib is
    the headline PSI (<0.1 stable / 0.1-0.25 drifting / >0.25 shifted
    by the usual credit-scoring convention).

    One scan + one bounded (bucket, snapshot) agg; the snapshot totals
    broadcast back. The feature-distribution twin of the
    embedding-centroid drift monitor."""
    b = (
        df.select(
            F.least(F.floor(F.col(value_col) / step), F.lit(n_buckets))
            .cast("long").alias("bucket"),
            snapshot_col.alias("_snap"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_snap") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("_snap") != 0, 1).otherwise(0)).alias("n_b"),
        )
    )
    # snapshot totals via an unpartitioned window over the bounded
    # bucket rows, NOT b.agg + crossJoin: the broadcast-subquery form
    # re-ran the corpus scan+aggregation a second time per execution —
    # one scan, not two
    wall = Window.partitionBy()
    p_a = (F.col("n_a") + 1) / (F.col("_ta") + F.col("_k")).cast("double")
    p_b = (F.col("n_b") + 1) / (F.col("_tb") + F.col("_k")).cast("double")
    return (
        b.withColumn("_ta", F.sum("n_a").over(wall))
        .withColumn("_tb", F.sum("n_b").over(wall))
        .withColumn("_k", F.count(F.lit(1)).over(wall))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round(p_a, 6).alias("share_a"),
            F.round(p_b, 6).alias("share_b"),
            F.round((p_a - p_b) * F.log(p_a / p_b), 6).alias("psi_contrib"),
        )
        .orderBy("bucket")
    )
