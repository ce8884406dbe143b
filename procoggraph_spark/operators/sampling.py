"""Dataset splitting, stratified sampling, and sequence packing — the
assignment operators a training-data pipeline runs after curation.

Design rules as elsewhere: pure column algebra (codegen'd, no UDFs), and
every assignment is a deterministic function of the row's key — rerun-
and partitioning-stable, and reproducible in any engine's SQL (the
multiplicative hash is plain 64-bit integer arithmetic, unlike
xxhash64, so the DuckDB oracle computes the identical buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constant;
# bucket = (((x mod 2^31) * A) mod 2^32) mod buckets
# The mod-2^31 pre-reduction keeps the multiply under 2^63 (ANSI-safe:
# (2^31-1) * A ≈ 5.7e18 < Long.MAX) without changing buckets for ids
# below 2^31 — and makes the formula portable 64-bit integer arithmetic
# any SQL engine reproduces exactly.
_A = 2654435761
_M = 4294967296
_R = 2147483648


def hash_bucket(id_col: Column, *, buckets: int = 100) -> Column:
    """Deterministic pseudo-random bucket in [0, buckets) from an
    integer id — integer-exact, so identical in Spark and any SQL
    engine (no engine-specific hash), and overflow-free under ANSI."""
    reduced = F.pmod(id_col.cast("long"), F.lit(_R))
    return F.pmod(F.pmod(reduced * _A, F.lit(_M)), F.lit(buckets))


def deterministic_split(
    df: DataFrame,
    *,
    id_col: str,
    fractions: dict[str, float],
    label_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given fractions (must
    sum to ≤ 1; remainder falls into the last split). The assignment is
    a pure function of the id: stable across reruns, cluster layouts,
    and engines — the property a training pipeline needs so that a
    re-ingest never leaks val/test rows into train.
    """
    b = hash_bucket(F.col(id_col))
    cuts = []
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac * 100
        cuts.append((name, acc))
    # forward-ordered when-chain: the FIRST matching cut wins
    out: Column | None = None
    for name, hi in cuts:
        cond = b < hi
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    out = out.otherwise(F.lit(cuts[-1][0]))
    return df.withColumn(label_col, out)


def stratified_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    fraction: float,
) -> DataFrame:
    """Keep ≈``fraction`` of every stratum, deterministically: the
    hash-bucket filter applies within each stratum independently, so no
    stratum is over/under-sampled by clustering of ids. (A deterministic
    `sampleBy` — same contract, reproducible across engines.)"""
    # pre-reduce the stratum hash before mixing with the id so the sum
    # stays far from the long range (ANSI overflow discipline)
    strata_h = F.pmod(F.xxhash64(F.col(strata_col)), F.lit(_R))
    b = hash_bucket(strata_h + F.pmod(F.col(id_col).cast("long"), F.lit(_R)))
    return df.filter(b < fraction * 100)


def weighted_mix(
    df: DataFrame,
    *,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    granularity: int = 1_000_000,
) -> DataFrame:
    """Rebalance a multi-source corpus to target mixture ``weights``
    (summing to 1) by deterministic downsampling: the largest total mix
    that every source can supply is ``min_s(n_s / w_s)`` rows; each
    source keeps ``scale * w_s / n_s`` of its rows via the portable
    hash-bucket filter. Fully declarative — the per-source counts are a
    tiny aggregate broadcast back, never a driver collect.

    Sources missing from ``weights`` are dropped (weight 0).
    """
    w_expr = None
    for name, w in weights.items():
        cond = F.col(source_col) == name
        w_expr = F.when(cond, F.lit(float(w))) if w_expr is None else w_expr.when(
            cond, F.lit(float(w))
        )
    w_expr = w_expr.otherwise(F.lit(0.0))

    counts = (
        df.withColumn("_w", w_expr)
        .filter(F.col("_w") > 0)
        .groupBy(source_col, "_w")
        .agg(F.count("*").alias("_n"))
    )
    # the binding-source scale factor rides an unpartitioned window
    # over the bounded per-source rows, NOT counts.agg + crossJoin —
    # the broadcast-subquery form re-ran the corpus scan+agg a second
    # time per execution
    frac = counts.withColumn(
        "_scale",
        F.min(F.col("_n") / F.col("_w")).over(Window.partitionBy()),
    ).select(
        source_col,
        (F.col("_scale") * F.col("_w") / F.col("_n")).alias("_keep_frac"),
    )
    b = hash_bucket(
        F.pmod(portable_string_salt(F.col(source_col)), F.lit(_R))
        + F.pmod(F.col(id_col).cast("long"), F.lit(_R)),
        buckets=granularity,
    )
    return (
        df.join(F.broadcast(frac), source_col)
        .filter(b < F.col("_keep_frac") * granularity)
        .drop("_keep_frac")
    )


def portable_string_salt(col: Column) -> Column:
    """Small deterministic salt from a string, using only length/ascii/
    substr — reproducible in any SQL engine (unlike xxhash64). Diversity
    is all a sampling salt needs; this is NOT a general-purpose hash."""
    return (
        (F.length(col) * 131 + F.ascii(F.substring(col, 1, 1))) * 1009
        + F.ascii(F.substring(col, -1, 1))
    ).cast("long")


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    budget: int,
    partition_cols: list[str],
    bin_col: str = "bin_id",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget training
    bins. Within each partition group (e.g. source shard), documents are
    taken in ``order_cols`` order (default ``[id_col]``) and a document
    starts in the bin where its running token total begins:
    ``bin = (cumsum - n) // budget``.

    ``order_cols`` must be a TOTAL order over the rows that matter: if
    ids can repeat (a replayed feed), pass enough payload columns that
    rows sharing the full sort key are interchangeable — otherwise the
    packing is nondeterministic exactly at the duplicates (dirty-keys
    fuzz finding). The comparator short-circuits on the id, so a heavy
    tiebreak column costs nothing on unique ids.

    One window per partition group — a single shuffle on
    ``partition_cols``; each group's packing is an independent stream,
    which is exactly how a sharded packer runs at 100 TB (shard first,
    pack within shard). Integer arithmetic end-to-end → engine-exact.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c) for c in (order_cols or [id_col])])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        bin_col,
        ((cum - F.col(token_col)) / F.lit(budget)).cast("long"),
    )


def exact_k_per_group(
    df: DataFrame,
    *,
    id_col: str,
    group_col: str,
    k: int,
) -> DataFrame:
    """Deterministic exactly-k sample per group (fraction-based
    `stratified_sample` can't promise a count; eval-subset building
    needs one). Rows are ranked inside each group by their fine-grained
    portable hash bucket (1e6 buckets — pseudo-random order) with the
    id as tiebreak, keeping the first ``k``. One shuffle on the group
    key; the pick is a pure function of (group, id), so reruns,
    repartitions, and re-ingests select the identical rows — and any
    SQL engine reproduces it."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), buckets=1_000_000), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def corpus_shuffle(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int = 8,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic training-order shuffle: a seeded pseudo-random
    permutation of the corpus, materialized as (shard, position-within-
    shard) — the layout a trainer consumes (read shards in parallel,
    stream each in position order; different ``seed`` → different
    epoch order). The permutation key is the portable multiplicative
    hash of (id + seed), so the order is a pure function of the id:
    rerun-, partitioning-, and engine-stable (reproducible epochs), and
    the DuckDB oracle replays it with plain integer arithmetic.

    Scale shape: one shuffle on the shard key, then a per-shard sort —
    ``n_shards`` is the parallelism/memory unit and must scale with the
    corpus exactly like output-file counts do (100 TB at 1e4 shards →
    ~10 GB sorted per shard task; never run a corpus-sized single-shard
    sort). Hash-sharding makes shard sizes near-uniform, so the sort
    stage is skew-free by construction."""
    # A bare multiplicative hash is NOT enough here: A = 2654435761 is
    # congruent 1 mod 16, so its low bits pass the input straight
    # through and `h % n_shards` degenerates to round-robin on the raw
    # id (seed-invariant co-residence, id stride leaks into shards).
    # Finalize with two xorshift rounds (multiply -> xor-fold the high
    # bits down -> multiply again) so every output bit depends on every
    # input bit — the same structure as the xxhash/murmur finalizers,
    # expressed in portable integer arithmetic (xor + integer division
    # replicate exactly in any SQL engine; shifts stay mod-2^31/2^32 so
    # ANSI 64-bit multiply never overflows). shard = low bits, order =
    # the remaining bits of the SAME mixed value — both avalanche-mixed.
    r = F.pmod(F.col(id_col).cast("long") + F.lit(seed), F.lit(_R))
    a = F.pmod(r * _A, F.lit(_M))
    b = a.bitwiseXOR((a / F.lit(65536)).cast("long"))
    c = F.pmod(b, F.lit(_R))
    d = F.pmod(c * F.lit(2246822519), F.lit(_M))
    h = F.pmod(d.bitwiseXOR((d / F.lit(8192)).cast("long")), F.lit(_R))
    out = df.withColumn(shard_col, F.pmod(h, F.lit(n_shards))).withColumn(
        "_ord", (h / F.lit(n_shards)).cast("long")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_ord"), F.col(id_col))
    return (
        out.withColumn(pos_col, F.row_number().over(w) - F.lit(1))
        .drop("_ord")
    )


def leakage_safe_split(
    df: DataFrame,
    *,
    id_col: str,
    key_cols: list[str],
    fractions: dict[str, float],
    label_col: str = "split",
    canonical_col: str = "canonical_id",
) -> DataFrame:
    """Dedup-aware dataset split: every row is assigned the split of its
    duplicate group's canonical row (min ``id_col`` per ``key_cols``
    group), so exact duplicates can never straddle train and test — the
    leakage mode a per-row hash split cannot prevent (two copies of one
    document hash to different splits and the test set scores memorized
    training text). Near-dup groups work the same way by passing a
    cluster id as the key.

    Scale shape: one hash aggregation on the dedup key (map-side
    combine) plus one equi-join back on the same key — AQE-skew-
    splittable, no window over an unbounded duplicate group (the viral
    copy-pasted document is exactly the case this operator exists for).
    The split itself stays `deterministic_split`'s portable integer
    hash of the canonical id: rerun-, partitioning-, and engine-stable.

    NULL dedup keys group together (null-safe join): rows with a
    missing key are still assigned a split — a plain equi-join would
    silently drop them, violating the every-row contract.
    """
    import functools

    canon = df.groupBy(*key_cols).agg(F.min(id_col).alias(canonical_col))
    cond = functools.reduce(
        lambda a, b: a & b, [df[k].eqNullSafe(canon[k]) for k in key_cols]
    )
    joined = df.join(canon, cond)
    for k in key_cols:
        joined = joined.drop(canon[k])
    return deterministic_split(
        joined, id_col=canonical_col, fractions=fractions, label_col=label_col
    )


def temperature_mix(
    df: DataFrame,
    *,
    source_col: str = "source",
    weight_col: str = "n_chars",
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source mixing (τ = 0.5): each source's token
    allocation is proportional to sqrt(its token mass), the standard
    multilingual/multi-domain rebalancing that upsamples small sources
    without letting the head domain drown the mixture (τ=1 is natural
    sampling, τ=0 is uniform; sqrt is the common middle).

    Portability discipline: the temperature weight is floor(sqrt(tokens))
    — sqrt is IEEE-correctly-rounded (unlike pow/ln), and flooring to an
    integer makes the weight SUM exact across engines and partition
    orders, so shares and allocations are bit-reproducible in any SQL
    engine. Scale shape: one hash agg to source grain (map-side
    combine), then a single-row total broadcast-joined back — source
    cardinality is bounded (domains, not documents), never a window over
    rows.
    """
    per = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(weight_col).cast("long").alias("n_tokens"),
    )
    per = per.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens"))).cast("long")
    )
    tot = per.agg(F.sum("weight").cast("long").alias("_tw"))
    share = F.col("weight").cast("double") / F.col("_tw").cast("double")
    return (
        per.join(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            "weight",
            F.round(share, 6).alias("temp_share"),
            F.floor(share * F.lit(float(budget))).cast("long").alias(
                "alloc_tokens"
            ),
            F.round(
                F.floor(share * F.lit(float(budget)))
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("upsample_factor"),
        )
    )


def weighted_priority_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int = 100,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirtakis priority sampling): each row gets priority
    ln(u)/w for a pseudo-uniform u derived from its id and weight
    w ≥ 1; the k largest priorities are exactly a weight-proportional
    sample without replacement. Replaces rand()-based sampling where a
    training pipeline needs the sample to be rerun- and engine-stable
    (data-card reproducibility, A/B-identical corpora).

    u comes from the portable multiplicative hash (integer-exact in any
    engine), the division and ln are deterministic IEEE doubles, and the
    priority is rounded to the 1e-6 grid BEFORE the cut with id
    tie-break — the same cross-engine near-tie discipline as the ANN
    rerank paths. Scale shape: scan + global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort).
    """
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    hv = F.pmod(F.pmod(F.col(id_col).cast("long"), F.lit(_R)) * _A, F.lit(_M))
    u = (hv.cast("double") + F.lit(1.0)) / F.lit(float(_M) + 2.0)
    pri = F.round(F.log(u) / w, 6)
    # cut FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps of size k, no global sort), then rank only the k survivors —
    # the single-partition window runs over k rows, never the corpus
    top = (
        df.withColumn("priority", pri)
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(k)
    )
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("priority"), F.asc(id_col))),
    )


def curriculum_order(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 5,
    k: int = 200,
) -> DataFrame:
    """Curriculum ordering: quality-banded schedule with a deterministic
    shuffle inside each band — highest-quality band first (the common
    "clean data late↔early" curriculum knob), order within a band given
    by the portable multiplicative hash so the schedule is reproducible
    in any engine and stable across reruns/partitionings.

    Scale shape: the band + shuffle key are scan-side column algebra;
    the global cut is ``TakeOrderedAndProject`` (per-partition top-k
    heaps merged on the driver — no global sort), and the rank window
    runs over the already-cut k rows only.
    """
    from procoggraph_spark.operators.text import quality_score

    qs = quality_score(F.col(text_col))
    band = F.least(
        F.floor(qs * F.lit(float(bands))).cast("long"), F.lit(bands - 1)
    )
    salt = ((F.col(id_col) % _R) * _A) % _M
    cut = (
        df.select(
            F.col(id_col),
            band.alias("band"),
            salt.alias("shuffle_key"),
        )
        .orderBy(F.desc("band"), F.asc("shuffle_key"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("band"), F.asc("shuffle_key"), F.asc(id_col))
    return cut.withColumn("rank", F.row_number().over(w))


def epoch_repeat_plan(
    df: DataFrame,
    *,
    source_col: str = "source",
    weight_col: str = "n_chars",
    budget: int = 5_000_000,
    max_epochs: int = 4,
) -> DataFrame:
    """Data-constrained epoch planning (Muennighoff et al. 2023 shape):
    give each source a sqrt-temperature token allocation from ``budget``,
    then cap repetition at ``max_epochs`` passes over the source's
    unique tokens — emitting how many tokens will actually be served,
    how many epochs that is, and the allocation that cannot be served
    without exceeding the repeat cap (the signal to re-balance or crawl
    more).

    Portability: integer sqrt-floor weights (exact share denominators),
    floor allocations, and integer served/excess — the only doubles are
    the rounded epoch ratios. Scale shape: identical to
    ``temperature_mix`` (one hash agg to source grain + broadcast
    1-row total), bounded by source cardinality.
    """
    per = df.groupBy(source_col).agg(
        F.sum(weight_col).cast("long").alias("n_tokens"),
    )
    per = per.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens"))).cast("long")
    )
    tot = per.agg(F.sum("weight").cast("long").alias("_tw"))
    share = F.col("weight").cast("double") / F.col("_tw").cast("double")
    alloc = F.floor(share * F.lit(float(budget))).cast("long")
    cap = F.lit(max_epochs) * F.col("n_tokens")
    # an all-empty source (zero token mass) would otherwise divide by
    # zero into NaN/inf — clamp the denominator; its alloc is 0 anyway
    denom = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    return (
        per.join(F.broadcast(tot))
        .select(
            source_col,
            "n_tokens",
            "weight",
            alloc.alias("alloc_tokens"),
            F.round(alloc / denom, 6).alias(
                "epochs_wanted"
            ),
            F.round(
                F.least(alloc, cap) / denom, 6
            ).alias("epochs_served"),
            F.least(alloc, cap).alias("served_tokens"),
            F.greatest(alloc - cap, F.lit(0)).alias("excess_tokens"),
        )
    )
