"""Feature-engineering operators for model-ready tables: smoothed
target encoding of categoricals and percentile winsorize + min-max
scaling of numerics — the standard preprocessing a tabular training
pipeline runs next to the text/embedding curation.

Determinism discipline as everywhere: encodings derive from exact
integer/decimal sums and explicit rank-based percentiles (no engine
interpolation semantics), so any SQL engine reproduces the identical
features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from procoggraph_spark.queries.common import cents


def target_encode(
    df: DataFrame,
    *,
    category_col: str,
    target_col: str,
    smoothing: float = 10.0,
) -> DataFrame:
    """m-estimate (smoothed) target encoding: each category maps to
    ``(sum_cat + m * global_mean) / (n_cat + m)`` — the category's mean
    target pulled toward the global mean in proportion to how little
    evidence the category has. The standard high-cardinality
    categorical encoder (leaks less than the raw mean on rare
    categories).

    Exactness: sums run as long-cents (exact, partitioning-independent)
    and convert to double once, so the encoding is bit-reproducible.
    Scale shape: ONE hash agg to category grain (the category table is
    lazily localCheckpoint-ed so the source is never scanned twice —
    fault-tolerance trade documented at queries/common.py); the global
    mean is a 1-row tree-reduced aggregate over the category partials
    (integer cent sums are associative, so the re-summed global is
    bit-identical to a second full scan's aggregate), broadcast back
    onto the category rows. Target encoding is routinely applied to
    HIGH-cardinality categoricals, so no step may funnel the category
    table through one partition: an unpartitioned window would; the
    1-row aggregate reduces map-side. Never a per-row window.
    """
    per = df.groupBy(category_col).agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col(target_col), 2)).alias("_sc"),
    ).localCheckpoint(eager=False)
    tot = per.agg(
        F.sum("_sc").alias("_gsc"), F.sum("n").alias("_gn")
    )
    per = per.crossJoin(F.broadcast(tot))
    gmean = (F.col("_gsc") / 100.0) / F.col("_gn")
    s = F.col("_sc") / 100.0
    return per.select(
        category_col,
        F.col("n").cast("long").alias(f"n_{category_col}"),
        F.round(s / F.col("n"), 6).alias("cat_mean"),
        F.round(
            (s + F.lit(smoothing) * gmean) / (F.col("n") + F.lit(smoothing)),
            6,
        ).alias("encoded"),
    )


def robust_scale(
    df: DataFrame,
    *,
    id_col: str,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group winsorize + min-max scale: clip ``value_col`` to the
    group's [lo_q, hi_q] percentile band, then scale the clipped value
    to [0, 1] — the outlier-robust normalization for heavy-tailed
    numeric features (doc lengths, prices).

    Percentiles are RANK-BASED (the value at row_number
    ``ceil(q * n)`` under a total (value, id) order), not engine
    interpolation — discrete, deterministic, and identical in any SQL
    engine. Scale shape: one shuffle on the group for the rank window,
    a group-grain bounds frame broadcast back onto the scan. The
    per-group sort assumes bounded group sizes (sources/domains); at
    100 TB use percentile_approx cut points instead — same output
    contract.
    """
    d = df.select(id_col, group_col, value_col)
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    r = d.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy(group_col))
    )
    lo_rank = F.ceil(F.lit(lo_q) * F.col("_n"))
    hi_rank = F.ceil(F.lit(hi_q) * F.col("_n"))
    bounds = r.groupBy(group_col).agg(
        F.max(
            F.when(F.col("_rn") == lo_rank, F.col(value_col))
        ).cast("long").alias("lo"),
        F.max(
            F.when(F.col("_rn") == hi_rank, F.col(value_col))
        ).cast("long").alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("lo")), F.col("hi")
    )
    return d.join(F.broadcast(bounds), group_col).select(
        id_col,
        group_col,
        F.col(value_col),
        "lo",
        "hi",
        clipped.cast("long").alias("clipped"),
        F.round(
            F.when(F.col("hi") == F.col("lo"), 0.0).otherwise(
                (clipped - F.col("lo")) / (F.col("hi") - F.col("lo"))
            ),
            6,
        ).alias("scaled"),
    )


def dim_covariance_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top: int = 20,
    quant: int = 1_000_000,
) -> DataFrame:
    """Top-|covariance| off-diagonal dimension pairs of an embedding
    corpus — the redundancy audit behind "which dims carry the same
    signal" (feeds dim-pruning / Matryoshka truncation decisions).

    Exactness: components are quantized to integers (round(x * quant))
    FIRST, so the three sums the covariance needs (sum_i, sum_j,
    sum_ij) are exact 64-bit integer aggregations — no float summation
    order to disagree on across engines or partitions; the covariance
    double is then derived from those exact sums with one fixed
    expression. |q| <= ~quant and the cross product stays < 2^63 for
    corpora to ~1e6 rows at quant=1e6 (documented bound).

    Shape: per-partition integer Gram-matrix accumulation — components
    quantize JVM-side (so the rounding rule is the engine's HALF_UP,
    identical to the oracle's), then one mapInPandas pass folds each
    partition into a single d x d int64 outer-product matrix plus the
    per-dim sums and the row count, and only the d^2-row partials
    shuffle to a final merge. Integer sums are associative, so the
    merged sums are bit-identical to the posexplode self-join form the
    oracle replays (O(n * d^2 / 2) joined rows) at any partitioning.
    The partial table is lazily localCheckpoint-ed: it has three
    consumers (cross sums, dim sums, row count) and the Python stage
    must run once per execution, not three times.
    """
    # population boundary: a vector with a NaN/Inf component has no
    # integer quantization (round(NaN*quant) ANSI-crashes the cast) and
    # would poison every covariance sum it enters — excluded from the
    # population AND its size n, on both engines (oracle: FINITE_SQL).
    # Same for any component beyond the quantization domain: fp32-max
    # garbage (3.4e38) is finite and squarable but round(x*quant) still
    # overflows the long — the component band is |x| <= 9e18/quant.
    from procoggraph_spark.operators.similarity import finite_vectors

    emb = finite_vectors(emb, vec_col)
    comp_bound = 9.0e18 / quant
    emb = emb.filter(
        F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
        <= F.lit(comp_bound)
    )
    qv = emb.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * quant).cast("long"),
        ).alias("_q")
    )

    def gram_partials(batches):
        import numpy as np
        import pandas as pd

        outer = None
        dsum = None
        nrows = 0
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf["_q"].tolist(), dtype=np.int64)
            if outer is None:
                d = V.shape[1]
                outer = np.zeros((d, d), dtype=np.int64)
                dsum = np.zeros(d, dtype=np.int64)
            outer += V.T @ V
            dsum += V.sum(axis=0)
            nrows += len(V)
        if outer is None:
            yield pd.DataFrame({"i": [], "j": [], "s": []}).astype(
                {"i": "int32", "j": "int32", "s": "int64"}
            )
            return
        d = outer.shape[0]
        iu, ju = np.triu_indices(d, k=1)
        yield pd.DataFrame(
            {
                # sentinel rows: j == -1 carries the per-dim sums,
                # (-1, -1) the row count — one Python pass emits all
                # three merge-able partial kinds
                "i": np.concatenate([iu, np.arange(d), [-1]]).astype("int32"),
                "j": np.concatenate(
                    [ju, np.full(d, -1), [-1]]
                ).astype("int32"),
                "s": np.concatenate([outer[iu, ju], dsum, [nrows]]),
            }
        )

    part = (
        qv.mapInPandas(gram_partials, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .localCheckpoint(eager=False)
    )
    cross = part.filter((F.col("i") >= 0) & (F.col("j") >= 0)).select(
        "i", "j", F.col("s").alias("_sij")
    )
    si = part.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i"), F.col("s").alias("_si")
    )
    sj = si.select(F.col("i").alias("j"), F.col("_si").alias("_sj"))
    nrow = part.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("_n")
    )
    qd = float(quant)
    cov = (
        cross.join(si, "i")
        .join(sj, "j")
        .crossJoin(F.broadcast(nrow))
        .select(
            "i",
            "j",
            F.round(
                (
                    F.col("_sij").cast("double") / qd / qd
                    - (F.col("_si").cast("double") / qd)
                    * (F.col("_sj").cast("double") / qd)
                    / F.col("_n")
                )
                / F.col("_n"),
                6,
            ).alias("cov"),
        )
    )
    w = Window.orderBy(F.desc(F.abs(F.col("cov"))), F.asc("i"), F.asc("j"))
    return (
        cov.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("rank", "i", "j", "cov")
    )


def hash_bucket_audit(
    df: DataFrame,
    feature_col,
    *,
    n_buckets: int = 32,
    max_chars: int = 64,
) -> DataFrame:
    """Hashing-trick collision audit: hash a categorical feature string
    into ``n_buckets`` buckets with the portable polynomial fold
    (operators/text.rolling_hash_fingerprint) and report, per bucket,
    how many DISTINCT features landed there and how many rows they
    carry — the table that tells you whether a feature-hashing width is
    losing information before you train on it.

    Collapses to the distinct feature grain first (bounded by the
    vocabulary, not the row count), so the hash evaluates once per
    feature; row counts ride along from an exact pre-aggregation.
    Output is at the bounded bucket grain.
    """
    from procoggraph_spark.operators.text import rolling_hash_fingerprint

    feats = df.select(feature_col.alias("_f")).groupBy("_f").agg(
        F.count("*").alias("_rows")
    )
    bucketed = feats.withColumn(
        "bucket",
        (rolling_hash_fingerprint(F.col("_f"), max_chars=max_chars)
         % n_buckets).cast("long"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_features"),
            F.sum("_rows").alias("n_rows"),
            F.min("_f").alias("example_feature"),
        )
        .select(
            "bucket",
            F.col("n_features").cast("long").alias("n_features"),
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_features") > 1).alias("collided"),
            "example_feature",
        )
    )
