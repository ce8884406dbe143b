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
    Scale shape: one hash agg to category grain + a broadcast 1-row
    global aggregate — never a per-row window.
    """
    per = df.groupBy(category_col).agg(
        F.count("*").alias("n"),
        (F.sum(cents(F.col(target_col), 2)) / 100.0).alias("_s"),
    )
    g = df.agg(
        (F.sum(cents(F.col(target_col), 2)) / 100.0).alias("_gs"),
        F.count("*").alias("_gn"),
    )
    gmean = F.col("_gs") / F.col("_gn")
    return per.join(F.broadcast(g)).select(
        category_col,
        F.col("n").cast("long").alias(f"n_{category_col}"),
        F.round(F.col("_s") / F.col("n"), 6).alias("cat_mean"),
        F.round(
            (F.col("_s") + F.lit(smoothing) * gmean)
            / (F.col("n") + F.lit(smoothing)),
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
