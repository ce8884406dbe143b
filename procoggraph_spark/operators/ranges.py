"""Run-length integer range compression (SURVEY A7).

Re-expresses the reference's `find_ec_ranges`
(`nextflow/bin/process_all_pdb_contacts.py:76-101` — ``[1,2,3,7]`` →
``"1-3,7"``) as a distributed gaps-and-islands plan: one window over
(key order by value) + two aggregations, all JVM-side.

Scale: the window and both group-bys share the same partitioning key, so
the whole operator costs a single shuffle on ``key``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compress_int_ranges(
    df: DataFrame, *, key: str, value: str, out: str = "ranges",
    pre_clustered: bool = False,
) -> DataFrame:
    """Per ``key``: compress the distinct sorted ints in ``value`` into a
    ``"lo-hi,single,..."`` string ordered by range start.

    ``pre_clustered``: the input is already hash-distributed on ``key``
    (e.g. a bucketed scan) — skip the explicit repartition and the whole
    operator runs exchange-free.
    """
    w = Window.partitionBy(key).orderBy(value)
    # one explicit shuffle on `key` (none if pre_clustered); the dedup
    # groupBy, the window, the island groupBy and the final groupBy are
    # all satisfied by it (HashPartitioning(key) clusters every
    # (key, ...) grouping)
    base = df.select(key, value)
    if not pre_clustered:
        base = base.repartition(key)
    islands = (
        base
        .groupBy(key, value)
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_g", F.col(value) - F.col("_rn"))
    )
    seg = islands.groupBy(key, "_g").agg(
        F.min(value).alias("_lo"), F.max(value).alias("_hi")
    )
    seg_str = F.when(
        F.col("_lo") == F.col("_hi"), F.col("_lo").cast("string")
    ).otherwise(
        F.concat(F.col("_lo").cast("string"), F.lit("-"), F.col("_hi").cast("string"))
    )
    return (
        seg.withColumn("_s", seg_str)
        .groupBy(key)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_lo"), F.col("_s")))),
                    lambda s: s["_s"],
                ),
                ",",
            ).alias(out)
        )
    )
