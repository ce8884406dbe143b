"""EC (Enzyme Commission) number operators (SURVEY J8/J9/A11).

Re-expresses the reference's EC machinery Spark-first:

- transferred-entry resolution (`utils.py:77-84` `get_terminal_record`):
  iterative broadcast self-join to fixpoint instead of a per-row pandas
  loop. EC transfer chains are short (<5 hops) and the records table is
  dimension-sized (~8k rows), so each iteration is a broadcast join.
- partial-EC expansion (`utils.py:243-256` `return_partial_EC_list`):
  `"3.2.-.-"` → every matching full EC, as a level-split equi-join on
  the class level + residual filter (never a regex cross product).
- hierarchy rollup (`utils.py:54-67`): class/subclass/subsubclass ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRANSFER_RE = r"([\d-]+\.[\d-]+\.[\d-]+\.[\d-]+)"


def resolve_transfers(ec_records: DataFrame, *, max_iter: int = 10) -> DataFrame:
    """Add a TRANSFER column: the terminal EC id reached by following
    "Transferred entry: x.y.z.w" chains (first target when multiple,
    matching the reference's `transfers[0]` choice).

    Input: (ID, DE). Output: input + TRANSFER.
    """
    base = ec_records.select(
        "ID",
        "DE",
        F.when(
            F.col("DE").startswith("Transferred entry: "),
            F.regexp_extract(F.col("DE"), _TRANSFER_RE, 1),
        ).alias("_next"),
    )
    # resolved: terminal id for every record that is itself terminal
    cur = base.select("ID", F.coalesce("_next", "ID").alias("TRANSFER"))
    hop = F.broadcast(base.select(F.col("ID").alias("_hid"), F.col("_next").alias("_hnext")))
    for _ in range(max_iter):
        nxt = (
            cur.join(hop, cur.TRANSFER == F.col("_hid"), "left")
            .select("ID", F.coalesce("_hnext", "TRANSFER").alias("TRANSFER"))
        )
        # fixpoint check on the (small) records dim — cheap count
        if nxt.exceptAll(cur).isEmpty():
            return ec_records.join(F.broadcast(nxt), "ID", "left")
        cur = nxt
    return ec_records.join(F.broadcast(cur), "ID", "left")


def ec_levels(ec: Column) -> tuple[Column, Column, Column, Column]:
    parts = F.split(ec, r"\.")
    return parts.getItem(0), parts.getItem(1), parts.getItem(2), parts.getItem(3)


def ec_hierarchy_cols(df: DataFrame, ec_col: str = "TRANSFER") -> DataFrame:
    """Attach ecClass / ecSubClass / ecSubSubClass rollup ids
    (`utils.py:54-67`): ``1.2.3.4`` → ``1.-.-.-``, ``1.2.-.-``,
    ``1.2.3.-``."""
    c1, c2, c3, _ = ec_levels(F.col(ec_col))
    return (
        df.withColumn("ecClass", F.concat(c1, F.lit(".-.-.-")))
        .withColumn("ecSubClass", F.concat(c1, F.lit("."), c2, F.lit(".-.-")))
        .withColumn("ecSubSubClass", F.concat(c1, F.lit("."), c2, F.lit("."), c3, F.lit(".-")))
    )


def expand_partial_ec(
    partials: DataFrame, universe: DataFrame, *, ec_col: str = "ec", out: str = "ec_full"
) -> DataFrame:
    """Expand partial ECs against the full EC universe.

    ``partials[ec_col]`` like "3.2.-.-" (or full "1.1.1.1"); ``universe``
    has column ``ID`` of full ECs. Full input ECs pass through ONLY if
    present in the universe for the dashed path — the reference keeps
    non-matching full ECs as themselves (`return_partial_EC_list` else
    branch returns [ec]); we mirror that: non-dashed ECs pass through
    verbatim, dashed ones expand via join.

    Output: partials + ``out`` column, one row per match (exploded).
    """
    u1, u2, u3, u4 = ec_levels(F.col("ID"))
    uni = F.broadcast(
        universe.select(
            F.col("ID").alias(out),
            u1.alias("_u1"), u2.alias("_u2"), u3.alias("_u3"), u4.alias("_u4"),
        )
    )
    p1, p2, p3, p4 = ec_levels(F.col(ec_col))
    dashed = partials.filter(F.col(ec_col).contains("-")).withColumns(
        {"_p1": p1, "_p2": p2, "_p3": p3, "_p4": p4}
    )

    def lvl(p: str, u: str) -> Column:
        return (F.col(p) == "-") | (F.col(p) == F.col(u))

    expanded = dashed.join(
        uni,
        lvl("_p1", "_u1") & lvl("_p2", "_u2") & lvl("_p3", "_u3") & lvl("_p4", "_u4"),
        "inner",
    ).drop("_p1", "_p2", "_p3", "_p4", "_u1", "_u2", "_u3", "_u4")
    passthrough = partials.filter(~F.col(ec_col).contains("-")).withColumn(
        out, F.col(ec_col)
    )
    return expanded.unionByName(passthrough)


def updated_enzyme_records(
    df: DataFrame,
    ec_records: DataFrame,
    *,
    ec_col: str = "protein_entity_ec",
) -> DataFrame:
    """The reference's `get_updated_enzyme_records` (`utils.py:259-281`):
    split the comma-joined EC string, expand partials against the EXPASY
    universe, map through TRANSFER resolution, drop ECs that don't exist,
    and collect the distinct updated set per input value as `ec_list`
    (ArrayType — serialization to ',' happens only at sinks).

    ``ec_records`` must carry (ID, TRANSFER) — see `resolve_transfers`.
    """
    distinct_ec = df.select(ec_col).distinct()
    exploded = distinct_ec.select(
        F.col(ec_col),
        F.explode(F.split(F.col(ec_col), ",")).alias("_raw"),
    ).withColumn("_raw", F.trim("_raw"))
    expanded = expand_partial_ec(exploded, ec_records, ec_col="_raw", out="_full")
    mapped = (
        expanded.join(
            F.broadcast(ec_records.select(F.col("ID").alias("_full"), "TRANSFER")),
            "_full",
            "left",
        )
        .filter(F.col("TRANSFER").isNotNull())  # nonexistent ECs are incorrect
    )
    grouped = mapped.groupBy(ec_col).agg(
        F.array_sort(F.collect_set("TRANSFER")).alias("ec_list")
    )
    out = df.join(grouped, ec_col, "left").filter(
        F.col("ec_list").isNotNull() & (F.size("ec_list") > 0)
    )
    return out
