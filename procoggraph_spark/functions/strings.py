"""String/array scalar functions (SURVEY §2.7).

All pure Column expressions (JVM-side, codegen'd) — no Python UDFs. Each
cites the pandas original it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sort_tokens_numeric_inscode(tokens: Column, sep: str = "|") -> Column:
    """Sort residue tokens like ``["100_A", "99"]`` by (numeric part,
    insertion code) and join with ``sep`` → ``"99|100_A"``.

    Re-expresses `sort_numeric_with_inscode`
    (reference `nextflow/bin/process_pdb_contacts.py:40-44`, regex
    ``(\\d+)_*(\\D*)``) as array_sort over a (num, ins, token) struct —
    struct ordering gives the (numeric, inscode) sort, no UDF.

    Documented divergence: the reference sorts by the numeric part only
    and relies on Python's stable sort for ties (input-order-dependent);
    here ties order deterministically by (inscode, token) so reruns and
    any partitioning produce identical output (SURVEY §1.3 determinism).
    """
    structs = F.transform(
        tokens,
        lambda x: F.struct(
            F.regexp_extract(x, r"^(\d+)", 1).try_cast("int").alias("num"),
            F.regexp_extract(x, r"^\d+_*(\D*)", 1).alias("ins"),
            x.alias("token"),
        ),
    )
    return F.array_join(F.transform(F.array_sort(structs), lambda s: s["token"]), sep)


def strip_chars(col: Column, chars: str) -> Column:
    """``str.strip(chars)`` equivalent (reference scrubs quotes/newlines,
    e.g. `process_pdb_structure.py:57`, `process_pdb_contacts.py:346`)."""
    import re

    cls = re.escape(chars)
    # \A/\z, not ^/$: Java regex $ matches BEFORE a trailing newline, so
    # "$"-anchored stripping would eat chars preceding a final \n that
    # Python's str.strip(chars) keeps (found by the hypothesis property)
    return F.regexp_replace(col, f"\\A[{cls}]+|[{cls}]+\\z", "")


def pattern_to_range(col: Column) -> Column:
    """``"(1-60)"`` → array [1..60] (reference `pattern_to_range`,
    `process_pdb_structure.py:12-14`). Input may or may not be
    parenthesized; returns ArrayType(IntegerType)."""
    # try_cast: regexp_extract yields '' (not NULL) on no-match, and
    # ANSI mode (Spark 4 default) hard-fails a plain cast on ''
    lo = F.regexp_extract(col, r"(\d+)\s*-\s*(\d+)", 1).try_cast("int")
    hi = F.regexp_extract(col, r"(\d+)\s*-\s*(\d+)", 2).try_cast("int")
    single = F.regexp_extract(col, r"^\(?(\d+)\)?$", 1).try_cast("int")
    return F.when(lo.isNotNull() & hi.isNotNull(), F.sequence(lo, hi)).otherwise(
        F.when(single.isNotNull(), F.array(single))
    )


def length_upper_sorted(names: Column, sep: str = "|") -> Column:
    """Sort a name array by (length, case-sensitive value) and join —
    the reference's `length_upper_sorted` name-ordering
    (`get_ec_information.py:297-299`)."""
    structs = F.transform(
        names, lambda x: F.struct(F.length(x).alias("len"), x.alias("name"))
    )
    return F.array_join(F.transform(F.array_sort(structs), lambda s: s["name"]), sep)


def pipe_join_sorted_set(col: Column) -> Column:
    """collect_set → sorted → '|'-joined (the Neo4j-array export encoding,
    `produce_neo4j_files.py:115,380`). Apply on a collected array."""
    return F.array_join(F.array_sort(F.array_distinct(col)), "|")
