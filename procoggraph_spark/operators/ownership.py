"""Domain-ownership classification (SURVEY §2 P6/W1/W4/A10).

Re-expresses the reference's windowed ownership classifier
(`nextflow/bin/process_pdb_contacts.py:45-78,400-405`) as pure Spark
window + `when` chains — no UDF, fully codegen'd.

Semantics (kept bit-for-bit with the reference):

- ``total_contact_counts`` = sum of contact counts over (unique_id [, db]).
- ``domain_contact_perc``  = domain counts / total counts.
- ``num_non_minor_domains`` = count of rows in the group with perc > 0.1.
- classification:
    perc == 1.0                               -> 'exclusive'
    perc >= 0.9                               -> 'dominant'
    0.5 <= perc < 0.9 and non_minor == 1      -> 'major'
    0.5 <= perc < 0.9 and non_minor  > 1      -> 'major_partner'
    0.1 <  perc < 0.5 and non_minor  > 1      -> 'partner'
    perc <= 0.1                               -> 'minor'
    otherwise (0.1 < perc < 0.5, non_minor==1)-> NULL
  (the reference emits NaN for the last case — we keep NULL, same hole.)

Scale note: the windows partition by (unique_id, db) — the natural key the
downstream joins/aggregations also use, so at 100 TB one shuffle on that key
serves W1, W4 and the final group-by; AQE coalesces the tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ownership_case(perc: Column, non_minor: Column) -> Column:
    """The 6-way `when` chain; mirrors process_pdb_contacts.py:59-78."""
    return (
        F.when(perc == 1.0, "exclusive")
        .when(perc >= 0.9, "dominant")
        .when((perc >= 0.5) & (perc < 0.9) & (non_minor == 1), "major")
        .when((perc >= 0.5) & (perc < 0.9) & (non_minor > 1), "major_partner")
        .when((perc > 0.1) & (perc < 0.5) & (non_minor > 1), "partner")
        .when(perc <= 0.1, "minor")
        .otherwise(F.lit(None).cast("string"))
    )


def assign_ownership(
    df: DataFrame,
    *,
    unique_id: str = "uniqueID",
    database_type: str | None = "xref_db",
    contact_count: str = "domain_contact_counts",
    hbond_count: str = "domain_hbond_counts",
    covalent_count: str = "domain_covalent_counts",
) -> DataFrame:
    """Attach total counts, percentages, non-minor domain count and the
    ownership class to a per-(bound entity, domain) contact-stats frame.

    Equivalent to the `preassigned=True` path of the reference
    (`process_pdb_contacts.py:400-405` feeding `:45-78`).
    """
    group_cols = [unique_id] + ([database_type] if database_type else [])
    w = Window.partitionBy(*group_cols)

    total = F.sum(F.col(contact_count)).over(w)
    df = df.withColumn("total_contact_counts", total)

    # Share-of-nothing contract (domain-violations fuzz, round 10): an
    # entity whose counts sum to ZERO (all lines voided/zeroed) has
    # undefined ownership percentages — NULL share instead of an ANSI
    # DIVIDE_BY_ZERO, and with NULL perc the ownership class falls
    # through every `when` to NULL ("no contacts, no ownership").
    # SQL twin: `cnt / NULLIF(total, 0)`.
    def _share(cnt: str) -> Column:
        return F.when(
            F.col("total_contact_counts") != 0,
            F.col(cnt) / F.col("total_contact_counts"),
        )

    df = (
        df.withColumn("domain_contact_perc", _share(contact_count))
        .withColumn("domain_hbond_perc", _share(hbond_count))
        .withColumn("domain_covalent_perc", _share(covalent_count))
        .withColumn(
            "num_non_minor_domains",
            F.sum(F.when(F.col("domain_contact_perc") > 0.1, 1).otherwise(0)).over(w),
        )
        .withColumn(
            "domain_ownership",
            ownership_case(F.col("domain_contact_perc"), F.col("num_non_minor_domains")),
        )
    )
    return df
