"""Contact-processing stage (SURVEY §3.1 PROCESS_CONTACTS).

Re-expresses `nextflow/bin/process_pdb_contacts.py` Spark-first: the
reference fans out one pandas job per structure under multiprocessing;
here ONE declarative plan processes every structure at once — partition
parallelism replaces process parallelism, and the per-pdb loop
disappears.

Input: one row per atom-atom contact (the flattened shape of the
arpeggio JSON after the S7 source + bgn/end orientation P8):

    pdb_id, uniqueID (bound entity), bound_ligand_struct_asym_id,
    ligand_residue int, assembly_chain_id_protein, protein_residue int,
    protein_inscode string (nullable), contact_types array<string>,
    xref_db, domain_accession

Stages (reference lines cited per step):
1. drop contacts that are ONLY proximal/vdw_clash/clash
   (`process_pdb_contacts.py:121`)
2. per-contact hbond/covalent flags (`:358-360`)
3. aggregate per (bound entity, domain): counts + residue interaction
   lists (`:391-392`), inscode-sorted (`:407-411`)
4. ≥3-residue domain-contact cutoff (`:394`, nextflow.config:82)
5. ownership classification (`:400-405` → operators/ownership.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from procoggraph_spark.functions.strings import sort_tokens_numeric_inscode
from procoggraph_spark.operators.ownership import assign_ownership

NON_INTERACTING = ("proximal", "vdw_clash", "clash")


def filter_real_contacts(contacts: DataFrame) -> DataFrame:
    """Keep contacts with ≥1 type outside {proximal, vdw_clash, clash}."""
    bad = F.array(*[F.lit(x) for x in NON_INTERACTING])
    return contacts.filter(
        F.exists("contact_types", lambda t: ~F.array_contains(bad, t))
    )


def combined_contacts(
    contacts: DataFrame, *, contact_cutoff: int = 3
) -> DataFrame:
    """Atom-level contacts → per-(bound entity, domain) stats with
    ownership classes — the `combined_contacts.tsv` equivalent."""
    real = filter_real_contacts(contacts)
    flagged = real.withColumn(
        "is_hbond", F.array_contains("contact_types", "hbond").cast("int")
    ).withColumn(
        "is_covalent", F.array_contains("contact_types", "covalent").cast("int")
    ).withColumn(
        "protein_res_token",
        F.concat(
            F.col("protein_residue").cast("string"),
            F.when(
                F.col("protein_inscode").isNotNull() & (F.col("protein_inscode") != ""),
                F.concat(F.lit("_"), F.col("protein_inscode")),
            ).otherwise(""),
        ),
    )

    per_domain = flagged.groupBy(
        "pdb_id", "uniqueID", "xref_db", "domain_accession", "assembly_chain_id_protein"
    ).agg(
        F.count("*").alias("domain_contact_counts"),
        F.sum("is_hbond").alias("domain_hbond_counts"),
        F.sum("is_covalent").alias("domain_covalent_counts"),
        F.collect_set("protein_res_token").alias("_prot_residues"),
        F.collect_set(F.col("ligand_residue").cast("string")).alias("_lig_residues"),
    )
    # ≥3 interacting residues cutoff (reference :394)
    per_domain = per_domain.filter(F.size("_prot_residues") >= contact_cutoff)
    per_domain = (
        per_domain.withColumn(
            "domain_residue_interactions",
            sort_tokens_numeric_inscode(F.col("_prot_residues")),
        )
        .withColumn(
            "bound_ligand_residue_interactions",
            sort_tokens_numeric_inscode(F.col("_lig_residues")),
        )
        .drop("_prot_residues", "_lig_residues")
    )
    return assign_ownership(per_domain, unique_id="uniqueID", database_type="xref_db")
