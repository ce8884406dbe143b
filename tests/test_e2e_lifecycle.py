"""End-to-end lifecycle (SURVEY §3.1): raw per-structure files —
mmCIF + SIFTS XML + arpeggio contact JSON — through the format parsers,
the contacts pipeline, ownership classification, graph build, and a
dashboard query. One structure, golden-checked at each boundary."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from procoggraph_spark.operators.ownership import assign_ownership
from procoggraph_spark.pipeline.contacts import combined_contacts
from procoggraph_spark.sources import parsers as P

CIF = """data_9zzz
_entry.id 9ZZZ
loop_
_struct_asym.id
_struct_asym.entity_id
A 1
B 2
loop_
_entity.id
_entity.type
_entity.pdbx_description
1 polymer 'Test enzyme'
2 non-polymer 'Test ligand'
"""

SIFTS = """<?xml version="1.0" encoding="UTF-8"?>
<entry xmlns="http://www.ebi.ac.uk/pdbe/docs/sifts/eFamily.xsd">
  <entity entityId="A">
    <segment>
      <listResidue>
        <residue dbResNum="10"><crossRefDb dbSource="CATH" dbAccessionId="3.40.50.720"/></residue>
        <residue dbResNum="11"><crossRefDb dbSource="CATH" dbAccessionId="3.40.50.720"/></residue>
        <residue dbResNum="12"><crossRefDb dbSource="CATH" dbAccessionId="3.40.50.720"/></residue>
        <residue dbResNum="13"><crossRefDb dbSource="Pfam" dbAccessionId="PF00001"/></residue>
      </listResidue>
    </segment>
  </entity>
</entry>
"""


def _contact(seq_id, types):
    return {
        "bgn": {"auth_asym_id": "B", "auth_seq_id": 401, "auth_atom_id": "C1"},
        "end": {"auth_asym_id": "A", "auth_seq_id": seq_id, "auth_atom_id": "CA"},
        "contact": types,
        "interacting_entities": "INTER",
        "distance": 3.5,
    }


ARPEGGIO = {
    "status": "complete",
    "9zzz": [
        _contact(10, ["hbond"]),
        _contact(11, ["vdw"]),
        _contact(12, ["covalent"]),
        _contact(13, ["polar"]),          # Pfam residue (below Pfam cutoff)
        _contact(10, ["proximal"]),       # proximal-only: dropped
    ],
}


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    (d / "9zzz.cif").write_text(CIF)
    (d / "9zzz_sifts.xml").write_text(SIFTS)
    (d / "9zzz_contacts.json").write_text(json.dumps(ARPEGGIO))
    return d


def test_raw_files_to_graph_query(spark, raw):
    # --- S7: contacts, real-contact filter (P4) ------------------------
    contacts = P.read_arpeggio_contacts(spark, str(raw / "9zzz_contacts.json"))
    real = contacts.filter(
        (F.col("status") == "ok")
        & (F.col("interacting_entities") == "INTER")
        & F.exists("contact", lambda c: ~c.isin("proximal", "vdw_clash", "clash"))
    )
    assert real.count() == 4

    # --- S6: per-residue domain xrefs ----------------------------------
    xrefs = P.read_sifts_xrefs(spark, str(raw / "9zzz_sifts.xml")).select(
        F.col("proteinStructAsymID").alias("chain"),
        F.col("seq_range_chain").cast("int").alias("resnum"),
        "xref_db",
        "xref_db_acc",
    )

    # --- S5: bound-entity identity from the mmCIF ----------------------
    asym = P.read_cif_category(
        spark, str(raw / "9zzz.cif"), "_struct_asym", ["id", "entity_id"]
    )
    lig_chains = {r["id"] for r in asym.filter(F.col("entity_id") == "2").collect()}
    assert lig_chains == {"B"}

    # --- contacts ⋈ domains → pipeline input shape ---------------------
    atom = (
        real.join(
            xrefs,
            (real.end_auth_asym_id == xrefs.chain)
            & (real.end_auth_seq_id == xrefs.resnum),
        )
        .select(
            F.col("pdb_id"),
            F.concat_ws("_", "pdb_id", F.lit("bm1"), "bgn_auth_asym_id").alias(
                "uniqueID"
            ),
            F.col("bgn_auth_asym_id").alias("bound_ligand_struct_asym_id"),
            F.col("bgn_auth_seq_id").cast("int").alias("ligand_residue"),
            F.col("end_auth_asym_id").alias("assembly_chain_id_protein"),
            F.col("end_auth_seq_id").cast("int").alias("protein_residue"),
            F.lit(None).cast("string").alias("protein_inscode"),
            F.col("contact").alias("contact_types"),
            "xref_db",
            F.concat_ws(":", "pdb_id", "chain", "xref_db_acc").alias(
                "domain_accession"
            ),
        )
    )

    # --- contacts stage + ownership ------------------------------------
    cc = combined_contacts(atom, contact_cutoff=3)
    rows = {r["domain_accession"]: r for r in cc.collect()}
    # CATH domain: 3 residues ≥ cutoff, survives; Pfam: 1 residue, dropped
    assert set(rows) == {"9zzz:A:3.40.50.720"}
    d = rows["9zzz:A:3.40.50.720"]
    assert d["domain_contact_counts"] == 3
    assert d["domain_hbond_counts"] == 1
    assert d["domain_covalent_counts"] == 1
    assert d["domain_residue_interactions"] == "10|11|12"

    owned = assign_ownership(cc, unique_id="uniqueID", database_type="xref_db")
    o = owned.collect()[0]
    assert o["domain_ownership"] == "exclusive"  # sole surviving domain

    # --- a dashboard-query shape over the built rows -------------------
    report = (
        owned.groupBy("uniqueID")
        .agg(
            F.countDistinct("domain_accession").alias("n_domains"),
            F.concat_ws("|", F.sort_array(F.collect_set("domain_accession"))).alias(
                "domains"
            ),
        )
        .collect()[0]
    )
    assert report["uniqueID"] == "9zzz_bm1_B"
    assert report["n_domains"] == 1
    assert report["domains"] == "9zzz:A:3.40.50.720"

    # --- graph build from the pipeline rows (not fixtures) -------------
    # entity/ligand metadata the real pipeline joins from the mmCIF and
    # the SIFTS EC annotations (one structure, so literals suffice here)
    cc_full = (
        owned.withColumn("pdb_descriptor", F.lit("Test enzyme complex"))
        .withColumn("pdb_title", F.lit("A test structure"))
        .withColumn("pdb_keywords", F.lit("TEST"))
        .withColumn("xref_db_acc", F.lit("3.40.50.720"))
        .withColumn("hetCode", F.lit("LIG"))
        .withColumn("descriptor", F.lit("CCO"))
        .withColumn("description", F.lit("Test ligand"))
        .withColumn("type", F.lit("ligand"))
        .withColumn("ecList", F.array(F.lit("1.1.1.1")))
    )
    from procoggraph_spark.graph import queries as Q
    from procoggraph_spark.pipeline.build_graph import build_graph

    parity = spark.createDataFrame(
        [],
        "ec string, pdb_ligand long, cognate_ligand long, score double,"
        " pdbl_subparity double, parity_smarts string, error string",
    )
    cognate = spark.createDataFrame(
        [],
        "uniqueID long, canonical_smiles string, compound_name string,"
        " ligand_db string, compound_reaction string, isCofactor string",
    )
    g = build_graph(cc_full, parity, cognate)

    # Q12 over the BUILT chains: the 9zzz chain A carries EC 1.1.1.1
    chains = Q.q12_chains_for_ec(g, "1.1.1.1").collect()
    assert [(r["pdbProteinChain"], r["pdbEntry"]) for r in chains] == [
        ("9zzz_A", "9zzz")
    ]
    # domain→chain and chain→entry edges reach the same chain
    assert g.edges["IS_IN_PROTEIN_CHAIN"].collect()[0]["dst"] == "9zzz_A"
    pdb_edges = {
        (r["src"], r["dst"], r["srcLabel"]) for r in g.edges["IS_IN_PDB"].collect()
    }
    assert ("9zzz_A", "9zzz", "proteinChain") in pdb_edges
    assert ("9zzz_bm1_B", "9zzz", "boundEntity") in pdb_edges

    # Q4 report card on the built graph (no cognate data → 0 matches)
    card = {r["pdbEntry"]: r for r in Q.q4_report_card(g).collect()}
    assert card["9zzz"]["n_bound_entities"] == 1
    assert card["9zzz"]["n_domains"] == 1
    assert card["9zzz"]["n_cognate_matches"] == 0

    # --- classification hierarchy on the BUILT graph -------------------
    # build_graph derived the CATH chain from the raw-contact-built
    # domain nodes: domain→HSF→topology→architecture→class edges exist
    # and the Q11 walk rolls the one domain up the full dotted path
    # (domain-browse pages, dashboard.json:1010 block)
    leaf = {
        (r["src"], r["dst"], r["srcLabel"])
        for r in g.edges["IS_IN_CATH_HOMOLOGOUS_SUPERFAMILY"].collect()
    }
    assert leaf == {("9zzz:A:3.40.50.720", "3.40.50.720", "cathDomain")}
    assert {
        (r["src"], r["dst"]) for r in g.edges["IS_IN_CATH_CLASS"].collect()
    } == {("3.40", "3")}

    walk = Q.q11_domain_hierarchy_walk(g, domain_kind="CATH").collect()
    assert [
        (r["cathClass"], r["cathArchitecture"], r["cathTopology"],
         r["cathHomologousSuperfamily"], r["n_domains"])
        for r in walk
    ] == [("3", "3.40", "3.40.50", "3.40.50.720", 1)]

    # Q7/Q8-style group rollup on the built graph (no cognate data in
    # this fixture, so the rollup grounds in the hierarchy + interaction
    # edges): superfamily group → its domains → bound entities
    leaf_e = g.edges["IS_IN_CATH_HOMOLOGOUS_SUPERFAMILY"].select(
        F.col("src").alias("domain"), F.col("dst").alias("group")
    )
    iwl = g.edges["INTERACTS_WITH_LIGAND"].select("domain", "uniqueID")
    rollup = (
        leaf_e.join(iwl, "domain")
        .groupBy("group")
        .agg(
            F.countDistinct("domain").alias("n_domains"),
            F.countDistinct("uniqueID").alias("n_bound_entities"),
        )
        .collect()
    )
    assert [(r["group"], r["n_domains"], r["n_bound_entities"]) for r in rollup] == [
        ("3.40.50.720", 1, 1)
    ]
