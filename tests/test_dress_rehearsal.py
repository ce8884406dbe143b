"""Full-pipeline dress rehearsal (SURVEY §3.1, `nextflow/main.nf:209-217`):
raw bytes of EVERY input format through EVERY stage in one sequence —

  mmCIF (S5) + descriptor TSV (S1)
  → distributed arpeggio-tool stage (§3.1 RUN_ARPEGGIO, stub binary,
    dead-letter discipline)
  → S7 contact parsing → real-contact filter (P4)
  → SIFTS xrefs (S6) with normalization (InterPro/G3DSA → shared cath*)
  → combined contacts (PROCESS_CONTACTS) → ownership (P6)
  → sugar descriptor enrichment through the cached U8 chain
  → EXPASY enzyme.dat (S10) → EC transfer resolution (J8) → chain ECs
  → PARITY scoring through the keyed cache (U3/S16)
  → full graph build: chains, EC nodes, CATH/G3DSA/Pfam hierarchies
    with display names from raw cath-names + Pfam clan files
  → all 16 dashboard query shapes (Q1-Q16), golden-checked.

Each stage's inputs come from the PREVIOUS stage's outputs (no fixture
shortcuts past a stage), asserting the §1.3 key discipline end-to-end:
uniqueID = pdb_bm{n}_{chain}, domain = pdb:chain:db:acc, chain =
pdb_asym.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from procoggraph_spark.graph import queries as Q
from procoggraph_spark.operators.ec import resolve_transfers, updated_enzyme_records
from procoggraph_spark.operators.external import run_external_tool
from procoggraph_spark.pipeline.build_graph import (
    build_bound_descriptor_nodes,
    build_graph,
)
from procoggraph_spark.pipeline.contacts import combined_contacts
from procoggraph_spark.pipeline.parity import candidate_pairs, score_with_cache
from procoggraph_spark.sources import parsers as P
from procoggraph_spark.sources.cache import KeyedParquetCache
from procoggraph_spark.sources.readers import (
    pfam_annotations,
    pfam_clan_mapping,
    read_cath_names,
    read_tsv,
)

RING = "C1OC(O)C(O)C(O)C1O"  # the U8 fallback pyranose token
SUGAR_SMILES = "O".join([RING] * 2)  # res=2 WURCS → 2 rings, O-linked

CIF = """data_9zzz
_entry.id 9ZZZ
loop_
_struct_asym.id
_struct_asym.entity_id
A 1
B 2
C 3
loop_
_entity.id
_entity.type
_entity.pdbx_description
1 polymer 'Test enzyme'
2 non-polymer 'Test ligand'
3 branched 'Test sugar'
"""

DESCRIPTORS_TSV = (
    "hetCode\tbound_chain\tdescriptor\n"
    "LIG\tB\tCC(=O)N\n"
    "NAG\tC\tWURCS=2.0/1,2,1/[a2122h-1b_1-5_2*NCC/3=O]/1-1/a4-b1\n"
)

SIFTS = """<?xml version="1.0" encoding="UTF-8"?>
<entry xmlns="http://www.ebi.ac.uk/pdbe/docs/sifts/eFamily.xsd">
  <entity entityId="A">
    <segment>
      <listResidue>
        <residue dbResNum="10">
          <crossRefDb dbSource="CATH" dbAccessionId="3.40.50.720"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR036291"
                      dbEvidence="G3DSA:3.40.50.720"/>
        </residue>
        <residue dbResNum="11">
          <crossRefDb dbSource="CATH" dbAccessionId="3.40.50.720"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR036291"
                      dbEvidence="G3DSA:3.40.50.720"/>
        </residue>
        <residue dbResNum="12">
          <crossRefDb dbSource="CATH" dbAccessionId="3.40.50.720"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR036291"
                      dbEvidence="G3DSA:3.40.50.720"/>
        </residue>
        <residue dbResNum="30"><crossRefDb dbSource="CATH" dbAccessionId="2.40.110.10"/></residue>
        <residue dbResNum="31"><crossRefDb dbSource="CATH" dbAccessionId="2.40.110.10"/></residue>
        <residue dbResNum="32"><crossRefDb dbSource="CATH" dbAccessionId="2.40.110.10"/></residue>
        <residue dbResNum="20"><crossRefDb dbSource="Pfam" dbAccessionId="PF00001"/></residue>
        <residue dbResNum="21"><crossRefDb dbSource="Pfam" dbAccessionId="PF00001"/></residue>
        <residue dbResNum="22"><crossRefDb dbSource="Pfam" dbAccessionId="PF00001"/></residue>
      </listResidue>
    </segment>
  </entity>
</entry>
"""

ENZYME_DAT = """ID   1.1.1.1
DE   Alcohol dehydrogenase.
//
ID   1.1.1.2
DE   Transferred entry: 1.1.1.3.
//
ID   1.1.1.3
DE   Homoserine dehydrogenase.
//
"""

CATH_NAMES = (
    "# cath-names fixture\n"
    "3    1abcA00    :Alpha Beta\n"
    "3.40    1abcA00    :3-Layer(aba) Sandwich\n"
    "3.40.50    1abcA00    :Rossmann fold\n"
    "3.40.50.720    1abcA00    :NAD(P)-binding Rossmann-like Domain\n"
)


def _contact(bgn_chain, bgn_seq, end_seq, types):
    return {
        "bgn": {"auth_asym_id": bgn_chain, "auth_seq_id": bgn_seq,
                "auth_atom_id": "C1"},
        "end": {"auth_asym_id": "A", "auth_seq_id": end_seq,
                "auth_atom_id": "CA"},
        "contact": types,
        "interacting_entities": "INTER",
        "distance": 3.5,
    }


ARPEGGIO = {
    "status": "complete",
    "9zzz": [
        _contact("B", 401, 10, ["hbond"]),
        _contact("B", 401, 11, ["vdw"]),
        _contact("B", 402, 12, ["covalent"]),
        _contact("B", 401, 30, ["hbond"]),
        _contact("B", 402, 31, ["vdw"]),
        _contact("B", 402, 32, ["vdw"]),
        _contact("C", 501, 20, ["hbond"]),
        _contact("C", 501, 21, ["polar"]),
        _contact("C", 502, 22, ["vdw"]),
        _contact("B", 401, 10, ["proximal"]),  # proximal-only: dropped
    ],
}

PFAM_A = "PF00001\t7tm_1\tDomain\t7 transmembrane receptor\n"
CLAN_MEMBERSHIP = "CL0192\tPF00001\n"
CLAN_INFO = (
    "# fixture\n"
    + "\t".join(
        ["CL0192", "GPCR_A", "None", "GPCR clan", "a", "b",
         "G-protein-coupled receptor superfamily", "2020", "2004",
         "1", "1", "1", "1", "1", "0", "0"]
    )
    + "\n"
)


@pytest.fixture(scope="module")
def rehearsal(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("rehearsal")
    (raw / "9zzz.cif").write_text(CIF)
    (raw / "descriptors.tsv").write_text(DESCRIPTORS_TSV)
    (raw / "9zzz_sifts.xml").write_text(SIFTS)
    (raw / "9zzz_contacts.json").write_text(json.dumps(ARPEGGIO))
    (raw / "enzyme.dat").write_text(ENZYME_DAT)
    (raw / "cath-names.txt").write_text(CATH_NAMES)
    (raw / "pfam_a.tsv").write_text(PFAM_A)
    (raw / "clan_membership.tsv").write_text(CLAN_MEMBERSHIP)
    (raw / "clan_info.tsv").write_text(CLAN_INFO)

    # --- §3.1 RUN_ARPEGGIO: distributed stub binary over a manifest ----
    manifest = spark.createDataFrame([("9zzz",), ("missing",)], "pdb_id string")
    tool = run_external_tool(
        manifest,
        argv=["sh", "-c", f'cat "{raw}"/"$0"_contacts.json', "{}"],
        input_col="pdb_id",
        timeout_s=30.0,
    )
    contacts = P.arpeggio_from_tool_output(tool, id_col="pdb_id")
    dead = contacts.filter(F.col("status") != "ok")
    real = contacts.filter(
        (F.col("status") == "ok")
        & (F.col("interacting_entities") == "INTER")
        & F.exists("contact", lambda c: ~c.isin("proximal", "vdw_clash", "clash"))
    )

    # --- S6 + normalization ---------------------------------------------
    xrefs = P.normalize_domain_xrefs(
        P.read_sifts_xrefs(spark, str(raw / "9zzz_sifts.xml"))
    ).select(
        F.col("proteinStructAsymID").alias("chain"),
        F.col("seq_range_chain").cast("int").alias("resnum"),
        "xref_db",
        "xref_db_acc",
    )

    # --- contacts ⋈ domains → atom-level pipeline input (§1.3 keys) -----
    atom = real.join(
        xrefs,
        (real.end_auth_asym_id == xrefs.chain)
        & (real.end_auth_seq_id == xrefs.resnum),
    ).select(
        "pdb_id",
        F.when(F.col("bgn_auth_asym_id") == "B", "9zzz_bm1_B")
        .otherwise("9zzz_bm2_C")
        .alias("uniqueID"),
        F.col("bgn_auth_asym_id").alias("bound_ligand_struct_asym_id"),
        F.col("bgn_auth_seq_id").cast("int").alias("ligand_residue"),
        F.concat(F.col("end_auth_asym_id"), F.lit("_1")).alias(
            "assembly_chain_id_protein"
        ),
        F.col("end_auth_seq_id").cast("int").alias("protein_residue"),
        F.lit(None).cast("string").alias("protein_inscode"),
        F.col("contact").alias("contact_types"),
        "xref_db",
        F.concat_ws(
            ":", "pdb_id", "chain", "xref_db", "xref_db_acc"
        ).alias("domain_accession"),
    )

    # --- PROCESS_CONTACTS + ownership -----------------------------------
    cc = combined_contacts(atom, contact_cutoff=3)

    # --- S5 entity identity + S1 descriptor table → bound-entity meta ---
    asym = P.read_cif_category(
        spark, str(raw / "9zzz.cif"), "_struct_asym", ["id", "entity_id"]
    ).select(F.col("id").alias("bound_chain"), "entity_id")
    entity = P.read_cif_category(
        spark, str(raw / "9zzz.cif"), "_entity",
        ["id", "type", "pdbx_description"],
    ).select(
        F.col("id").alias("entity_id"),
        F.when(F.col("type") == "branched", "sugar")
        .when(F.col("type") == "non-polymer", "ligand")
        .otherwise(F.col("type"))
        .alias("type"),
        F.col("pdbx_description").alias("description"),
    )
    desc = read_tsv(spark, str(raw / "descriptors.tsv"))
    meta = (
        asym.join(entity, "entity_id")
        .join(desc, "bound_chain")
        .filter(F.col("type") != "polymer")
        .select("bound_chain", "hetCode", "descriptor", "description", "type")
    )
    cc_meta = cc.withColumn(
        "_chain", F.element_at(F.split("uniqueID", "_"), -1)
    ).join(F.broadcast(meta), F.col("_chain") == meta.bound_chain).drop(
        "_chain", "bound_chain"
    )

    # --- U8 sugar enrichment through the 3-hop cached chain -------------
    from procoggraph_spark.functions.sugars import enrich_sugar_descriptors

    sugar_cache = str(raw / "sugar_cache")
    cc_meta = enrich_sugar_descriptors(spark, cc_meta, cache_root=sugar_cache)

    # --- S10 + J8: EC universe, transfer resolution, chain ECs ----------
    ec_records = P.read_enzyme_dat(spark, str(raw / "enzyme.dat"))
    resolved = resolve_transfers(ec_records)
    chains = spark.createDataFrame(
        [("A_1", "1.1.1.2")],
        "assembly_chain_id_protein string, protein_entity_ec string",
    )
    chain_ecs = updated_enzyme_records(chains, resolved).select(
        "assembly_chain_id_protein",
        "protein_entity_ec",
        F.col("ec_list").alias("ecList"),
    )
    cc_full = cc_meta.join(F.broadcast(chain_ecs), "assembly_chain_id_protein")
    cc_full = (
        cc_full.withColumn("pdb_descriptor", F.lit("Test enzyme complex"))
        .withColumn("pdb_title", F.lit("Dress rehearsal structure"))
        .withColumn("pdb_keywords", F.lit("TEST"))
        .withColumn(
            "xref_db_acc", F.element_at(F.split("domain_accession", ":"), -1)
        )
    )

    # --- U3/S16: PARITY scoring through the keyed cache -----------------
    cognate = spark.createDataFrame(
        [
            (101, "CC(=O)N", "acetamide-like", "KEGG:C1", "R1", "N"),
            (102, SUGAR_SMILES, "disaccharide-like", "KEGG:C2", "R2", "N"),
            (103, "[Mg+2]", "magnesium", "CHEBI:3", "R3", "Cofactor"),
        ],
        "uniqueID long, canonical_smiles string, compound_name string,"
        " ligand_db string, compound_reaction string, isCofactor string",
    )
    bds = build_bound_descriptor_nodes(cc_full)
    bd_input = (
        cc_full.select("hetCode", "descriptor", "description", "ecList")
        .dropDuplicates(["hetCode", "descriptor", "description"])
        .join(F.broadcast(bds), ["hetCode", "descriptor", "description"])
        .select(
            F.col("ligandEntityID").alias("ligand_entity_id"),
            "descriptor",
            F.col("ecList").alias("ec_list"),
        )
    )
    cog_ec = cognate.select(
        F.lit("1.1.1.3").alias("entry"), "uniqueID", "canonical_smiles"
    )
    pairs = candidate_pairs(bd_input, cog_ec)
    parity_cache = str(raw / "parity_cache")
    scored = score_with_cache(spark, pairs, parity_cache)
    parity = scored.select(
        "ec",
        F.col("ligand_entity_id").alias("pdb_ligand"),
        "cognate_ligand",
        "score",
        "pdbl_subparity",
        "parity_smarts",
        "error",
    )

    # --- hierarchy decoration from raw files ----------------------------
    names = read_cath_names(spark, str(raw / "cath-names.txt"))
    clans = pfam_clan_mapping(
        pfam_annotations(
            spark,
            str(raw / "pfam_a.tsv"),
            str(raw / "clan_membership.tsv"),
            str(raw / "clan_info.tsv"),
        )
    )

    # --- U7: cofactor priority resolution from ChEBI has_role ------------
    # FINAL_ID 3 carries TWO role rows (generic Cofactor + Coenzyme), so
    # ligand 103 exercises the subgroup-beats-generic branch; 101/102
    # have no CHEBI xref and must resolve to 'N' (the incoming
    # isCofactor pass-through column is recomputed, as in the reference)
    chebi_cofactors = spark.createDataFrame(
        [("3", "Cofactor"), ("3", "Coenzyme"), ("999", "Siderophore")],
        "FINAL_ID string, isCofactor string",
    )
    g = build_graph(
        cc_full,
        parity,
        cognate,
        ec_records=resolved,
        hierarchy_mappings={"Pfam": clans},
        hierarchy_names={"CATH": names},
        chebi_cofactors=chebi_cofactors,
    )
    return {
        "g": g,
        "cc": cc,
        "cc_full": cc_full,
        "dead": dead,
        "real": real,
        "xrefs": xrefs,
        "pairs": pairs,
        "parity_cache": parity_cache,
        "sugar_cache": sugar_cache,
        "bds": bds,
        "spark": spark,
    }


def test_tool_stage_and_contact_filter(rehearsal):
    # the missing structure is a dead-letter row (cat exit 1), not a crash
    dead = rehearsal["dead"].collect()
    assert [(r["pdb_id"], r["status"]) for r in dead] == [("missing", "error_1")]
    # 10 parsed atom contacts, 9 real (proximal-only dropped)
    assert rehearsal["real"].count() == 9


def test_sifts_normalization_feeds_shared_chain(rehearsal):
    got = {
        (r["xref_db"], r["xref_db_acc"]) for r in rehearsal["xrefs"].collect()
    }
    # InterPro/G3DSA evidence normalized onto G3DSA with prefix stripped
    assert got == {
        ("CATH", "3.40.50.720"),
        ("CATH", "2.40.110.10"),
        ("G3DSA", "3.40.50.720"),
        ("Pfam", "PF00001"),
    }


def test_combined_contacts_and_ownership(rehearsal):
    rows = {r["domain_accession"]: r for r in rehearsal["cc"].collect()}
    assert set(rows) == {
        "9zzz:A:CATH:3.40.50.720",
        "9zzz:A:CATH:2.40.110.10",
        "9zzz:A:G3DSA:3.40.50.720",
        "9zzz:A:Pfam:PF00001",
    }
    # per-db ownership: B splits CATH 3/6+3/6 → major_partner both;
    # G3DSA and Pfam are sole domains in their dbs → exclusive
    assert rows["9zzz:A:CATH:3.40.50.720"]["domain_ownership"] == "major_partner"
    assert rows["9zzz:A:CATH:2.40.110.10"]["domain_ownership"] == "major_partner"
    assert rows["9zzz:A:G3DSA:3.40.50.720"]["domain_ownership"] == "exclusive"
    assert rows["9zzz:A:Pfam:PF00001"]["domain_ownership"] == "exclusive"
    d1 = rows["9zzz:A:CATH:3.40.50.720"]
    assert d1["domain_contact_counts"] == 3
    assert d1["domain_hbond_counts"] == 1
    assert d1["domain_covalent_counts"] == 1
    assert d1["domain_residue_interactions"] == "10|11|12"


def test_sugar_chain_enriched_descriptor(rehearsal):
    sugar = (
        rehearsal["cc_full"].filter(F.col("type") == "sugar").select("descriptor")
        .distinct()
        .collect()
    )
    # WURCS res=2 → two fallback rings, O-linked; ligand untouched
    assert [r["descriptor"] for r in sugar] == [SUGAR_SMILES]
    lig = (
        rehearsal["cc_full"].filter(F.col("type") == "ligand")
        .select("descriptor").distinct().collect()
    )
    assert [r["descriptor"] for r in lig] == ["CC(=O)N"]


def test_chain_ec_resolution_flags(rehearsal):
    g = rehearsal["g"]
    pcs = {r["pdbProteinChain"]: r for r in g.nodes["proteinChain"].collect()}
    assert set(pcs) == {"9zzz_A"}
    assert list(pcs["9zzz_A"]["ecList"]) == ["1.1.1.3"]
    assert pcs["9zzz_A"]["updatedEC"] == "True"  # 1.1.1.2 → 1.1.1.3
    assert pcs["9zzz_A"]["partialEC"] == "False"


def test_parity_cache_round_trip(rehearsal):
    spark = rehearsal["spark"]
    from procoggraph_spark.pipeline.parity import CACHE_KEYS

    cache = KeyedParquetCache(spark, rehearsal["parity_cache"], CACHE_KEYS)
    _, misses = cache.split_hits_misses(
        rehearsal["pairs"].select(*CACHE_KEYS).distinct()
    )
    assert misses.count() == 0  # every scored pair cached exactly once
    # sugar chain caches populated: re-running the chain converts nothing
    from procoggraph_spark.functions.sugars import sugar_smiles_from_wurcs

    wurcs = (
        rehearsal["cc"].sparkSession.createDataFrame(
            [("WURCS=2.0/1,2,1/[a2122h-1b_1-5_2*NCC/3=O]/1-1/a4-b1",)],
            "WURCS string",
        )
    )
    glyco_cache = KeyedParquetCache(
        spark, f"{rehearsal['sugar_cache']}/glycoct_cache", ["WURCS"]
    )
    _, glyco_misses = glyco_cache.split_hits_misses(wurcs)
    assert glyco_misses.count() == 0


def test_q1_to_q4_shapes(rehearsal):
    g = rehearsal["g"]
    counts = {r["entity"]: r["n"] for r in Q.q1_summary_counts(g).collect()}
    assert counts == {
        "entries": 1, "boundEntities": 2, "cognateLigands": 3, "domains": 4,
    }
    # U7 ran inside build_graph: the pass-through isCofactor column was
    # recomputed from the ChEBI has_role table via select_cofactor
    cof = {
        r["uniqueID"]: r["isCofactor"]
        for r in g.nodes["cognateLigand"].collect()
    }
    assert cof == {101: "N", 102: "N", 103: "Coenzyme"}
    q2 = Q.q2_similarity_counts(g).collect()[0]
    # LIG→101 and sugar→102 are exact fallback matches; 103 scores 0
    assert (q2["n_matched_entities"], q2["n_unambiguous"]) == (2, 2)
    q3 = Q.q3_search(g, "test").collect()
    assert {r["hetCode"] for r in q3} == {"LIG", "NAG"}
    card = Q.q4_report_card(g, "9zzz").collect()[0]
    assert card["n_bound_entities"] == 2
    assert card["n_domains"] == 4
    assert card["n_domain_groups"] == 3  # shared 3.40.50.720 counted once
    assert card["n_cognate_matches"] == 2


def test_q5_to_q10_shapes(rehearsal):
    g = rehearsal["g"]
    assert Q.q5_domain_interactions(g, "9zzz").count() == 4
    q6 = {
        (r["uniqueID"], r["cognateLigand"]): r
        for r in Q.q6_ligand_table(g, "9zzz").collect()
    }
    assert set(q6) == {("9zzz_bm1_B", 101), ("9zzz_bm2_C", 102)}
    assert all(r["bestCognate"] == "Y" and r["parityScore"] == 1.0
               for r in q6.values())
    q7 = {
        r["groupAccession"]: r
        for r in Q.q7_group_rollup(g, domain_kind="CATH").collect()
    }
    assert set(q7) == {"3.40.50.720", "2.40.110.10"}
    assert all(
        r["cognateLigand"] == 101 and r["n_domains"] == 1
        and r["n_bound_entities"] == 1
        for r in q7.values()
    )
    q8 = Q.q8_group_binding_pct(g, domain_kind="CATH").collect()
    assert all(r["pct_binding"] == 100.0 for r in q8)
    q9 = Q.q9_combinatorial(g, domain_kind="CATH").collect()
    assert [
        (list(r["combination"]), r["n_bound_entities"], r["n_cognate_ligands"])
        for r in q9
    ] == [
        (
            ["2.40.110.10:major_partner", "3.40.50.720:major_partner"],
            1,
            1,
        )
    ]
    q10 = Q.q10_cognate_to_pdbs(g, 101).collect()
    assert [(r["pdbEntry"], r["n_bound_entities"], r["best_score"])
            for r in q10] == [("9zzz", 1, 1.0)]


def test_q11_to_q16_shapes(rehearsal):
    g = rehearsal["g"]
    # EC walk grounded in the enzyme.dat-built nodes: the resolved EC
    # carries both cognate edges
    ec_walk = {r["ecID"]: r for r in Q.q11_ec_walk(g).collect()}
    assert ec_walk["1.1.1.3"]["n_cognate_ligands"] == 2
    cath_walk = {
        (r["cathClass"], r["cathArchitecture"], r["cathTopology"],
         r["cathHomologousSuperfamily"]): r["n_domains"]
        for r in Q.q11_domain_hierarchy_walk(g, domain_kind="CATH").collect()
    }
    assert cath_walk == {
        ("3", "3.40", "3.40.50", "3.40.50.720"): 1,
        ("2", "2.40", "2.40.110", "2.40.110.10"): 1,
    }
    # G3DSA walks the SAME cath* chain (shared topology node), own count
    g3_walk = Q.q11_domain_hierarchy_walk(g, domain_kind="G3DSA").collect()
    assert [(r["cathTopology"], r["n_domains"]) for r in g3_walk] == [
        ("3.40.50", 1)
    ]
    # display names from the raw cath-names file
    topo = {
        r["cathTopology"]: r["description"]
        for r in g.nodes["cathTopology"].collect()
    }
    assert topo["3.40.50"] == "Rossmann fold"
    assert topo["2.40.110"] is None  # not in the names fixture
    # Pfam clan from raw clan files, named
    assert [
        (r["pfamClan"], r["description"]) for r in g.nodes["pfamClan"].collect()
    ] == [("CL0192", "GPCR clan")]
    pfam_walk = Q.q11_domain_hierarchy_walk(g, domain_kind="Pfam").collect()
    assert [(r["pfamClan"], r["n_domains"]) for r in pfam_walk] == [
        ("CL0192", 1)
    ]
    assert [
        (r["pdbProteinChain"], r["pdbEntry"])
        for r in Q.q12_chains_for_ec(g, "1.1.1.3").collect()
    ] == [("9zzz_A", "9zzz")]
    q13 = Q.q13_compare_domain_groups(
        g, "3.40.50.720", "2.40.110.10", domain_kind="CATH"
    ).collect()[0]
    assert (list(q13["shared"]), list(q13["only_a"]), list(q13["only_b"])) == (
        [101], [], [],
    )
    lig_id = (
        rehearsal["bds"].filter(F.col("hetCode") == "LIG").collect()[0][
            "ligandEntityID"
        ]
    )
    q14 = Q.q14_descriptor_page(g, lig_id).collect()
    assert [
        (r["hetCode"], r["n_instances"], r["n_pdbs"], r["n_cognate_matches"])
        for r in q14
    ] == [("LIG", 1, 1, 1)]
    nodes, edges = Q.q15_neighborhood(g, "9zzz")
    assert edges.count() == 8  # 2 IS_IN_PDB + 4 IWL + 2 HAS_SIMILARITY
    assert nodes.count() == 9  # entry + 2 be + 4 domains + 2 cognates
    assert Q.q16_viewer_payload(g, "9zzz").count() == 4
