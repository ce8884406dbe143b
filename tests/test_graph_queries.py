"""Dashboard query layer (Q1-Q16) over the fixture graph: golden
assertions for the parameterized semantics (cutoff / domain kind /
Best-Any-All) plus SQL-surface smoke via registered views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from procoggraph_spark.graph import queries as Q
from procoggraph_spark.operators.ec import resolve_transfers
from procoggraph_spark.pipeline.build_graph import build_graph
from tests import fixtures


@pytest.fixture(scope="module")
def graph(spark):
    cc, parity, cognate, ec_records = fixtures.graph_inputs(spark)
    # proteinChain nodes/edges come from the builder itself now
    return build_graph(cc, parity, cognate, ec_records=resolve_transfers(ec_records))


def test_q1_counts(graph):
    got = {r["entity"]: r["n"] for r in Q.q1_summary_counts(graph).collect()}
    assert got["entries"] == 3
    assert got["boundEntities"] == 4
    assert got["cognateLigands"] == 6


def test_q2_unambiguous(graph):
    r = Q.q2_similarity_counts(graph, parity_cutoff=0.40).collect()[0]
    assert r["n_matched_entities"] == 3   # ATP be, NAD be, NA be
    assert r["n_unambiguous"] == 2        # NAD→101 only; NA→106 only
    # raising the cutoff prunes matches
    r2 = Q.q2_similarity_counts(graph, parity_cutoff=0.90).collect()[0]
    assert r2["n_matched_entities"] == 1


def test_q4_report_card_modes(graph):
    any_mode = {
        r["pdbEntry"]: r for r in Q.q4_report_card(graph, cognate_mode="Any").collect()
    }
    assert any_mode["1abc"]["n_cognate_matches"] == 3
    best_mode = {
        r["pdbEntry"]: r for r in Q.q4_report_card(graph, cognate_mode="Best").collect()
    }
    assert best_mode["1abc"]["n_cognate_matches"] == 2  # the 0.80 tie pair
    # every pdb appears even with zero matches (left joins)
    assert set(any_mode) == {"1abc", "2xyz", "3pqr"}
    assert any_mode["3pqr"]["n_cognate_matches"] == 0


def test_q5_interactions(graph):
    rows = Q.q5_domain_interactions(graph, "1abc").collect()
    assert len(rows) == 2
    got = {r["domain"]: r for r in rows}
    assert got["1abc:A:c1"]["contact_pct"] == 80.0
    assert got["1abc:A:c1"]["min_interface_residue"] == 99


def test_q6_best_any_all(graph):
    best = Q.q6_ligand_table(graph, "1abc", cognate_mode="Best")
    assert sorted(r["cognateLigand"] for r in best.collect()) == [101, 102]
    anym = Q.q6_ligand_table(graph, "1abc", cognate_mode="Any")
    assert anym.count() == 3
    # All keeps the unmatched bound entity with null cognate
    allm = Q.q6_ligand_table(graph, "3pqr", cognate_mode="All")
    rows = allm.collect()
    assert len(rows) == 1 and rows[0]["cognateLigand"] is None


def test_q7_q8_group_rollup(graph):
    roll = Q.q7_group_rollup(graph, domain_kind="CATH", parity_cutoff=0.40)
    got = {
        (r["groupAccession"], r["cognateLigand"]): r["n_domains"]
        for r in roll.collect()
    }
    assert got[("2.40.110.10", 101)] == 2  # 1abc:c1 and 2xyz:c1
    pct = Q.q8_group_binding_pct(graph, domain_kind="CATH", parity_cutoff=0.40)
    prow = {
        (r["groupAccession"], r["cognateLigand"]): r["pct_binding"]
        for r in pct.collect()
    }
    # group 2.40.110.10 has 3 domain instances; 2 bind cognate 101
    assert prow[("2.40.110.10", 101)] == round(2 * 100.0 / 3, 2)


def test_q9_combinatorial_excludes_minor(graph):
    combos = Q.q9_combinatorial(graph, domain_kind="CATH").collect()
    labels = {tuple(r["combination"]) for r in combos}
    # u1 ATP: c1 dominant(0.8)... c2 partner-ish? — no combination may
    # contain a 'minor' mode label
    assert all("minor" not in ",".join(t) for t in labels)


def test_q10_cognate_to_pdbs(graph):
    got = {r["pdbEntry"]: r for r in Q.q10_cognate_to_pdbs(graph, 101).collect()}
    assert set(got) == {"1abc", "2xyz"}
    assert got["2xyz"]["best_score"] == 0.95


def test_q11_ec_walk(graph):
    rows = Q.q11_ec_walk(graph).collect()
    byec = {r["ecID"]: r for r in rows}
    assert byec["1.1.1.1"]["ecClass"] == "1.-.-.-"
    assert byec["2.2.2.4"]["ecSubSubClass"] == "2.2.2.-"


def test_q12_array_membership(graph):
    rows = Q.q12_chains_for_ec(graph, "1.1.1.1").collect()
    # chains built by the pipeline: 1abc chain A and the 2xyz Pfam chain B
    assert {r["pdbProteinChain"] for r in rows} == {"1abc_A", "2xyz_B"}


def test_q13_compare_groups(graph):
    r = Q.q13_compare_domain_groups(
        graph, "2.40.110.10", "3.20.20.100", domain_kind="CATH"
    ).collect()[0]
    # c1-group entities: ATP(101,102,103) + NAD(101) + XYZ(none);
    # c2 group (3.20.20.100) interacts with ATP only → {101,102,103}
    assert set(r["shared"]) == {101, 102, 103}
    assert set(r["only_a"]) == set()
    assert set(r["only_b"]) == set()


def test_q14_descriptor_page(spark, graph):
    lid = (
        graph.nodes["boundDescriptor"]
        .filter(F.col("hetCode") == "ATP")
        .collect()[0]["ligandEntityID"]
    )
    rows = Q.q14_descriptor_page(graph, lid).collect()
    assert rows[0]["n_instances"] == 1
    assert rows[0]["n_cognate_matches"] == 3


def test_q15_neighborhood(graph):
    nodes, edges = Q.q15_neighborhood(graph, "1abc")
    rels = {r["rel"] for r in edges.collect()}
    assert rels == {"IS_IN_PDB", "INTERACTS_WITH_LIGAND", "HAS_SIMILARITY"}
    assert nodes.count() > 4


def test_q16_payload(graph):
    rows = Q.q16_viewer_payload(graph, "1abc").collect()
    assert all(r["payload"].startswith('{"domain"') for r in rows)


def test_sql_surface(spark, graph):
    """SURVEY §3.3: registered views make arbitrary SQL the public
    query surface replacing ad-hoc Cypher."""
    graph.register_views(spark)
    got = spark.sql(
        """
        SELECT b.pdbEntry, COUNT(DISTINCT s.cognateLigand) AS n
        FROM boundEntity b
        JOIN HAS_SIMILARITY s ON b.uniqueID = s.uniqueID
        WHERE s.parityScore >= 0.40
        GROUP BY b.pdbEntry ORDER BY n DESC
        """
    ).collect()
    assert got[0]["pdbEntry"] == "1abc" and got[0]["n"] == 3


def test_graph_save_load_roundtrip(spark, graph, tmp_path):
    from procoggraph_spark.graph.model import ProCogGraph

    root = str(tmp_path / "graph")
    graph.save(root)
    g2 = ProCogGraph.load(spark, root)
    assert set(g2.nodes) == set(graph.nodes)
    assert g2.edges["HAS_SIMILARITY"].count() == graph.edges["HAS_SIMILARITY"].count()
