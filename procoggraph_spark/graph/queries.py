"""The dashboard query layer: Q1-Q16 (SURVEY §2.9) as parameterized
DataFrame plans over a ProCogGraph.

Session parameters of the reference dashboard map to function args:

- ``parity_cutoff``  ($neodash_parity_score_cutoff)
- ``domain_kind``    ($neodash_domain_type — picks the domain-db slice;
                      the 7-way apoc.case becomes a filter on one table)
- ``cognate_mode``   ($neodash_max_cognate ∈ {Best, Any, All} — changes
                      predicate AND join type, README.md:159-171)

Every query is ≤6-way equi-join + aggregation; dimension sides are
broadcast. All queries also run as SQL after
``graph.register_views(spark)`` (SURVEY §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from procoggraph_spark.graph.model import ProCogGraph


def _dom(g: ProCogGraph, domain_kind: str | None) -> DataFrame:
    d = g.nodes["domain"]
    return d.filter(F.col("type") == domain_kind) if domain_kind else d


def _iwl(g: ProCogGraph, domain_kind: str | None) -> DataFrame:
    e = g.edges["INTERACTS_WITH_LIGAND"]
    return e.filter(F.col("domainKind") == domain_kind) if domain_kind else e


def _similarity(
    g: ProCogGraph, *, parity_cutoff: float, cognate_mode: str
) -> DataFrame:
    """The Best/Any tri-state predicate on HAS_SIMILARITY ('All' is a
    join-type change handled at the call site — SURVEY 'what's hard')."""
    s = g.edges["HAS_SIMILARITY"].filter(F.col("parityScore") >= parity_cutoff)
    if cognate_mode == "Best":
        s = s.filter(F.col("bestCognate") == "Y")
    return s


# Q1: global summary counts (neodash_queries.yaml:1-21)
def q1_summary_counts(g: ProCogGraph) -> DataFrame:
    parts = []
    for label, table, key in (
        ("entries", "entry", "pdbEntry"),
        ("boundEntities", "boundEntity", "uniqueID"),
        ("cognateLigands", "cognateLigand", "uniqueID"),
        ("domains", "domain", "domain"),
    ):
        if table in g.nodes:
            parts.append(
                g.nodes[table].agg(
                    F.lit(label).alias("entity"), F.countDistinct(key).alias("n")
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Q2: threshold-filtered counts + unambiguous (exactly-1-cognate) count
def q2_similarity_counts(g: ProCogGraph, *, parity_cutoff: float = 0.40) -> DataFrame:
    s = g.edges["HAS_SIMILARITY"].filter(F.col("parityScore") >= parity_cutoff)
    per_be = s.groupBy("uniqueID").agg(F.countDistinct("cognateLigand").alias("n_cog"))
    return per_be.agg(
        F.count("*").alias("n_matched_entities"),
        F.coalesce(
            F.sum(F.when(F.col("n_cog") == 1, 1).otherwise(0)), F.lit(0)
        ).alias("n_unambiguous"),
    )


# Q3: substring entity search, ordered by length, LIMIT 5
def q3_search(g: ProCogGraph, query: str, *, limit: int = 5) -> DataFrame:
    q = query.upper()
    return (
        g.nodes["boundEntity"]
        .filter(
            F.upper("hetCode").contains(q) | F.upper("description").contains(q)
        )
        .orderBy(F.length("description"), "uniqueID")
        .limit(limit)
        .select("uniqueID", "hetCode", "description")
    )


# Q4: PDB report card (dashboard.json:453)
def q4_report_card(
    g: ProCogGraph,
    pdb_id: str | None = None,
    *,
    parity_cutoff: float = 0.40,
    cognate_mode: str = "Any",
    domain_kind: str | None = None,
) -> DataFrame:
    be = g.nodes["boundEntity"]
    if pdb_id:
        be = be.filter(F.col("pdbEntry") == pdb_id)
    iwl = _iwl(g, domain_kind).select("uniqueID", "domain")
    dom = _dom(g, domain_kind).select("domain", "groupAccession")
    sim = _similarity(g, parity_cutoff=parity_cutoff, cognate_mode=cognate_mode).select(
        "uniqueID", "cognateLigand"
    )
    joined = (
        be.join(iwl, "uniqueID", "left")
        .join(F.broadcast(dom), "domain", "left")
        .join(sim, "uniqueID", "left")
    )
    return joined.groupBy("pdbEntry").agg(
        F.countDistinct("uniqueID").alias("n_bound_entities"),
        F.countDistinct("domain").alias("n_domains"),
        F.countDistinct("groupAccession").alias("n_domain_groups"),
        F.countDistinct("cognateLigand").alias("n_cognate_matches"),
        F.array_join(F.array_sort(F.collect_set("groupAccession")), "|").alias(
            "domain_groups"
        ),
    )


# Q5: per-PDB domain-interaction table (dashboard.json:716)
def q5_domain_interactions(
    g: ProCogGraph, pdb_id: str, *, domain_kind: str | None = None
) -> DataFrame:
    iwl = _iwl(g, domain_kind)
    be = g.nodes["boundEntity"].filter(F.col("pdbEntry") == pdb_id).select(
        "uniqueID", "hetCode", "description"
    )
    return (
        iwl.join(be, "uniqueID")
        .select(
            "uniqueID",
            "hetCode",
            "description",
            "domain",
            "domainKind",
            "interactionMode",
            F.round(F.col("domainContactPerc") * 100, 2).alias("contact_pct"),
            F.size("proteinInterface").alias("n_interface_residues"),
            F.array_min(F.transform("proteinInterface",
                lambda r: F.regexp_extract(r, r"^(\d+)", 1).try_cast("int"))).alias(
                "min_interface_residue"
            ),
        )
    )


# Q6: per-PDB ligand table with Best/Any/All branching (dashboard.json:823)
def q6_ligand_table(
    g: ProCogGraph,
    pdb_id: str,
    *,
    parity_cutoff: float = 0.40,
    cognate_mode: str = "Any",
) -> DataFrame:
    be = g.nodes["boundEntity"].filter(F.col("pdbEntry") == pdb_id)
    cog = g.nodes["cognateLigand"].select(
        F.col("uniqueID").alias("cognateLigand"),
        "compoundName",
        "isCofactor",
    )
    sim = _similarity(g, parity_cutoff=parity_cutoff, cognate_mode=cognate_mode)
    join_type = "left" if cognate_mode == "All" else "inner"
    return (
        be.join(sim, "uniqueID", join_type)
        .join(F.broadcast(cog), "cognateLigand", "left")
        .select(
            "uniqueID",
            "hetCode",
            "description",
            "cognateLigand",
            "compoundName",
            "parityScore",
            "bestCognate",
            "isCofactor",
        )
    )


# Q7: domain-group interaction rollup (dashboard.json:1010)
def q7_group_rollup(
    g: ProCogGraph,
    group_accession: str | None = None,
    *,
    domain_kind: str,
    parity_cutoff: float = 0.40,
) -> DataFrame:
    dom = _dom(g, domain_kind)
    if group_accession:
        dom = dom.filter(F.col("groupAccession") == group_accession)
    iwl = _iwl(g, domain_kind).select("uniqueID", "domain")
    sim = g.edges["HAS_SIMILARITY"].filter(F.col("parityScore") >= parity_cutoff)
    cog = g.nodes["cognateLigand"].select(
        F.col("uniqueID").alias("cognateLigand"), "compoundName"
    )
    return (
        iwl.join(F.broadcast(dom.select("domain", "groupAccession")), "domain")
        .join(sim.select("uniqueID", "cognateLigand"), "uniqueID")
        .join(F.broadcast(cog), "cognateLigand")
        .groupBy("groupAccession", "cognateLigand", "compoundName")
        .agg(
            F.countDistinct("domain").alias("n_domains"),
            F.countDistinct("uniqueID").alias("n_bound_entities"),
        )
    )


# Q8: % of domain group binding each ligand (neodash_queries.yaml:123-144)
def q8_group_binding_pct(
    g: ProCogGraph, *, domain_kind: str, parity_cutoff: float = 0.40
) -> DataFrame:
    dom = _dom(g, domain_kind).select("domain", "groupAccession")
    group_sizes = dom.groupBy("groupAccession").agg(
        F.countDistinct("domain").alias("n_group_domains")
    )
    binding = q7_group_rollup(g, domain_kind=domain_kind, parity_cutoff=parity_cutoff)
    return (
        binding.join(F.broadcast(group_sizes), "groupAccession")
        .withColumn(
            "pct_binding",
            F.round(F.col("n_domains") * 100.0 / F.col("n_group_domains"), 2),
        )
    )


# Q9: combinatorial interactions (dashboard.json:1134)
def q9_combinatorial(
    g: ProCogGraph, *, domain_kind: str | None = None, parity_cutoff: float = 0.40
) -> DataFrame:
    """Per (cognate ligand, bound entity): the sorted multiset of
    group:mode interaction labels (minor excluded), then group bound
    entities by that combination."""
    iwl = _iwl(g, domain_kind).filter(F.col("interactionMode") != "minor")
    dom = _dom(g, domain_kind).select("domain", "groupAccession")
    sim = g.edges["HAS_SIMILARITY"].filter(F.col("parityScore") >= parity_cutoff)
    be_combo = (
        iwl.join(F.broadcast(dom), "domain")
        .withColumn(
            "_label", F.concat_ws(":", "groupAccession", "interactionMode")
        )
        .groupBy("uniqueID")
        .agg(F.array_sort(F.collect_list("_label")).alias("combination"))
    )
    with_cog = be_combo.join(sim.select("uniqueID", "cognateLigand"), "uniqueID")
    return with_cog.groupBy("combination").agg(
        F.countDistinct("uniqueID").alias("n_bound_entities"),
        F.countDistinct("cognateLigand").alias("n_cognate_ligands"),
    )


# Q10: cognate ligand → PDB listing (dashboard.json:1045)
def q10_cognate_to_pdbs(g: ProCogGraph, cognate_id: int) -> DataFrame:
    sim = g.edges["HAS_SIMILARITY"].filter(F.col("cognateLigand") == cognate_id)
    be = g.nodes["boundEntity"].select("uniqueID", "pdbEntry")
    return (
        sim.join(be, "uniqueID")
        .groupBy("pdbEntry")
        .agg(
            F.countDistinct("uniqueID").alias("n_bound_entities"),
            F.max("parityScore").alias("best_score"),
        )
    )


# Q11: EC hierarchy walk (dashboard.json:359)
def q11_ec_walk(g: ProCogGraph) -> DataFrame:
    leaf = g.edges["IS_IN_SUBSUBCLASS"]
    sub = g.edges["IS_IN_SUBCLASS"]
    cls = g.edges["IS_IN_CLASS"]
    sim_ec = g.edges.get("IS_IN_EC")
    walk = (
        leaf.join(F.broadcast(sub), "ecSubSubClass")
        .join(F.broadcast(cls), "ecSubClass")
    )
    if sim_ec is not None:
        cog = sim_ec.filter(F.col("srcLabel") == "cognateLigand")
        walk = walk.join(cog, "ecID", "left")
        return walk.groupBy("ecClass", "ecSubClass", "ecSubSubClass", "ecID").agg(
            F.countDistinct("src").alias("n_cognate_ligands")
        )
    return walk.select("ecClass", "ecSubClass", "ecSubSubClass", "ecID")


# Q11b: classification-hierarchy walk — the CATH/SCOP/SCOP2/Pfam analog
# of the EC walk (domain-browse pages; import_neo4j_data.sh:24-66 chains)
def q11_domain_hierarchy_walk(g: ProCogGraph, *, domain_kind: str) -> DataFrame:
    """Root→leaf rollup over one domain database's hierarchy: one row
    per full classification path with its distinct-domain count. Level
    tables are dimension-sized → every edge join broadcasts; the only
    shuffle is the final rollup."""
    from procoggraph_spark.graph.model import DOMAIN_KINDS, hierarchy_edge_name

    kind = DOMAIN_KINDS[domain_kind]
    levels = list(kind.hierarchy)
    if not levels:
        raise ValueError(f"{domain_kind} declares no hierarchy")
    # Merged hierarchy tables mix source types (IS_IN_CATH_TOPOLOGY holds
    # both gene3dDomain leaf rows and cathHomologousSuperfamily level
    # rows); filter each hop to the expected src label — the Neo4j-label
    # disambiguation the reference gets for free.
    def _hop(name: str, src_label: str) -> DataFrame:
        e = g.edges[name]
        if "srcLabel" in e.columns:
            e = e.filter(F.col("srcLabel") == src_label)
        return e

    walk = _hop(hierarchy_edge_name(levels[0]), kind.node_table).select(
        F.col("src").alias("domain"), F.col("dst").alias(levels[0])
    )
    for child, parent in zip(levels, levels[1:]):
        e = _hop(hierarchy_edge_name(parent), child).select(
            F.col("src").alias(child), F.col("dst").alias(parent)
        )
        walk = walk.join(F.broadcast(e), child)
    return walk.groupBy(*reversed(levels)).agg(
        F.countDistinct("domain").alias("n_domains")
    )


# Q12: enzyme-focus — chains whose ecList contains $ec (dashboard.json:1833)
def q12_chains_for_ec(g: ProCogGraph, ec: str) -> DataFrame:
    pc = g.nodes["proteinChain"]
    return pc.filter(F.array_contains("ecList", ec)).select(
        "pdbProteinChain", "pdbEntry", "ecList"
    )


# Q13: Compare Domains — shared/unique cognate ligand sets (dashboard.json:2076)
def q13_compare_domain_groups(
    g: ProCogGraph,
    group_a: str,
    group_b: str,
    *,
    domain_kind: str,
    parity_cutoff: float = 0.40,
) -> DataFrame:
    """Shared / only-A / only-B cognate-ligand id sets of two domain
    groups, minor interactions excluded (T5/T6 set algebra)."""
    dom = _dom(g, domain_kind).select("domain", "groupAccession")
    iwl = _iwl(g, domain_kind).filter(F.col("interactionMode") != "minor")
    sim = g.edges["HAS_SIMILARITY"].filter(F.col("parityScore") >= parity_cutoff)
    ligs = (
        iwl.join(F.broadcast(dom), "domain")
        .join(sim.select("uniqueID", "cognateLigand"), "uniqueID")
        .filter(F.col("groupAccession").isin(group_a, group_b))
        .groupBy("groupAccession")
        .agg(F.collect_set("cognateLigand").alias("ligs"))
    )
    a = ligs.filter(F.col("groupAccession") == group_a).select(
        F.col("ligs").alias("a")
    )
    b = ligs.filter(F.col("groupAccession") == group_b).select(
        F.col("ligs").alias("b")
    )
    return a.crossJoin(b).select(
        F.array_sort(F.array_intersect("a", "b")).alias("shared"),
        F.array_sort(F.array_except("a", "b")).alias("only_a"),
        F.array_sort(F.array_except("b", "a")).alias("only_b"),
    )


# Q14: descriptor page — instances + cognate matches (dashboard.json:580)
def q14_descriptor_page(g: ProCogGraph, ligand_entity_id: int) -> DataFrame:
    db = g.edges["DESCRIBED_BY"].filter(F.col("ligandEntityID") == ligand_entity_id)
    be = g.nodes["boundEntity"].select("uniqueID", "pdbEntry", "hetCode")
    sim = g.edges["HAS_SIMILARITY"].select("uniqueID", "cognateLigand", "parityScore")
    return (
        db.join(be, "uniqueID")
        .join(sim, "uniqueID", "left")
        .groupBy("hetCode")
        .agg(
            F.countDistinct("uniqueID").alias("n_instances"),
            F.countDistinct("pdbEntry").alias("n_pdbs"),
            F.countDistinct("cognateLigand").alias("n_cognate_matches"),
        )
    )


# Q15: 2-hop neighborhood export for the graph view (dashboard.json:2321)
def q15_neighborhood(g: ProCogGraph, pdb_id: str) -> tuple[DataFrame, DataFrame]:
    """Returns (nodes, edges) frames of the entry's 2-hop neighborhood."""
    be = g.nodes["boundEntity"].filter(F.col("pdbEntry") == pdb_id)
    be_ids = be.select("uniqueID")
    iwl = g.edges["INTERACTS_WITH_LIGAND"].join(be_ids, "uniqueID", "left_semi")
    sim = g.edges["HAS_SIMILARITY"].join(be_ids, "uniqueID", "left_semi")
    edges = (
        be.select(
            F.col("uniqueID").alias("src"),
            F.col("pdbEntry").alias("dst"),
            F.lit("IS_IN_PDB").alias("rel"),
        )
        .unionByName(
            iwl.select(
                F.col("domain").alias("src"),
                F.col("uniqueID").alias("dst"),
                F.lit("INTERACTS_WITH_LIGAND").alias("rel"),
            )
        )
        .unionByName(
            sim.select(
                F.col("uniqueID").alias("src"),
                F.col("cognateLigand").cast("string").alias("dst"),
                F.lit("HAS_SIMILARITY").alias("rel"),
            )
        )
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return nodes, edges


# Q16: viewer payload projection (dashboard.json:699)
def q16_viewer_payload(g: ProCogGraph, pdb_id: str) -> DataFrame:
    iwl = g.edges["INTERACTS_WITH_LIGAND"]
    be = g.nodes["boundEntity"].filter(F.col("pdbEntry") == pdb_id).select(
        "uniqueID", "pdbEntry"
    )
    return iwl.join(be, "uniqueID").select(
        "uniqueID",
        F.to_json(
            F.struct(
                F.col("domain"),
                F.col("interactionMode"),
                F.col("proteinInterface"),
            )
        ).alias("payload"),
    )
