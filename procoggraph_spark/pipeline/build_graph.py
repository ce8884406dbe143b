"""Graph-build stage (SURVEY §3.1 PRODUCE_NEO4J_FILES).

Turns the pipeline intermediates into the engine's node/edge tables
(`nextflow/bin/produce_neo4j_files.py` equivalents). Differences by
design, per SURVEY §1.3 / §7:

- dense `reset_index` ids → deterministic `xxhash64` ids (rerun-stable
  under any partitioning);
- the 7 copy-pasted per-domain-db table builds (`produce_neo4j_files.py:
  430-519`) → ONE interaction edge table carrying `domainKind`,
  partitionable by kind at write time;
- arrays stay ArrayType; '|'-serialization happens only in the export
  sink (sources/sinks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from procoggraph_spark.functions.chem import stable_id_from_string
from procoggraph_spark.graph.model import ProCogGraph


def build_entry_nodes(combined_contacts: DataFrame) -> DataFrame:
    """entry nodes (`produce_neo4j_files.py:113-124`): one per pdb_id,
    descriptor text scrubbed of newlines (F5)."""
    return (
        combined_contacts.select(
            F.col("pdb_id").alias("pdbEntry"),
            F.regexp_replace(F.coalesce("pdb_descriptor", F.lit("")), r"[\n\"']", " ").alias(
                "pdbDescriptor"
            ),
            F.regexp_replace(F.coalesce("pdb_title", F.lit("")), r"[\n\"']", " ").alias(
                "pdbTitle"
            ),
            F.regexp_replace(F.coalesce("pdb_keywords", F.lit("")), r"[\n\"']", " ").alias(
                "pdbKeywords"
            ),
        )
        .dropDuplicates(["pdbEntry"])
    )


def build_bound_entity_nodes(combined_contacts: DataFrame) -> DataFrame:
    """boundEntity nodes (`produce_neo4j_files.py:377-386`)."""
    return combined_contacts.select(
        F.col("uniqueID"),
        F.col("pdb_id").alias("pdbEntry"),
        F.col("hetCode"),
        F.col("description"),
        F.col("descriptor"),
        F.col("type"),
        F.col("bound_ligand_residue_interactions").alias("boundLigandResidues"),
    ).dropDuplicates(["uniqueID"])


def build_bound_descriptor_nodes(combined_contacts: DataFrame) -> DataFrame:
    """boundDescriptor nodes: unique (hetCode, description, descriptor)
    chemotypes (`process_all_pdb_contacts.py:222-229`,
    `produce_neo4j_files.py:387-394`). The reference's reset_index dense
    id becomes a stable hash of the natural key."""
    return (
        combined_contacts.select("hetCode", "description", "descriptor")
        .dropDuplicates()
        .withColumn(
            "ligandEntityID",
            stable_id_from_string(
                F.concat_ws("", "hetCode", "description", "descriptor")
            ),
        )
    )


def build_described_by_edges(
    bound_entities: DataFrame, bound_descriptors: DataFrame
) -> DataFrame:
    """DESCRIBED_BY: boundEntity→boundDescriptor on the chemotype key."""
    return bound_entities.join(
        F.broadcast(bound_descriptors), ["hetCode", "description", "descriptor"]
    ).select("uniqueID", "ligandEntityID")


def build_interaction_edges(combined_contacts: DataFrame) -> DataFrame:
    """INTERACTS_WITH_LIGAND (`produce_neo4j_files.py:430-440` ×7 →
    one table): domain→boundEntity with contact statistics.

    `allProteinInterface` (union of residue tokens across chains per
    bound entity, chain-prefixed) is the A9 grouped-union pattern."""
    base = combined_contacts.select(
        F.col("domain_accession").alias("domain"),
        "uniqueID",
        F.col("xref_db").alias("domainKind"),
        F.col("domain_contact_counts").cast("long").alias("domainContactCounts"),
        F.col("domain_contact_perc").alias("domainContactPerc"),
        F.col("domain_hbond_counts").cast("long").alias("domainHbondCounts"),
        F.col("domain_hbond_perc").alias("domainHbondPerc"),
        F.col("domain_covalent_counts").cast("long").alias("domainCovalentCounts"),
        F.col("domain_ownership").alias("interactionMode"),
        F.split("bound_ligand_residue_interactions", r"\|").alias("ligandInterface"),
        F.split("domain_residue_interactions", r"\|").alias("proteinInterface"),
        "assembly_chain_id_protein",
    ).dropDuplicates(["domain", "uniqueID", "domainKind"])

    all_iface = (
        base.select(
            "uniqueID",
            F.explode(
                F.transform(
                    "proteinInterface",
                    lambda r: F.concat(F.col("assembly_chain_id_protein"), F.lit(":"), r),
                )
            ).alias("_tok"),
        )
        .groupBy("uniqueID")
        .agg(F.array_sort(F.collect_set("_tok")).alias("allProteinInterface"))
    )
    return base.join(all_iface, "uniqueID", "left").drop("assembly_chain_id_protein")


def build_similarity_edges(
    parity_scores: DataFrame,
    bound_entities_ec: DataFrame,
    *,
    threshold: float = 0.40,
) -> DataFrame:
    """HAS_SIMILARITY (`produce_neo4j_files.py:404-428`):

    - drop errored calcs, threshold on score;
    - join bound entities to scores on (chemotype id, EC) after
      exploding both EC lists;
    - group-by-rest collecting the EC list (A2);
    - bestCognate: per bound entity, 'Y' where score == max (ties all
      'Y' — `:423-425`, README.md:171), else 'N' (W2).

    parity_scores: (ec, pdb_ligand, cognate_ligand, score,
                    pdbl_subparity, parity_smarts, error)
    bound_entities_ec: (uniqueID, ligandEntityID, ecList array)
    """
    scores = parity_scores.filter(F.col("error").isNull()).filter(
        F.col("score") >= threshold
    )
    be = bound_entities_ec.select(
        "uniqueID", "ligandEntityID", F.explode("ecList").alias("ec")
    )
    joined = be.join(
        scores,
        (be.ligandEntityID == scores.pdb_ligand) & (be.ec == scores.ec),
    ).select(
        "uniqueID",
        "cognate_ligand",
        F.col("score"),
        F.col("pdbl_subparity"),
        F.col("parity_smarts"),
        be.ec.alias("_ec"),
    )
    grouped = joined.groupBy(
        "uniqueID", "cognate_ligand", "score", "pdbl_subparity", "parity_smarts"
    ).agg(F.array_sort(F.collect_set("_ec")).alias("ecList"))
    w = Window.partitionBy("uniqueID")
    return (
        grouped.withColumn("_max", F.max("score").over(w))
        .withColumn(
            "bestCognate", F.when(F.col("score") == F.col("_max"), "Y").otherwise("N")
        )
        .drop("_max")
        .select(
            "uniqueID",
            F.col("cognate_ligand").alias("cognateLigand"),
            F.col("score").alias("parityScore"),
            F.col("pdbl_subparity").alias("subParityScore"),
            F.col("parity_smarts").alias("paritySMARTS"),
            "ecList",
            "bestCognate",
        )
    )


def build_domain_nodes(combined_contacts: DataFrame) -> DataFrame:
    """Domain instance nodes, one table for all 7 kinds (template over
    `produce_neo4j_files.py:144-290`): key = pdb:chain:acc, group key =
    the accession used for hierarchy membership."""
    return combined_contacts.select(
        F.col("domain_accession").alias("domain"),
        F.col("xref_db_acc").alias("domainAccession"),
        F.col("xref_db_acc").alias("groupAccession"),
        F.col("pdb_id").alias("pdbEntry"),
        F.col("xref_db").alias("type"),
    ).dropDuplicates(["domain", "type"])


def _chain_key(combined_contacts: DataFrame):
    """chainUniqueID = pdb_id + "_" + proteinStructAsymID
    (`produce_neo4j_files.py:125-146`). Pipelines that only carry the
    assembly chain id (e.g. "A_1") derive the struct asym by stripping
    the assembly-copy suffix."""
    if "proteinStructAsymID" in combined_contacts.columns:
        asym = F.col("proteinStructAsymID")
    else:
        asym = F.regexp_extract("assembly_chain_id_protein", r"^([^_]+)", 1)
    return F.concat_ws("_", F.col("pdb_id"), asym)


def build_protein_chain_nodes(combined_contacts: DataFrame) -> DataFrame:
    """proteinChain nodes (`produce_neo4j_files.py:125-146`): one row per
    (chainUniqueID, originalEC); updatedEC flags a complete original EC
    whose resolved ecList differs (transfer applied), partialEC flags a
    dash-containing original annotation."""
    cc = combined_contacts
    if "protein_entity_ec" in cc.columns:
        original = F.col("protein_entity_ec")
    else:
        original = F.array_join("ecList", ",")
    base = cc.select(
        _chain_key(cc).alias("pdbProteinChain"),
        F.col("pdb_id").alias("pdbEntry"),
        original.alias("_originalEC"),
        F.col("ecList"),
    ).dropDuplicates(["pdbProteinChain", "_originalEC"])
    resolved = F.array_join("ecList", ",")
    return base.select(
        "pdbProteinChain",
        "pdbEntry",
        F.col("pdbProteinChain").alias("chainUniqueID"),
        "ecList",
        F.when(
            (~F.col("_originalEC").contains("-")) & (F.col("_originalEC") != resolved),
            "True",
        )
        .otherwise("False")
        .alias("updatedEC"),
        F.when(F.col("_originalEC").contains("-"), "True")
        .otherwise("False")
        .alias("partialEC"),
    )


def build_chain_edges(
    combined_contacts: DataFrame, protein_chains: DataFrame
) -> dict[str, DataFrame]:
    """Chain relationship tables (`produce_neo4j_files.py:523-548`,
    `import_neo4j_data.sh:62-77`):

    - chain→entry   IS_IN_PDB (pdb_protein_rels)
    - domain→chain  IS_IN_PROTEIN_CHAIN (7 *_protein_rels → one table)
    - chain→EC      IS_IN_EC (protein_ec_rels; '?'/'' dropped)
    """
    cc = combined_contacts
    chain = _chain_key(cc)
    return {
        "IS_IN_PDB": protein_chains.select(
            F.col("pdbProteinChain").alias("src"),
            F.col("pdbEntry").alias("dst"),
            F.lit("proteinChain").alias("srcLabel"),
        ).dropDuplicates(["src", "dst"]),
        "IS_IN_PROTEIN_CHAIN": cc.select(
            F.col("domain_accession").alias("src"), chain.alias("dst")
        ).dropDuplicates(),
        "IS_IN_EC": (
            protein_chains.select(
                F.col("pdbProteinChain").alias("src"),
                F.explode("ecList").alias("ecID"),
            )
            .filter(~F.col("ecID").isin("?", "") & F.col("ecID").isNotNull())
            .dropDuplicates()
            .withColumn("srcLabel", F.lit("proteinChain"))
        ),
    }


def build_cognate_ec_edges(similarity_edges: DataFrame) -> DataFrame:
    """cognateLigand→ecID IS_IN_EC rows (`produce_neo4j_files.py:101-103`
    `cognate_ligands_ec`). The reference reads the EC straight off the
    cognate-ligand table; this engine's cognate input has no EC column,
    so the association is recovered from the scored pairs' ecList —
    the same (cognate, EC) universe restricted to cognates that matched."""
    return (
        similarity_edges.select(
            F.col("cognateLigand").cast("string").alias("src"),
            F.explode("ecList").alias("ecID"),
        )
        .dropDuplicates()
        .withColumn("srcLabel", F.lit("cognateLigand"))
    )


# domain databases whose accessions encode their hierarchy as dotted
# prefixes (CATH "2.40.110.10" → 2 / 2.40 / 2.40.110 / 2.40.110.10;
# SCOP sccs likewise). Pfam clans and SCOP2 levels are opaque ids and
# need an explicit mapping table (reference: pfam clan_acc columns,
# get_scop2_domains_info).
_DOTTED_KINDS = {"CATH", "SCOP", "G3DSA"}


def build_classification_hierarchy(
    domains: DataFrame,
    kind,
    *,
    mapping: DataFrame | None = None,
    level_names: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """One domain database's classification-hierarchy node tables and
    IS_IN_* edges (`produce_neo4j_files.py:288-361,363-368` ×4 families
    → ONE parameterized builder; edge naming per
    `import_neo4j_data.sh:24-66`).

    ``domains``: the domain node slice (columns domain, groupAccession).
    Levels come from ``kind.hierarchy`` (leaf-first). Dotted-accession
    kinds derive each level as a dot-prefix of groupAccession; other
    kinds join ``mapping`` (groupAccession → level columns, optional
    ``<level>_description`` columns).

    Edges are (src=child, dst=parent), named after the parent level:
    domain→leaf gets IS_IN_<leaf>, level_i→level_{i+1} gets
    IS_IN_<level_{i+1}> — so a walk follows dst pointers rootward.

    ``level_names``: optional (accession, description) table — the shape
    of cath-names / scop des files (sources/readers.py:read_cath_names,
    scop_level_names) — broadcast-joined onto every level's node table,
    the reference's name decoration (`produce_neo4j_files.py:288-361`,
    cath_*_name / *_description joins). A mapping-supplied
    ``<level>_description`` wins over the names file where both exist.
    """
    from procoggraph_spark.graph.model import hierarchy_edge_name

    levels = list(kind.hierarchy)
    if not levels:
        return {}
    if mapping is not None:
        base = domains.select("domain", "groupAccession").join(
            F.broadcast(mapping), "groupAccession"
        )
    elif kind.key in _DOTTED_KINDS:
        n = len(levels)
        parts = F.split(F.col("groupAccession"), r"\.")
        base = (
            domains.filter(
                F.col("groupAccession").isNotNull() & (F.size(parts) >= n)
            ).select(
                "domain",
                "groupAccession",
                *[
                    F.array_join(F.slice(parts, 1, n - i), ".").alias(levels[i])
                    for i in range(n)
                ],
            )
        )
    else:
        return {}

    names = (
        level_names.select(
            F.col("accession").alias("_acc"), F.col("description").alias("_ndesc")
        ).dropDuplicates(["_acc"])
        if level_names is not None
        else None
    )
    out: dict[str, DataFrame] = {}
    for lvl in levels:
        desc = f"{lvl}_description"
        node = base.select(
            F.col(lvl),
            (
                F.col(desc) if desc in base.columns else F.lit(None).cast("string")
            ).alias("description"),
        ).dropDuplicates([lvl])
        if names is not None:
            node = (
                node.join(F.broadcast(names), node[lvl] == names["_acc"], "left")
                .select(
                    F.col(lvl),
                    F.coalesce("description", "_ndesc").alias("description"),
                )
            )
        out[lvl] = node
    # srcLabel disambiguates merged tables: IS_IN_CATH_TOPOLOGY holds both
    # gene3dDomain→topology (G3DSA leaf) and cathHomologousSuperfamily→
    # topology (CATH level) rows — the reference separates them via Neo4j
    # node labels, so walks must filter on the src's label here.
    out[hierarchy_edge_name(levels[0])] = base.select(
        F.col("domain").alias("src"),
        F.col(levels[0]).alias("dst"),
        F.lit(kind.node_table).alias("srcLabel"),
    ).dropDuplicates()
    for child, parent in zip(levels, levels[1:]):
        out[hierarchy_edge_name(parent)] = base.select(
            F.col(child).alias("src"),
            F.col(parent).alias("dst"),
            F.lit(child).alias("srcLabel"),
        ).dropDuplicates()
    return out


def build_ec_nodes_and_edges(ec_records: DataFrame) -> dict[str, DataFrame]:
    """EC hierarchy nodes + IS_IN_* edges from resolved EC records
    (`produce_neo4j_files.py:30-68` equivalent; rollup via
    operators.ec.ec_hierarchy_cols)."""
    from procoggraph_spark.operators.ec import ec_hierarchy_cols

    leaves = ec_hierarchy_cols(
        ec_records.filter(F.col("DE") != "Deleted entry.").select("TRANSFER", "DE").distinct(),
        "TRANSFER",
    )
    return {
        "ecID": leaves.select(
            F.col("TRANSFER").alias("ecID"), F.col("DE").alias("description")
        ).dropDuplicates(["ecID"]),
        "ecSubSubClass": leaves.select("ecSubSubClass").distinct().withColumn(
            "description", F.lit(None).cast("string")
        ),
        "ecSubClass": leaves.select("ecSubClass").distinct().withColumn(
            "description", F.lit(None).cast("string")
        ),
        "ecClass": leaves.select("ecClass").distinct().withColumn(
            "description", F.lit(None).cast("string")
        ),
        "IS_IN_SUBSUBCLASS": leaves.select(
            F.col("TRANSFER").alias("ecID"), "ecSubSubClass"
        ).distinct(),
        "IS_IN_SUBCLASS": leaves.select("ecSubSubClass", "ecSubClass").distinct(),
        "IS_IN_CLASS": leaves.select("ecSubClass", "ecClass").distinct(),
    }


def build_graph(
    combined_contacts: DataFrame,
    parity_scores: DataFrame,
    cognate_ligands: DataFrame,
    ec_records: DataFrame | None = None,
    *,
    parity_threshold: float = 0.40,
    hierarchy_mappings: dict[str, DataFrame] | None = None,
    hierarchy_names: dict[str, DataFrame] | None = None,
    chebi_cofactors: DataFrame | None = None,
) -> ProCogGraph:
    """Assemble the full graph from pipeline intermediates.

    ``hierarchy_mappings``: optional per-kind (key = DomainKind.key)
    accession→level tables for the non-dotted classification families
    (Pfam clans, SCOP2); dotted families (CATH/SCOP/G3DSA) derive their
    hierarchies from the accessions directly.

    ``hierarchy_names``: optional per-kind (accession, description)
    tables (cath-names / scop des / scop2 des via sources/readers) that
    decorate the level node tables with display names.

    ``chebi_cofactors``: optional ChEBI ``has_role`` classification
    table (``FINAL_ID``, ``isCofactor``). When given, the U7 cofactor
    priority resolution (`get_ec_information.py:673-691`) recomputes
    ``cognate_ligands.isCofactor`` from the ligand_db CHEBI xrefs;
    otherwise any incoming ``isCofactor`` column passes through."""
    if chebi_cofactors is not None:
        from procoggraph_spark.functions.chem import resolve_cofactor_classes

        cognate_ligands = resolve_cofactor_classes(
            cognate_ligands, chebi_cofactors
        )
    g = ProCogGraph()
    g.nodes["entry"] = build_entry_nodes(combined_contacts)
    bes = build_bound_entity_nodes(combined_contacts)
    g.nodes["boundEntity"] = bes
    bds = build_bound_descriptor_nodes(combined_contacts)
    g.nodes["boundDescriptor"] = bds
    g.nodes["cognateLigand"] = cognate_ligands.select(
        F.col("uniqueID"),
        F.col("canonical_smiles").alias("canonicalSMILES"),
        F.col("compound_name").alias("compoundName"),
        F.col("ligand_db").alias("ligandDB"),
        F.col("compound_reaction").alias("compoundReaction"),
        F.col("isCofactor"),
    ).dropDuplicates(["uniqueID"])
    g.nodes["domain"] = build_domain_nodes(combined_contacts)

    g.edges["DESCRIBED_BY"] = build_described_by_edges(bes, bds)
    g.edges["INTERACTS_WITH_LIGAND"] = build_interaction_edges(combined_contacts)
    g.edges["IS_IN_PDB"] = bes.select(
        F.col("uniqueID").alias("src"),
        F.col("pdbEntry").alias("dst"),
        F.lit("boundEntity").alias("srcLabel"),
    )

    if "ecList" in combined_contacts.columns:
        pcs = build_protein_chain_nodes(combined_contacts)
        g.nodes["proteinChain"] = pcs
        chain_edges = build_chain_edges(combined_contacts, pcs)
        g.edges["IS_IN_PDB"] = g.edges["IS_IN_PDB"].unionByName(
            chain_edges["IS_IN_PDB"]
        )
        g.edges["IS_IN_PROTEIN_CHAIN"] = chain_edges["IS_IN_PROTEIN_CHAIN"]
        g.edges["IS_IN_EC"] = chain_edges["IS_IN_EC"]

    if "ecList" in combined_contacts.columns:
        be_ec = (
            combined_contacts.select("uniqueID", "hetCode", "description", "descriptor", "ecList")
            .dropDuplicates(["uniqueID"])
            .join(F.broadcast(bds), ["hetCode", "description", "descriptor"])
            .select("uniqueID", "ligandEntityID", "ecList")
        )
        g.edges["HAS_SIMILARITY"] = build_similarity_edges(
            parity_scores, be_ec, threshold=parity_threshold
        )
        cog_ec = build_cognate_ec_edges(g.edges["HAS_SIMILARITY"])
        g.edges["IS_IN_EC"] = (
            g.edges["IS_IN_EC"].unionByName(cog_ec)
            if "IS_IN_EC" in g.edges
            else cog_ec
        )

    if ec_records is not None:
        for name, df in build_ec_nodes_and_edges(ec_records).items():
            (g.edges if name.startswith("IS_IN") else g.nodes)[name] = df

    # classification hierarchies: one builder call per domain database;
    # same-named outputs merge (CATH and G3DSA share the cath* chain,
    # as in the reference's pd.concat node builds)
    from procoggraph_spark.graph.model import DOMAIN_KINDS

    mappings = hierarchy_mappings or {}
    names = hierarchy_names or {}
    for kind in DOMAIN_KINDS.values():
        slice_ = g.nodes["domain"].filter(F.col("type") == kind.key)
        built = build_classification_hierarchy(
            slice_, kind, mapping=mappings.get(kind.key),
            level_names=names.get(kind.key),
        )
        for name, df in built.items():
            coll = g.edges if name.startswith("IS_IN") else g.nodes
            if name not in coll:
                coll[name] = df
            elif name.startswith("IS_IN"):
                coll[name] = coll[name].unionByName(df).dropDuplicates()
            else:
                # shared level tables (CATH+G3DSA both mint cathTopology):
                # one row per accession, non-null description wins (max
                # skips nulls) — mirrors the reference's pd.concat +
                # drop_duplicates over name-decorated frames
                coll[name] = (
                    coll[name]
                    .unionByName(df)
                    .groupBy(name)
                    .agg(F.max("description").alias("description"))
                )
    g.nodes["procoggraph"] = build_stats_node(g)
    return g


def build_stats_node(g: ProCogGraph, *, version: str = "1.0") -> DataFrame:
    """The singleton `procoggraph` stats node
    (`produce_neo4j_files.py:550-562`): precomputed distinct counts the
    dashboard summary reads without touching the big tables. One
    crossJoin chain of single-row aggregates — no data movement beyond
    the four count jobs."""
    entry = g.nodes["entry"].agg(F.countDistinct("pdbEntry").alias("num_entries"))
    be = g.nodes["boundEntity"].agg(
        F.countDistinct("uniqueID").alias("num_bound_molecules")
    )
    bd = g.nodes["boundDescriptor"].agg(
        F.countDistinct("ligandEntityID").alias("num_bound_descriptors")
    )
    cl = g.nodes["cognateLigand"].agg(
        F.countDistinct("uniqueID").alias("num_cognate_ligands")
    )
    return (
        entry.crossJoin(be)
        .crossJoin(bd)
        .crossJoin(cl)
        .select(
            F.lit("procoggraph").alias("procoggraph"),
            F.lit("ProCogGraph").alias("name"),
            F.lit(version).alias("databaseVersion"),
            "num_entries",
            "num_bound_molecules",
            "num_bound_descriptors",
            "num_cognate_ligands",
        )
    )
