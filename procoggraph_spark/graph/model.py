"""The property-graph data model as node/edge DataFrames (SURVEY §1.2).

The reference bulk-loads ~50 TSVs into Neo4j (`nextflow/bin/
import_neo4j_data.sh:3-78`); here the same tables ARE the engine's
storage: one Parquet-backed DataFrame per node label / relationship
type, registered as temp views so `spark.sql` replaces ad-hoc Cypher
(SURVEY §3.3). Arrays stay typed (`ArrayType`) end-to-end; the `|`
delimiter exists only in the Neo4j-export sink (sources/sinks.py).

Scale posture: node/edge tables are written partitioned/bucketed by
their join keys (pdbEntry, uniqueID, domain) so the interactive query
shapes (Q4-Q6) co-locate; dimension-sized tables (hierarchies, EC) are
broadcast at join time.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- the 7-way domain-database template (SURVEY "what's hard": one
# parameterized family, not 7 copy-pasted table sets) ----------------------


@dataclass(frozen=True)
class DomainKind:
    """One domain database: its node table, group attribute, and
    hierarchy chain (root-first)."""

    key: str                 # xref_db value in contacts, e.g. "CATH"
    node_table: str          # e.g. "cathDomain"
    group_col: str           # the domain-group accession column
    hierarchy: tuple[str, ...] = ()  # hierarchy node tables, leaf-first


DOMAIN_KINDS: dict[str, DomainKind] = {
    k.key: k
    for k in (
        DomainKind(
            "CATH",
            "cathDomain",
            "cathAccession",
            ("cathHomologousSuperfamily", "cathTopology", "cathArchitecture", "cathClass"),
        ),
        DomainKind(
            "SCOP",
            "scopDomain",
            "scopAccession",
            ("scopFamily", "scopSuperfamily", "scopFold", "scopClass"),
        ),
        DomainKind("Pfam", "pfamDomain", "pfamAccession", ("pfamClan",)),
        DomainKind("SuperFamily", "superfamilyDomain", "superfamilyAccession", ()),
        # gene3d accessions resolve to CATH superfamilies but attach to the
        # CATH chain at topology level (produce_neo4j_files.py:348-361):
        # their hierarchy is the 3-level topology→architecture→class tail.
        DomainKind(
            "G3DSA",
            "gene3dDomain",
            "gene3dAccession",
            ("cathTopology", "cathArchitecture", "cathClass"),
        ),
        DomainKind(
            "SCOP2_SuperFamily",
            "scop2sfDomain",
            "scop2sfAccession",
            ("scop2Superfamily", "scop2Fold", "scop2Class", "scop2ProteinType"),
        ),
        DomainKind(
            "SCOP2_Family",
            "scop2faDomain",
            "scop2faAccession",
            ("scop2Family", "scop2Superfamily", "scop2Fold", "scop2Class"),
        ),
    )
}

def hierarchy_edge_name(level_table: str) -> str:
    """Relationship-type name for edges whose dst is ``level_table``
    (`import_neo4j_data.sh:24-66` naming): cathHomologousSuperfamily →
    IS_IN_CATH_HOMOLOGOUS_SUPERFAMILY, scop2Fold → IS_IN_SCOP2_FOLD."""
    import re

    return "IS_IN_" + re.sub(r"(?<!^)(?=[A-Z])", "_", level_table).upper()


# --- core node/edge schemas (keys per SURVEY §1.3) ------------------------

_s = T.StringType()
_d = T.DoubleType()
_l = T.LongType()
_as = T.ArrayType(T.StringType())


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


NODE_SCHEMAS: dict[str, T.StructType] = {
    "entry": _st(
        ("pdbEntry", _s), ("pdbDescriptor", _s), ("pdbTitle", _s), ("pdbKeywords", _s)
    ),
    "proteinChain": _st(
        ("pdbProteinChain", _s),  # pdb_id + "_" + struct_asym_id
        ("pdbEntry", _s),
        ("chainUniqueID", _s),
        ("ecList", _as),
        ("updatedEC", _s),
        ("partialEC", _s),
    ),
    "boundEntity": _st(
        ("uniqueID", _s),  # pdb_id_bm<N>_<asym>
        ("pdbEntry", _s),
        ("hetCode", _s),
        ("description", _s),
        ("descriptor", _s),  # SMILES / WURCS
        ("type", _s),  # ligand | sugar
        ("boundLigandResidues", _s),
    ),
    "boundDescriptor": _st(
        ("ligandEntityID", _l), ("hetCode", _s), ("description", _s), ("descriptor", _s)
    ),
    "cognateLigand": _st(
        ("uniqueID", _l),
        ("canonicalSMILES", _s),
        ("compoundName", _s),
        ("ligandDB", _s),
        ("compoundReaction", _s),
        ("isCofactor", _s),
    ),
    "ecID": _st(("ecID", _s), ("description", _s)),
    "ecSubSubClass": _st(("ecSubSubClass", _s), ("description", _s)),
    "ecSubClass": _st(("ecSubClass", _s), ("description", _s)),
    "ecClass": _st(("ecClass", _s), ("description", _s)),
}


def domain_node_schema(kind: DomainKind) -> T.StructType:
    return _st(
        ("domain", _s),  # pdb_id:assembly_chain:acc
        ("domainAccession", _s),
        ("groupAccession", _s),  # the hierarchy-group key
        ("pdbEntry", _s),
        ("type", _s),  # node label kind, e.g. "cathDomain"
    )


EDGE_SCHEMAS: dict[str, T.StructType] = {
    # boundEntity→entry and proteinChain→entry
    "IS_IN_PDB": _st(("src", _s), ("dst", _s), ("srcLabel", _s)),
    "IS_IN_PROTEIN_CHAIN": _st(("src", _s), ("dst", _s)),  # domain→chain
    "INTERACTS_WITH_LIGAND": _st(
        ("domain", _s),
        ("uniqueID", _s),  # boundEntity key
        ("domainKind", _s),  # which of the 7 DBs
        ("domainContactCounts", _l),
        ("domainContactPerc", _d),
        ("domainHbondCounts", _l),
        ("domainHbondPerc", _d),
        ("domainCovalentCounts", _l),
        ("interactionMode", _s),  # ownership class
        ("ligandInterface", _as),
        ("proteinInterface", _as),
    ),
    "HAS_SIMILARITY": _st(
        ("uniqueID", _s),  # boundEntity key
        ("cognateLigand", _l),
        ("parityScore", _d),
        ("subParityScore", _d),
        ("paritySMARTS", _s),
        ("ecList", _as),
        ("bestCognate", _s),  # "Y"/"N", ties all "Y"
    ),
    "DESCRIBED_BY": _st(("uniqueID", _s), ("ligandEntityID", _l)),
    # cognateLigand→ecID and proteinChain→ecID
    "IS_IN_EC": _st(("src", _s), ("ecID", _s), ("srcLabel", _s)),
}


@dataclass
class ProCogGraph:
    """The engine's graph: a named collection of node and edge frames."""

    nodes: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[str, DataFrame] = field(default_factory=dict)

    def register_views(self, spark: SparkSession) -> None:
        for name, df in {**self.nodes, **self.edges}.items():
            df.createOrReplaceTempView(name)

    def save(self, root: str) -> None:
        for kind, coll in (("nodes", self.nodes), ("edges", self.edges)):
            for name, df in coll.items():
                df.write.mode("overwrite").parquet(os.path.join(root, kind, name))

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "ProCogGraph":
        g = cls()
        for kind, coll in (("nodes", g.nodes), ("edges", g.edges)):
            base = os.path.join(root, kind)
            if os.path.isdir(base):
                for name in sorted(os.listdir(base)):
                    coll[name] = spark.read.parquet(os.path.join(base, name))
        return g

    def domain_tables(self) -> dict[str, DataFrame]:
        return {
            k.key: self.nodes[k.node_table]
            for k in DOMAIN_KINDS.values()
            if k.node_table in self.nodes
        }
