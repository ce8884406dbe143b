"""Whole-graph analytics (SURVEY M5 / BASELINE.json north star).

BASELINE.json calls for GraphX for the analytics tier. GraphX is
JVM-only (no Python binding) and GraphFrames jars aren't in this
container, so the same vertex/edge algorithms are implemented as
DataFrame iteration — the identical Pregel-style message-passing shape
GraphX runs, expressed as joins, which Catalyst/AQE optimizes per
round. On a cluster with the GraphFrames jar, `to_graphframes_input`
hands these exact frames to the library instead.

Algorithms: degree statistics, hash-min connected components (Pregel
equivalent), label propagation, and k-hop neighborhood expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def edge_list(edges: dict[str, DataFrame]) -> DataFrame:
    """Union every relationship table into a typed (src, dst, rel)
    string edge list — the engine's vertex/edge view of the graph."""
    parts = []
    specs = {
        "IS_IN_PDB": ("src", "dst"),
        "IS_IN_PROTEIN_CHAIN": ("src", "dst"),
        "INTERACTS_WITH_LIGAND": ("domain", "uniqueID"),
        "HAS_SIMILARITY": ("uniqueID", "cognateLigand"),
        "DESCRIBED_BY": ("uniqueID", "ligandEntityID"),
    }
    for rel, (s, d) in specs.items():
        if rel in edges:
            parts.append(
                edges[rel].select(
                    F.col(s).cast("string").alias("src"),
                    F.col(d).cast("string").alias("dst"),
                    F.lit(rel).alias("rel"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex in/out/total degree. One shuffle per direction, then
    an outer merge — the GraphX degrees() equivalent."""
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_deg.join(in_deg, "id", "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def connected_components(
    edges: DataFrame, *, max_iter: int = 20
) -> DataFrame:
    """Hash-min connected components (the Pregel formulation GraphX
    runs): every vertex repeatedly adopts the min component id among
    itself and its neighbors, to fixpoint.

    Scale: each round is one shuffle on vertex id; rounds ≤ graph
    diameter. `localCheckpoint` truncates the growing lineage so round
    N doesn't replan rounds 1..N-1 (the standard iterative-algorithm
    discipline on Spark).
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # neighbor minimum in one pass
        msgs = (
            sym.join(comp, sym.src == comp.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_comp = (
            comp.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("_nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        new_comp = new_comp.localCheckpoint(eager=True)
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    return comp


def label_propagation(
    edges: DataFrame, seeds: DataFrame, *, max_iter: int = 5
) -> DataFrame:
    """Semi-supervised label spread: seeded vertices keep their label;
    others adopt the most frequent neighbor label each round (ties →
    lexicographically smallest, deterministic). seeds: (id, label)."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .join(seeds, "id", "left")
    )
    seed_ids = seeds.select("id").withColumn("_seeded", F.lit(True))
    for _ in range(max_iter):
        votes = (
            sym.join(labels.filter(F.col("label").isNotNull()), sym.src == F.col("id"))
            .groupBy(F.col("dst").alias("vid"), "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("vid").orderBy(F.desc("n"), F.asc("label"))
        best = (
            votes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col("vid").alias("id"), F.col("label").alias("_new"))
        )
        labels = (
            labels.join(best, "id", "left")
            .join(seed_ids, "id", "left")
            .select(
                "id",
                F.when(F.col("_seeded"), F.col("label"))
                .otherwise(F.coalesce("_new", "label"))
                .alias("label"),
            )
        )
        labels = labels.localCheckpoint(eager=True)
    return labels


def k_hop_neighborhood(
    edges: DataFrame, start_ids: DataFrame, *, k: int = 2
) -> DataFrame:
    """All vertices within k undirected hops of the start set — the Q15
    subgraph-extraction primitive generalized. start_ids: (id)."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    frontier = start_ids.select(F.col("id")).distinct().withColumn("hops", F.lit(0))
    seen = frontier
    for depth in range(1, k + 1):
        nxt = (
            sym.join(frontier, sym.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(seen.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(depth))
        )
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return seen
