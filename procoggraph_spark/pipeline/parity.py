"""PARITY scoring stage (SURVEY §3.1 SCORE_LIGANDS, §4 "the real
physical-execution problem").

The reference (`get_pdb_parity.py:114-196`) prunes the bound×cognate
cross product to EC-matched candidate pairs, splits against a keyed
cache, scores misses in a thread pool with a 40 s per-pair timeout, and
appends to the cache. Same plan here, cluster-parallel:

    candidate pairs (explode EC + equi-join)     J12
      → anti-join cache                          S16
      → repartition(n) → mapInPandas scorer      U3 (chem.score_pairs_batch)
      → cache upsert → join scores back

Skew note: MCS cost scales with molecule size, so candidate pairs are
repartitioned round-robin (`repartition(n)` without keys) — heavy
molecules spread uniformly instead of hot-keying one executor; the
per-pair timeout bounds the tail exactly like the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procoggraph_spark.functions.chem import PARITY_RESULT_SCHEMA, score_pairs_batch
from procoggraph_spark.sources.cache import KeyedParquetCache

CACHE_KEYS = ["pdb_smiles", "cognate_smiles"]


def candidate_pairs(
    bound_descriptors: DataFrame, cognate_ligands: DataFrame
) -> DataFrame:
    """EC-pruned candidate pairs (`get_pdb_parity.py:114-124,151-156`):
    explode each bound descriptor's EC list and equi-join cognate
    ligands on EC — the join IS the pruning of the cross product.

    bound_descriptors: (ligand_entity_id, descriptor, ec_list array)
    cognate_ligands:   (entry=EC, uniqueID, canonical_smiles)
    """
    bd = bound_descriptors.select(
        "ligand_entity_id",
        F.col("descriptor").alias("pdb_smiles"),
        F.explode("ec_list").alias("ec"),
    )
    cl = cognate_ligands.select(
        F.col("entry").alias("ec"),
        F.col("uniqueID").alias("cognate_ligand"),
        F.col("canonical_smiles").alias("cognate_smiles"),
    )
    return bd.join(cl, "ec").select(
        "ec", "ligand_entity_id", "pdb_smiles", "cognate_ligand", "cognate_smiles"
    )


def score_with_cache(
    spark: SparkSession,
    pairs: DataFrame,
    cache_path: str,
    *,
    timeout_s: int = 40,
    parallelism: int | None = None,
) -> DataFrame:
    """Score distinct (pdb_smiles, cognate_smiles) pairs, consulting and
    updating the cache; returns all pairs with score columns attached."""
    distinct_pairs = pairs.select(*CACHE_KEYS).distinct()
    cache = KeyedParquetCache(spark, cache_path, CACHE_KEYS)
    _, misses = cache.split_hits_misses(distinct_pairs)

    n = parallelism or spark.sparkContext.defaultParallelism
    scored_new = (
        misses.repartition(n)  # round-robin: spread MCS cost, not keys
        .mapInPandas(
            lambda it: (score_pairs_batch(pdf, timeout_s=timeout_s) for pdf in it),
            schema=PARITY_RESULT_SCHEMA,
        )
    )
    cache.upsert(scored_new)
    all_scores = cache.read()
    return pairs.join(all_scores, CACHE_KEYS, "left")
