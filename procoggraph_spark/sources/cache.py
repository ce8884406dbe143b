"""Incremental keyed cache store (SURVEY S16).

The reference's read-modify-write pickle caches (`get_pdb_parity.py:
157-191`, `process_all_pdb_contacts.py:128-158`) become a Parquet
upsert: new keys are found with a left-anti join, computed, unioned in,
and atomically swapped. This is the Delta-style MERGE emulated with
stock Spark (no Delta jars in the container).

At 100 TB the anti-join is a shuffle on the cache key only for the NEW
keys (the cache side prunes via DPP/broadcast when small); recompute
cost is bounded by the miss set, exactly like the reference's design.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class KeyedParquetCache:
    """A cache table keyed by ``key_cols``; values are the remaining
    columns."""

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self.exists() else None

    def split_hits_misses(self, keys: DataFrame) -> tuple[DataFrame | None, DataFrame]:
        """(hits joined with cached values, miss keys). The cache-miss
        split of `get_pdb_parity.py:160-168` as semi/anti joins."""
        cached = self.read()
        if cached is None:
            return None, keys
        hits = keys.join(cached, self.key_cols, "inner")
        misses = keys.join(cached, self.key_cols, "left_anti")
        return hits, misses

    def upsert(self, new_rows: DataFrame) -> None:
        """Append rows whose keys are absent; atomic directory swap so a
        failed write never corrupts the cache (the reference re-writes
        the whole pickle — same all-or-nothing contract)."""
        cached = self.read()
        if cached is None:
            merged = new_rows
        else:
            fresh = new_rows.join(cached, self.key_cols, "left_anti")
            merged = cached.unionByName(fresh, allowMissingColumns=True)
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.replace(tmp, self.path)
