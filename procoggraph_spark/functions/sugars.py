"""U8: the sugar conversion chain, WURCS → GlycoCT → CSDB linear → SMILES.

Reference: `process_all_pdb_contacts.py:13-32` drives three remote
services (GlycoSMOS wurcs2glycoct, CSDB glycoct→linear and
linear→SMILES, `utils.py:86-151`), each fronted by a read-modify-write
cache that is re-written after every batch.

Here the remote-API boundary stays OUT of the engine: each step is a
pluggable converter callable fronted by an S16 ``KeyedParquetCache``
(sources/cache.py), so a deployment wires real HTTP clients in at the
edges while the engine owns the part that scales — the distinct-key
dedup, cache-miss split (semi/anti join), Arrow-batched conversion of
the miss set only, atomic upsert, and join-back. The default converters
are CLEARLY-MARKED deterministic offline fallbacks (same discipline as
`chem._parity_fallback`): they parse real WURCS structure — the
``u,r,s`` unit counts and the linkage list — so structural invariants
(residue count preserved through every stage) are testable without
network access, but they are NOT chemistry.

WURCS reference format (public spec, e.g. ``WURCS=2.0/3,3,2/[...]
[...][...]/1-2-3/a4-b1_b4-c1``): version / unique,residue,linkage
counts / unique-residue descriptors / residue sequence / linkages.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from procoggraph_spark.sources.cache import KeyedParquetCache

_WURCS_RE = re.compile(r"^WURCS=[^/]+/(\d+),(\d+),(\d+)/")


def wurcs_counts(wurcs: str | None) -> tuple[int, int, int] | None:
    """(unique units, residues, linkages) from a WURCS header, or None
    for a non-WURCS string."""
    if not wurcs:
        return None
    m = _WURCS_RE.match(wurcs)
    return (int(m.group(1)), int(m.group(2)), int(m.group(3))) if m else None


def _tag(value: str) -> str:
    # sha256, not sha1: DuckDB ships sha256() so the whole fallback
    # chain is SQL-replicable and the u8_sugar_chain registry query can
    # carry a real hash-compared oracle
    return hashlib.sha256(value.encode()).hexdigest()[:10]


def glycoct_fallback(wurcs: str | None) -> str | None:
    """DETERMINISTIC FAKE WURCS→GlycoCT (no offline converter exists in
    this container): carries the parsed residue/linkage counts and a
    content hash so downstream stages see a stable, structure-preserving
    key — NOT real GlycoCT."""
    counts = wurcs_counts(wurcs)
    if counts is None:
        return None
    _u, r, s = counts
    return f"FAKE-GLYCOCT/res={r}/lin={s}/{_tag(wurcs)}"


def csdb_fallback(glycoct: str | None) -> str | None:
    """DETERMINISTIC FAKE GlycoCT→CSDB-linear; propagates the residue
    count and re-hashes, mirroring the lossy one-way chain."""
    if not glycoct:
        return None
    m = re.match(r"^FAKE-GLYCOCT/res=(\d+)/lin=(\d+)/", glycoct)
    if not m:
        return None
    return f"FAKE-CSDB:res={m.group(1)}:{_tag(glycoct)}"


_RING = "C1OC(O)C(O)C(O)C1O"  # one pyranose-shaped ring token


def smiles_fallback(csdb: str | None) -> str | None:
    """DETERMINISTIC FAKE CSDB→SMILES: one ring token per residue,
    O-linked — bracket-balanced (passes the U5 fallback parse filter)
    and residue-count-preserving, so golden tests can assert the chain
    end-to-end. NOT real chemistry."""
    if not csdb:
        return None
    m = re.match(r"^FAKE-CSDB:res=(\d+):", csdb)
    if not m:
        return None
    n = max(1, int(m.group(1)))
    return "O".join([_RING] * n)


def _cached_convert(
    keys: DataFrame,
    cache: KeyedParquetCache,
    key_col: str,
    out_col: str,
    fn,
) -> DataFrame:
    """One chain step: split hits/misses against the cache, convert ONLY
    the misses (Arrow-batched pandas UDF — the reference converts one
    key at a time over HTTP, `utils.py:109-129`), upsert, return the full
    (key, value) mapping. Work is bounded by the miss set.

    Side-effect discipline (mirrors ``fetchers.fetch_manifest``): the
    emptiness check runs on the MISS KEYS, before the converter is ever
    attached, and the converted frame is ``localCheckpoint``-ed so the
    converter runs exactly once per miss — with real HTTP clients wired
    in, lazy re-evaluation across the upsert write and the join-back
    read would otherwise issue duplicate remote calls."""
    hits, misses = cache.split_hits_misses(keys)

    if misses.isEmpty():
        if hits is not None:
            return hits
        # no cache yet and no keys: empty frame with the mapping schema
        return misses.withColumn(out_col, F.lit(None).cast(T.StringType()))

    @F.pandas_udf(T.StringType())
    def conv(s):  # pragma: no cover - executed on workers
        return s.map(fn)

    fresh = misses.withColumn(out_col, conv(F.col(key_col))).localCheckpoint(
        eager=True
    )
    cache.upsert(fresh)
    return cache.read().join(keys, [key_col], "left_semi")


def sugar_smiles_from_wurcs(
    spark: SparkSession,
    wurcs_keys: DataFrame,
    *,
    cache_root: str,
    to_glycoct=glycoct_fallback,
    to_csdb=csdb_fallback,
    to_smiles=smiles_fallback,
) -> DataFrame:
    """U8 end-to-end: distinct WURCS strings → (WURCS, glycoct, csdb,
    descriptor), each hop through its own keyed cache exactly as the
    reference keeps three cache files (`get_sugar_smiles_from_wurcs`,
    `process_all_pdb_contacts.py:13-32`). Null conversions propagate as
    null descriptors (the reference's NaN discipline) without calling
    downstream converters on them.

    ``wurcs_keys``: any DataFrame with a ``WURCS`` string column.
    """
    w = wurcs_keys.select("WURCS").filter(F.col("WURCS").isNotNull()).distinct()

    g = _cached_convert(
        w,
        KeyedParquetCache(spark, f"{cache_root}/glycoct_cache", ["WURCS"]),
        "WURCS",
        "glycoct",
        to_glycoct,
    )
    c = _cached_convert(
        g.select("glycoct").filter(F.col("glycoct").isNotNull()).distinct(),
        KeyedParquetCache(spark, f"{cache_root}/csdb_linear_cache", ["glycoct"]),
        "glycoct",
        "csdb",
        to_csdb,
    )
    s = _cached_convert(
        c.select("csdb").filter(F.col("csdb").isNotNull()).distinct(),
        KeyedParquetCache(spark, f"{cache_root}/smiles_cache", ["csdb"]),
        "csdb",
        "descriptor",
        to_smiles,
    )
    return (
        w.join(g, "WURCS", "left")
        .join(c, "glycoct", "left")
        .join(s, "csdb", "left")
        .select("WURCS", "glycoct", "csdb", "descriptor")
    )


def enrich_sugar_descriptors(
    spark: SparkSession,
    contacts: DataFrame,
    *,
    cache_root: str,
    **converters,
) -> DataFrame:
    """The pipeline attach point (`process_all_pdb_contacts.py:153-160`):
    sugar-type bound entities carry WURCS in ``descriptor``; convert the
    distinct WURCS set through the cached chain and overwrite the column
    for those rows — unconditionally, as the reference does (a failed
    conversion nulls the descriptor rather than leaving WURCS behind).
    Non-sugar rows pass through untouched. The mapping side is the
    distinct sugar set — dimension-sized, broadcast."""
    wurcs = (
        contacts.filter(F.col("type") == "sugar")
        .select(F.col("descriptor").alias("WURCS"))
        .distinct()
    )
    mapping = sugar_smiles_from_wurcs(
        spark, wurcs, cache_root=cache_root, **converters
    ).select(F.col("WURCS").alias("_wurcs"), F.col("descriptor").alias("_smiles"))
    return (
        contacts.join(
            F.broadcast(mapping),
            (F.col("type") == "sugar") & (F.col("descriptor") == F.col("_wurcs")),
            "left",
        )
        .withColumn(
            "descriptor",
            F.when(F.col("type") == "sugar", F.col("_smiles")).otherwise(
                F.col("descriptor")
            ),
        )
        .drop("_wurcs", "_smiles")
    )
