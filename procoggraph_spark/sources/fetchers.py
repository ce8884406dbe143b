"""S13: batch ingestion fetchers as a distributed operator.

Reference: `download_mmcif.py:15-137` drives three remote services
(PDBe updated-mmCIF archive, model-server protonated assemblies, SIFTS
FTP) with a recurring control structure this module re-expresses
engine-side:

- **pre-existing skip** — already-downloaded ids are not re-fetched
  (`download_mmcif.py:22-27`): here the S16 ``KeyedParquetCache``
  hit/miss split, so only the miss set reaches the fetcher;
- **chunked batch queries** — ids grouped into ``chunk_size`` batches
  (`make_modelserver_query`, chunk 50);
- **adaptive chunk halving** — a 502/504-style "batch too large"
  failure retries the chunk at ceil(n/2) recursively
  (`download_mmcif.py:127-132`);
- **bounded retry** — a 503-style transient failure retries the SAME
  chunk up to ``max_retries`` times (`:124-126`);
- **per-id dead-letter** — ids the service reports as failed become
  error rows, never task failures (`:117-120` failed_ids);
- **pacing** — a minimum interval between consecutive service calls
  per partition (the reference sleeps between 202 polls, `:36-44`).

The network boundary stays OUT of the engine: ``fetcher`` is an
injected callable ``list[str] -> list[dict]`` (each dict: ``id``,
``payload``, optional ``error``). A real deployment passes an HTTP
client; tests pass deterministic fakes that exercise every control
path. Fetching runs inside ``mapInPandas`` — one fetcher call per
chunk, parallel across partitions, which IS the reference's Nextflow
chunk-level parallelism re-expressed as Spark partitions.
"""

from __future__ import annotations

import math
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class RetryableBatchError(Exception):
    """The whole chunk failed transiently (the 503 case): retry the same
    chunk, up to ``max_retries``."""


class ChunkTooLargeError(Exception):
    """The service rejected the batch size (the 502/504 case): split the
    chunk in half and recurse."""


FETCH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("chunk_size_used", T.IntegerType()),
    ]
)


def _fetch_chunk(
    ids: list[str],
    fetcher,
    chunk_size: int,
    max_retries: int,
    min_interval_s: float,
    state: dict,
) -> list[dict]:
    """The `make_modelserver_query` control structure: paced call,
    bounded same-chunk retry, recursive halving, per-id dead-letter."""
    out: list[dict] = []
    for i in range(0, len(ids), chunk_size):
        chunk = ids[i : i + chunk_size]
        attempts = 0
        while True:
            attempts += 1
            # pacing: never two service calls closer than min_interval_s
            # within this partition (the reference's sleep-between-polls)
            wait = state["next_call_at"] - time.monotonic()
            if wait > 0:
                time.sleep(wait)
            state["next_call_at"] = time.monotonic() + min_interval_s
            try:
                rows = fetcher(list(chunk))
            except ChunkTooLargeError:
                if len(chunk) <= 1:
                    out.append(
                        {
                            "id": chunk[0],
                            "payload": None,
                            "error": "chunk_too_large_at_size_1",
                            "attempts": attempts,
                            "chunk_size_used": 1,
                        }
                    )
                    break
                half = math.ceil(len(chunk) / 2)
                out.extend(
                    _fetch_chunk(
                        chunk, fetcher, half, max_retries, min_interval_s, state
                    )
                )
                break
            except RetryableBatchError as exc:
                if attempts > max_retries:
                    out.extend(
                        {
                            "id": x,
                            "payload": None,
                            "error": f"retries_exhausted: {exc}"[:200],
                            "attempts": attempts,
                            "chunk_size_used": len(chunk),
                        }
                        for x in chunk
                    )
                    break
                continue
            got = {r["id"]: r for r in rows}
            for x in chunk:
                r = got.get(x)
                out.append(
                    {
                        "id": x,
                        "payload": (r or {}).get("payload"),
                        # ids the service silently dropped are dead-lettered,
                        # like the reference's contains.txt shortfall check
                        "error": (r or {}).get("error")
                        if r is not None
                        else "missing_from_response",
                        "attempts": attempts,
                        "chunk_size_used": len(chunk),
                    }
                )
            break
    return out


def fetch_manifest(
    ids: DataFrame,
    *,
    fetcher,
    id_col: str = "id",
    chunk_size: int = 50,
    max_retries: int = 2,
    min_interval_s: float = 0.0,
    cache=None,
) -> DataFrame:
    """Fetch a manifest for every id: (id, payload, error, attempts,
    chunk_size_used). With ``cache`` (an S16 ``KeyedParquetCache`` keyed
    on ``id``), cached ids skip the fetcher entirely and successful new
    rows are upserted — the reference's already-downloaded check.

    Distribution: ids are fetched per partition in ``chunk_size``
    batches; per-partition pacing bounds the aggregate request rate at
    (partitions / min_interval_s) calls per second — size the
    partition count to the service's documented rate limit, NOT to the
    cluster (a 1000-executor fan-out against a public API is an outage,
    not a speedup).
    """
    keys_all = ids.select(F.col(id_col).cast("string").alias("id")).distinct()
    misses = keys_all
    if cache is not None:
        _, misses = cache.split_hits_misses(keys_all)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = {"next_call_at": 0.0}
        for pdf in batches:
            rows = _fetch_chunk(
                list(pdf["id"]),
                fetcher,
                chunk_size,
                max_retries,
                min_interval_s,
                state,
            )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FETCH_SCHEMA.fields]
            )

    fetched = misses.mapInPandas(run, schema=FETCH_SCHEMA)
    if cache is None:
        return fetched
    # A fetcher has side effects (and cost): materialize the miss fetch
    # exactly once before the multiple downstream actions.
    fetched = fetched.localCheckpoint(eager=True)
    ok = fetched.filter(F.col("error").isNull())
    if not ok.isEmpty():
        cache.upsert(ok)
    # Re-read AFTER the upsert (the atomic swap replaced the cache
    # directory, so any pre-upsert cached frame points at dead files):
    # the fresh cache now serves both the old hits and the new rows.
    cached_now = cache.read()
    failed = fetched.filter(F.col("error").isNotNull())
    if cached_now is None:
        return fetched
    served = cached_now.join(keys_all, ["id"], "left_semi")
    return served.unionByName(failed, allowMissingColumns=True)


def merge_manifests(*manifests: DataFrame, on: str = "id") -> DataFrame:
    """Left-join per-source manifests into one row per id
    (`download_mmcif.py:65-96`: updated ⟕ protonated ⟕ sifts). The
    first manifest is the id universe; later ones attach their columns
    (pre-suffixed by the caller)."""
    out = manifests[0]
    for m in manifests[1:]:
        out = out.join(m, on, "left")
    return out
