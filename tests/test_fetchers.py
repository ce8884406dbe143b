"""S13 batch-fetcher tests: the download_mmcif.py control structure —
chunking, 503-style bounded retry, 502/504-style adaptive halving,
per-id dead-letter, cache skip, pacing — driven by deterministic fake
fetchers (the injected remote boundary)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from procoggraph_spark.sources.fetchers import (
    ChunkTooLargeError,
    RetryableBatchError,
    fetch_manifest,
    merge_manifests,
)


def _ids(spark, n, parts=1):
    return spark.range(n).repartition(parts).select(
        F.concat(F.lit("pdb"), F.col("id").cast("string")).alias("id")
    )


def _ok_fetcher():
    # returned as a CLOSURE so cloudpickle serializes it by value —
    # module-level test functions aren't importable on Spark workers
    def fetch(ids):
        return [{"id": x, "payload": f"cif::{x}"} for x in ids]
    return fetch


def test_basic_fetch_and_chunking(spark):
    out = fetch_manifest(
        _ids(spark, 23), fetcher=_ok_fetcher(), chunk_size=10
    ).collect()
    assert len(out) == 23
    assert all(r["error"] is None for r in out)
    assert all(r["payload"] == f"cif::{r['id']}" for r in out)
    # 23 ids in chunks of 10 → chunk sizes 10, 10, 3
    assert sorted({r["chunk_size_used"] for r in out}) == [3, 10]


def test_adaptive_chunk_halving(spark):
    """A service that rejects batches > 6 (the 502/504 path) must still
    fetch every id, by recursive halving — never a task failure."""
    calls = []

    def picky(ids):
        calls.append(len(ids))
        if len(ids) > 6:
            raise ChunkTooLargeError("504")
        return [{"id": x, "payload": f"cif::{x}"} for x in ids]

    out = fetch_manifest(
        _ids(spark, 40), fetcher=picky, chunk_size=50
    ).collect()
    assert len(out) == 40
    assert all(r["error"] is None for r in out)
    assert all(r["chunk_size_used"] <= 6 for r in out)


def test_bounded_retry_then_dead_letter(spark):
    """A chunk that always 503s retries max_retries times then
    dead-letters every id in it; healthy chunks are unaffected."""
    attempts = {"n": 0}

    def flaky(ids):
        if any(x == "pdb0" for x in ids):
            attempts["n"] += 1
            raise RetryableBatchError("503")
        return [{"id": x, "payload": f"cif::{x}"} for x in ids]

    out = {
        r["id"]: r
        for r in fetch_manifest(
            _ids(spark, 6), fetcher=flaky, chunk_size=3, max_retries=2
        ).collect()
    }
    dead = [r for r in out.values() if r["error"] is not None]
    assert {r["id"] for r in dead} <= {"pdb0", "pdb1", "pdb2"}
    assert all("retries_exhausted" in r["error"] for r in dead)
    assert all(r["attempts"] == 3 for r in dead)  # 1 + max_retries
    assert out["pdb3"]["error"] is None


def test_per_id_dead_letter_and_missing(spark):
    """Per-id failures reported by the service, and ids silently absent
    from the response, both become error rows (contains.txt check)."""

    def partial(ids):
        rows = []
        for x in ids:
            if x.endswith("1"):
                rows.append({"id": x, "payload": None, "error": "model_server_error"})
            elif not x.endswith("2"):  # ids ending in 2 vanish
                rows.append({"id": x, "payload": f"p::{x}"})
        return rows

    out = {r["id"]: r for r in fetch_manifest(_ids(spark, 4), fetcher=partial).collect()}
    assert out["pdb1"]["error"] == "model_server_error"
    assert out["pdb2"]["error"] == "missing_from_response"
    assert out["pdb0"]["error"] is None and out["pdb3"]["error"] is None


def test_cache_skip_and_upsert(spark, tmp_path):
    """Second run must not call the fetcher for cached ids — the
    pre-existing-file skip as an S16 cache; failed rows are NOT cached
    and get retried next run."""
    from procoggraph_spark.sources.cache import KeyedParquetCache

    def first(ids):
        return [
            {"id": x, "payload": f"c::{x}"}
            if x != "pdb1"
            else {"id": x, "payload": None, "error": "boom"}
            for x in ids
        ]

    cache = KeyedParquetCache(spark, str(tmp_path / "fetch_cache"), ["id"])
    out1 = fetch_manifest(_ids(spark, 3), fetcher=first, cache=cache).collect()
    assert sum(1 for r in out1 if r["error"] is None) == 2

    def second(ids):
        # poisoned for every id except the previously-failed one — a
        # cached id reaching the fetcher is the bug under test (driver-
        # side recording lists don't observe worker-side calls)
        assert set(ids) <= {"pdb1"}, f"cached ids re-fetched: {ids}"
        return [{"id": x, "payload": f"cif::{x}"} for x in ids]

    cache2 = KeyedParquetCache(spark, str(tmp_path / "fetch_cache"), ["id"])
    out2 = {
        r["id"]: r
        for r in fetch_manifest(_ids(spark, 3), fetcher=second, cache=cache2).collect()
    }
    assert out2["pdb1"]["payload"] == "cif::pdb1"  # re-fetched this run
    assert out2["pdb0"]["payload"] == "c::pdb0"  # served from cache


def test_pacing_min_interval(spark):
    """Consecutive service calls within a partition are spaced at least
    min_interval_s apart."""
    t0 = time.perf_counter()
    out = fetch_manifest(
        _ids(spark, 30, parts=1),
        fetcher=_ok_fetcher(),
        chunk_size=10,
        min_interval_s=0.2,
    ).collect()
    elapsed = time.perf_counter() - t0
    assert len(out) == 30
    assert elapsed >= 0.4  # 3 calls → ≥ 2 full intervals


def test_merge_manifests(spark):
    a = spark.createDataFrame([("p1", "u1"), ("p2", "u2")], "id string, updated string")
    b = spark.createDataFrame([("p1", "h1")], "id string, protonated string")
    got = {r["id"]: r for r in merge_manifests(a, b).collect()}
    assert got["p1"]["protonated"] == "h1"
    assert got["p2"]["protonated"] is None
