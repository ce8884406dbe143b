"""Shared helpers for the oracle-checked query surface.

Determinism discipline (the driver hash-compares Spark vs DuckDB):

- Money/measure sums go through ``DECIMAL`` so addition is exact and
  associative (double summation order differs between engines); the final
  column is cast back to DOUBLE so both engines hand pandas a float64.
- Every computed column is aliased identically in the Spark plan and the
  oracle SQL.
- Top-k queries always order by a unique tiebreak key.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


_TABLE_MEMO: dict[tuple[int, str, str], DataFrame] = {}


def t(
    spark: SparkSession, sf_dir: str, name: str, *, widen_on: str | None = None
) -> DataFrame:
    """Read one star-schema table (per-table read keeps parquet column
    pruning and predicate pushdown visible in the plan). DataFrame
    handles are memoized per (session, dir, table): schema/footer
    resolution costs ~100ms per call and the driver runs dozens of
    queries against the same session.

    Storage-layout normalization on ingest: parquet scans are
    row-group-atomic, so a large single-row-group file executes its scan
    + every map-side stage (filter, partial agg, broadcast-join probe)
    as ONE task. A real 100 TB layout is many files/row groups and never
    has this shape; when the local test file does, it is staged once
    into a splittable multi-file copy (sub-second for the test sizes) —
    the same re-layout any engine performs at ingest. ``widen_on`` is
    accepted for callers that want to declare their downstream key but
    is no longer needed once the scan splits.

    The driver's `events` table stores TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as long (runtime-settable legacy
    conf) and truncate to micros with exact integer division — the same
    ns→us truncation DuckDB applies, so oracles agree.
    """
    # Pin UTC at query time: the caller's session may not have it, and
    # timestamp values otherwise collect tz-shifted vs the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (id(spark), sf_dir, name)
    if key in _TABLE_MEMO:
        return _TABLE_MEMO[key]
    path = _staged_splittable(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = spark.read.parquet(path)
    _TABLE_MEMO[key] = df
    return df


_STAGE_MEMO: dict[str, str] = {}
_STAGE_ROOT = os.environ.get("SPARK_GRAFT_STAGE_DIR", "/tmp/procoggraph_stage")
_STAGE_FILES = 16


def _staged_splittable(path: str) -> str:
    """Return a splittable location for ``path``: the file itself if it
    already parallelizes (multiple row groups / small / a directory),
    else a staged multi-file copy under ``$SPARK_GRAFT_STAGE_DIR``,
    written once per source mtime and reused across sessions."""
    if path in _STAGE_MEMO:
        return _STAGE_MEMO[path]
    out = path
    try:
        if os.path.isfile(path) and os.path.getsize(path) > (4 << 20):
            import pyarrow.parquet as pq

            if pq.ParquetFile(path).num_row_groups < _STAGE_FILES:
                digest = hashlib.sha1(path.encode()).hexdigest()[:12]
                stage = os.path.join(_STAGE_ROOT, digest)
                marker = os.path.join(stage, "_SOURCE_MTIME")
                src_mtime = str(os.stat(path).st_mtime_ns)
                if not (
                    os.path.isfile(marker)
                    and open(marker).read() == src_mtime
                ):
                    tmp = f"{stage}__tmp_{os.getpid()}"
                    os.makedirs(tmp, exist_ok=True)
                    tbl = pq.read_table(path)
                    step = (tbl.num_rows + _STAGE_FILES - 1) // _STAGE_FILES
                    for i in range(_STAGE_FILES):
                        pq.write_table(
                            tbl.slice(i * step, step),
                            os.path.join(tmp, f"part-{i:03d}.parquet"),
                        )
                    with open(os.path.join(tmp, "_SOURCE_MTIME"), "w") as fh:
                        fh.write(src_mtime)
                    if os.path.isdir(stage):
                        import shutil

                        shutil.rmtree(stage)
                    os.replace(tmp, stage)
                out = stage
    except Exception:
        out = path
    _STAGE_MEMO[path] = out
    return out


def dec2(c: Column) -> Column:
    return c.cast("decimal(18,2)")


def dec4(c: Column) -> Column:
    return c.cast("decimal(18,4)")


def cents(c: Column, scale: int = 2) -> Column:
    """Fixed-point integer representation of a ``scale``-decimal measure
    (HALF_UP, same rounding a decimal cast applies). Long sums stay in
    whole-stage codegen — roughly half the per-row cost of Spark's
    Decimal aggregation buffer — and integer addition is exact and
    associative, so results are partitioning-independent like decimal.
    Overflow headroom: 9.2e18 cents ≈ 9.2e16 in measure units; beyond
    that (extreme 100 TB rollups) switch the final reduce to
    ``sum(cast(c as decimal(38,scale)))``."""
    return F.round(c * (10 ** scale), 0).cast("long")


def dsum2(c: Column) -> Column:
    """Exact sum of a 2-decimal measure, returned as double.

    ``sum(cents)/100.0`` is the correctly-rounded double of the exact
    decimal total — bit-identical to ``CAST(SUM(DECIMAL(18,2)) AS
    DOUBLE)`` on the oracle side (both round the same exact value once).
    """
    return F.sum(cents(c, 2)) / 100.0


def dsum4(c: Column) -> Column:
    return F.sum(cents(c, 4)) / 10000.0
