"""Timestamp helpers shared by the temporal/streaming operators.

Parquet timestamps written without timezone metadata arrive in Spark 4
as TIMESTAMP_NTZ, which cannot be cast directly to a numeric type
(DATATYPE_MISMATCH). Routing through TIMESTAMP first is a no-op for
LTZ columns and a session-timezone reinterpretation for NTZ ones; the
engine pins the session timezone to UTC, so the result matches DuckDB's
``epoch(ts)`` for both physical encodings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Seconds since the epoch for TIMESTAMP or TIMESTAMP_NTZ columns."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
