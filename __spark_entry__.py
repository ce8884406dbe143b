"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship query at sf0.001 (smoke check).
- ``queries()``     — name -> callable(spark, sf_dir) -> DataFrame, one per
  implemented operator family from SURVEY.md §2 (see
  procoggraph_spark/queries/*).
- ``oracle_sql()``  — matching DuckDB SQL for the hash-compared
  correctness gate; oracle-less entries (engine-hash-dependent ops like
  MinHash/SimHash/LSH) get the driver's rows-only check and are verified
  by pytest instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from procoggraph_spark.queries import registry  # noqa: E402

_QUERIES, _ORACLES = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the report-card query (joins + grouped distinct aggs +
    sorted collected sets — the core shape of the reference's dashboard)
    on /root/testdata/sf0.001."""
    return _QUERIES["q4_report_card"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
