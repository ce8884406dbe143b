"""Driver-facing query registry.

Each module contributes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL). The registry
union is what ``__spark_entry__.queries()`` / ``oracle_sql()`` expose.
Names are prefixed with the SURVEY §2 operator-family id they exercise.
"""

from __future__ import annotations


def registry():
    from procoggraph_spark.queries import (
        star_graph,
        star_llmops,
        star_multimodal,
        star_relational,
        star_relational2,
        star_streaming,
        star_temporal,
    )

    queries: dict = {}
    oracles: dict = {}
    for mod in (
        star_relational,
        star_relational2,
        star_llmops,
        star_multimodal,
        star_streaming,
        star_temporal,
        star_graph,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
