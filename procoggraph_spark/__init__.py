"""procoggraph_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Bashton-Lab/ProCogGraph.

The reference (read-only at /root/reference) is a Nextflow+pandas batch
pipeline feeding a Neo4j property graph queried via ~35 Cypher dashboard
queries. This package re-expresses the whole surface Spark-first:

- ``sources``   — readers/sinks (CSV dialects, record-format UDTF parsers,
                  Neo4j-bulk-style TSV export, incremental keyed caches).
- ``functions`` — scalar/array/string function library (SURVEY §2.7) and
                  the chemistry UDF surface (§2.8, RDKit gated).
- ``operators`` — relational operators that Spark lacks as one-liners:
                  ownership classification, EC expansion, best-per-group,
                  deterministic dense ids, set algebra, dedup, similarity
                  search, text analysis, multimodal plumbing.
- ``graph``     — the property-graph data model (node/edge DataFrames) and
                  the dashboard query layer Q1–Q16 (SURVEY §2.9).
- ``pipeline``  — the batch dataflow stages (contacts → ownership →
                  annotation → parity → graph build).
- ``streaming`` — Structured Streaming surface (windows, watermarks,
                  incremental upsert) beyond the all-batch reference.
"""

__version__ = "0.1.0"

from procoggraph_spark.session import get_spark  # noqa: F401
