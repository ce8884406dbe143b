"""The spark.sql surface (SURVEY §3.3): every table registered as a
view + the custom kernels as SQL functions — arbitrary SQL replaces
arbitrary Cypher."""

from __future__ import annotations

from procoggraph_spark.session import load_tables, register_sql_functions
from tests.conftest import SF_ORACLE


def test_views_and_sql(spark):
    dfs = load_tables(spark, SF_ORACLE)
    assert set(dfs) >= {"orders", "lineitem", "customer", "events"}
    row = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment LIMIT 1
        """
    ).collect()[0]
    assert row["n"] > 0


def test_sql_functions(spark):
    register_sql_functions(spark)
    row = spark.sql(
        """
        SELECT canonical_smiles('  CCO ') AS canon,
               parity_score('CCO', 'CCO') AS self_score,
               parity_score('CCO', 'c1ccccc1') AS cross_score,
               ec_range_compress(array(1, 2, 3, 7, 9, 10)) AS ranges,
               inscode_sort(array('100_A', '99', '100')) AS sorted_tokens
        """
    ).collect()[0]
    assert row["canon"] == "CCO"
    assert row["self_score"] == 1.0            # identical molecules
    assert 0.0 <= row["cross_score"] < 1.0     # different molecules
    assert row["ranges"] == "1-3,7,9-10"
    assert row["sorted_tokens"] == "99|100|100_A"


def test_sql_over_graph_udfs(spark):
    """The combination the reference's README documents as the custom-
    query path: SQL over views using the registered kernels."""
    load_tables(spark, SF_ORACLE)
    register_sql_functions(spark)
    rows = spark.sql(
        """
        SELECT o_orderpriority,
               ec_range_compress(collect_list(CAST(o_orderkey % 20 AS INT)))
                   AS key_ranges
        FROM orders WHERE o_orderkey < 40
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).collect()
    assert rows and all("," in r["key_ranges"] or "-" in r["key_ranges"] for r in rows)
