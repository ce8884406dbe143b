"""Distributed external-tool stage: subprocess-per-row under
mapInPandas with the reference's timeout + dead-letter contract
(run_arpeggio.sh:11, main.nf:45), and the cost-balanced partitioning
that replaces the manual molwt split (process_pdb_structure.py:195-209).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from procoggraph_spark.operators.external import (
    cost_balanced_repartition,
    run_external_tool,
)


def test_success_rows_carry_stdout(spark):
    df = spark.createDataFrame([("s1",), ("s2",)], "sid string")
    out = run_external_tool(
        df, argv=["sh", "-c", 'echo "processed:$0"', "{}"], input_col="sid"
    ).collect()
    got = {r["sid"]: (r["status"], r["exit_code"], r["tool_stdout"]) for r in out}
    assert got == {
        "s1": ("ok", 0, "processed:s1"),
        "s2": ("ok", 0, "processed:s2"),
    }


def test_timeout_becomes_dead_letter_row(spark):
    df = spark.createDataFrame([("fast",), ("slow",)], "sid string")
    out = run_external_tool(
        df,
        argv=["sh", "-c", '[ "$0" = slow ] && sleep 30; echo done:$0', "{}"],
        input_col="sid",
        timeout_s=2.0,
        kill_grace_s=1.0,
    ).collect()
    got = {r["sid"]: (r["status"], r["exit_code"]) for r in out}
    assert got["fast"] == ("ok", 0)
    assert got["slow"] == ("timeout", 124)


def test_nonzero_exit_and_missing_binary(spark):
    df = spark.createDataFrame([("x",)], "sid string")
    fail = run_external_tool(
        df, argv=["sh", "-c", "exit 3"], input_col="sid"
    ).collect()[0]
    assert (fail["status"], fail["exit_code"]) == ("error_3", 3)
    missing = run_external_tool(
        df, argv=["/nonexistent/definitely-not-a-binary", "{}"], input_col="sid"
    ).collect()[0]
    assert (missing["status"], missing["exit_code"]) == ("error_127", 127)


def test_cost_balanced_repartition_spreads_heavy_tail(spark):
    # 100 light rows (cost 1) + 8 heavy (cost 1000): the heavy rows must
    # not pile into one partition, and no row is lost or duplicated
    rows = [(i, 1.0) for i in range(100)] + [(1000 + i, 1000.0) for i in range(8)]
    df = spark.createDataFrame(rows, "sid long, cost double")
    out = cost_balanced_repartition(
        df, cost_col="cost", id_col="sid", num_partitions=8
    )
    got = out.withColumn("_pid", F.spark_partition_id())
    assert sorted(r["sid"] for r in got.collect()) == sorted(r[0] for r in rows)
    heavy_per_part = (
        got.filter(F.col("cost") > 1.0).groupBy("_pid").count().collect()
    )
    assert len(heavy_per_part) >= 3  # spread over several partitions
    assert max(r["count"] for r in heavy_per_part) <= 4


def test_external_tool_to_arpeggio_pipeline(spark):
    """Full RUN_ARPEGGIO analog: manifest -> distributed stub binary ->
    stdout parsed into typed contact rows; a timing-out structure
    surfaces as a dead-letter row, not a job failure."""
    from procoggraph_spark.sources.parsers import arpeggio_from_tool_output

    stub = (
        '[ "$0" = bad1 ] && sleep 30; '
        'printf \'{"status": null, "%s": [{"bgn": {"auth_asym_id": "A", '
        '"auth_seq_id": 1, "auth_atom_id": "C1"}, "end": {"auth_asym_id": "B", '
        '"auth_seq_id": 2, "auth_atom_id": "O1"}, "contact": ["hbond"], '
        '"interacting_entities": "INTER", "distance": 3.1}]}\' "$0"'
    )
    manifest = spark.createDataFrame([("9abc",), ("9xyz",), ("bad1",)], "pdb string")
    tool = run_external_tool(
        manifest, argv=["sh", "-c", stub, "{}"], input_col="pdb",
        timeout_s=3.0, kill_grace_s=1.0,
    )
    contacts = arpeggio_from_tool_output(tool, id_col="pdb")
    rows = {r["pdb_id"]: r for r in contacts.collect()}
    assert rows["9abc"]["status"] == "ok"
    assert rows["9abc"]["contact"] == ["hbond"]
    assert rows["9xyz"]["end_auth_seq_id"] == 2
    assert rows["bad1"]["status"] == "timeout"
    assert rows["bad1"]["contact"] is None
