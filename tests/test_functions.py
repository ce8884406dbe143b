"""Scalar-function library golden tests vs. the pandas originals'
documented behavior (SURVEY §2.7 property-test strategy)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from procoggraph_spark.functions.strings import (
    length_upper_sorted,
    pattern_to_range,
    pipe_join_sorted_set,
    sort_tokens_numeric_inscode,
    strip_chars,
)
from procoggraph_spark.operators.text import bpe_ish_tokens


def one(spark, expr, schema="v string", rows=None):
    df = spark.createDataFrame(rows or [("x",)], schema)
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_inscode_sort_matches_reference(spark):
    """Mirror of sort_numeric_with_inscode (process_pdb_contacts.py:40-44)."""

    def ref(tosort):  # the reference's own algorithm, reimplemented
        numeric_split = [re.findall(r"(\d+)_*(\D*)", item) for item in tosort]
        sorted_parts = sorted(numeric_split, key=lambda x: int(x[0][0]))
        return "|".join(
            "_".join(tup for tup in s[0]).strip("_") for s in sorted_parts
        )

    cases = [
        ["100_A", "99"],
        ["2", "10", "1"],
        ["42"],
    ]
    for tokens in cases:
        df = spark.createDataFrame([(tokens,)], "toks array<string>")
        got = df.select(
            sort_tokens_numeric_inscode(F.col("toks")).alias("out")
        ).collect()[0]["out"]
        assert got == ref(tokens), tokens

    # documented divergence: numeric ties order by inscode deterministically
    # (the reference keeps input order via Python's stable sort)
    df = spark.createDataFrame([(["5_B", "5_A", "5"],)], "toks array<string>")
    got = df.select(sort_tokens_numeric_inscode(F.col("toks")).alias("out")).collect()[0]["out"]
    assert got == "5|5_A|5_B"


def test_strip_chars(spark):
    got = one(
        spark,
        strip_chars(F.col("v"), "\n;\"'"),
        rows=[("\n;'quoted text';\n",)],
    )
    assert got == "quoted text"


def test_pattern_to_range(spark):
    df = spark.createDataFrame([("(1-5)",), ("7",), ("(12)",)], "v string")
    got = [r["out"] for r in df.select(pattern_to_range(F.col("v")).alias("out")).collect()]
    assert got[0] == [1, 2, 3, 4, 5]
    assert got[1] == [7]
    assert got[2] == [12]


def test_length_upper_sorted(spark):
    """get_ec_information.py:297-299: sort names by (length, value)."""
    df = spark.createDataFrame([(["bb", "a", "AB", "ccc"],)], "names array<string>")
    got = df.select(length_upper_sorted(F.col("names")).alias("out")).collect()[0]["out"]
    assert got == "a|AB|bb|ccc"  # length first; 'AB' < 'bb' by byte order


def test_pipe_join_sorted_set(spark):
    df = spark.createDataFrame([(["b", "a", "b", "c"],)], "xs array<string>")
    got = df.select(pipe_join_sorted_set(F.col("xs")).alias("out")).collect()[0]["out"]
    assert got == "a|b|c"


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([("hello, world42 ok",)], "v string")
    got = df.select(bpe_ish_tokens(F.col("v")).alias("out")).collect()[0]["out"]
    assert got == ["hello", ",", "world", "42", "ok"]


def test_molecular_descriptors(spark):
    """U6 descriptor struct on known molecules (heavy-atom arithmetic:
    ethanol CCO = 2C+O, benzene c1ccccc1 = 6 aromatic C + 1 ring;
    bracket atoms count as one heavy atom)."""
    from procoggraph_spark.functions.chem import molecular_descriptors

    df = spark.createDataFrame(
        [("CCO",), ("c1ccccc1",), ("C1CC1",), (None,), ("[Na+].[Cl-]",)],
        "smiles string",
    )
    out = {
        r["smiles"]: r["d"]
        for r in df.select(
            "smiles", molecular_descriptors(F.col("smiles")).alias("d")
        ).collect()
    }
    eth = out["CCO"]
    assert eth["n_heavy_atoms"] == 3 and eth["n_rings"] == 0
    assert abs(eth["heavy_molwt"] - (2 * 12.011 + 15.999)) < 0.05
    benz = out["c1ccccc1"]
    assert benz["n_heavy_atoms"] == 6 and benz["n_rings"] == 1
    assert out["C1CC1"]["n_rings"] == 1
    assert out[None]["n_heavy_atoms"] is None
    assert out["[Na+].[Cl-]"]["n_heavy_atoms"] == 2
