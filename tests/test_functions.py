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


# --- U7: cofactor priority resolution ---------------------------------------


def test_select_cofactor_boundaries(spark):
    """Mirror of select_cofactor (get_ec_information.py:332-342) on every
    branch: singleton (incl. the 'N'-only set, which must survive the
    fast path BEFORE the discard), single-subgroup pick over the generic
    'Cofactor', multi-subgroup tie -> sorted '/'-join, and the empty
    set -> empty string."""
    from procoggraph_spark.functions.chem import select_cofactor

    def ref(cofactor_set):  # the reference's own algorithm, reimplemented
        s = set(cofactor_set)
        if len(s) == 1:
            return next(iter(s))
        s.discard("N")
        inter = s & {"Coenzyme", "Prosthetic Group", "Siderophore"}
        if len(inter) == 1:
            return next(iter(inter))
        return "/".join(sorted(s))

    cases = [
        ["Coenzyme"],                              # singleton fast path
        ["N"],                                     # 'N'-only singleton
        ["N", "Coenzyme"],                         # discard-N then subgroup
        ["Cofactor", "Siderophore"],               # subgroup beats generic
        ["Cofactor", "N", "Prosthetic Group"],     # both rules together
        ["Coenzyme", "Prosthetic Group"],          # two subgroups -> join
        ["Cofactor", "Coenzyme", "Siderophore"],   # tie w/ generic -> join
        ["Cofactor", "N"],                         # generic only survives
        [],                                        # empty -> ""
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, s array<string>"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", select_cofactor(F.col("s")).alias("out")).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == ref(c), (c, got[i], ref(c))


def test_resolve_cofactor_classes_stage(spark):
    """U7 full stage (get_ec_information.py:673-691): CHEBI xref
    extraction from ligand_db, has_role classification, fillna 'N',
    set-collapse. Ligands with no CHEBI xref at all must still come out
    as 'N' (the explode is an OUTER explode)."""
    from procoggraph_spark.functions.chem import resolve_cofactor_classes

    ligands = spark.createDataFrame(
        [
            (1, "KEGG:C00001|CHEBI:11|CHEBI:22"),  # Coenzyme + generic
            (2, "CHEBI:33"),                       # unmatched -> N
            (3, "KEGG:C00002"),                    # no xref -> N
            (4, "CHEBI:11|CHEBI:44"),              # two subgroups -> join
        ],
        "uniqueID int, ligand_db string",
    )
    roles = spark.createDataFrame(
        [("11", "Coenzyme"), ("22", "Cofactor"), ("44", "Siderophore")],
        "FINAL_ID string, isCofactor string",
    )
    out = {
        r["uniqueID"]: r["isCofactor"]
        for r in resolve_cofactor_classes(ligands, roles).collect()
    }
    assert out == {
        1: "Coenzyme",
        2: "N",
        3: "N",
        4: "Coenzyme/Siderophore",
    }


def test_resolve_cofactor_classes_numeric_key_normalization(spark):
    """The CHEBI join must be numeric (the reference floats both
    sides, get_ec_information.py:682-687): a double-typed FINAL_ID
    (CSV inference yields 11.0) and a leading-zero xref (CHEBI:0011)
    must still meet — a string join would see '11.0' != '11' != '0011'
    and silently classify everything 'N'."""
    from procoggraph_spark.functions.chem import resolve_cofactor_classes

    ligands = spark.createDataFrame(
        [(1, "CHEBI:0011"), (2, "CHEBI:22")],
        "uniqueID int, ligand_db string",
    )
    roles = spark.createDataFrame(
        [(11.0, "Coenzyme"), (22.0, "Cofactor")],
        "FINAL_ID double, isCofactor string",
    )
    out = {
        r["uniqueID"]: r["isCofactor"]
        for r in resolve_cofactor_classes(ligands, roles).collect()
    }
    assert out == {1: "Coenzyme", 2: "Cofactor"}
