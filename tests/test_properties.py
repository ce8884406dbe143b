"""Property tests (SURVEY §5): the Spark string/range normalizers must
agree with straightforward pure-Python reimplementations of the
reference's pandas helpers on randomized inputs. Hypothesis drives the
input space; each property collects one Spark round-trip per example
batch (examples are batched into a single DataFrame per property to
keep JVM round-trips bounded)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from procoggraph_spark.functions.strings import (
    pattern_to_range,
    sort_tokens_numeric_inscode,
    strip_chars,
)

# bounded alphabets keep shrinking fast and avoid pathological regex
# inputs that the reference formats can't contain anyway
token_st = st.from_regex(r"[0-9]{1,4}(_[A-Z])?", fullmatch=True)
range_st = st.one_of(
    st.tuples(st.integers(0, 500), st.integers(0, 500)).map(
        lambda ab: f"({min(ab)}-{max(ab)})"
    ),
    st.integers(0, 9999).map(str),
    st.just(""),
)


def _ref_inscode_sort(tokens: list[str]) -> list[str]:
    """Reference semantics (`process_pdb_contacts.py:40-44`): sort by
    (numeric prefix, inscode); our documented divergence adds the token
    itself as the final tiebreak for partitioning-independence."""

    def k(tok):
        m = re.match(r"^(\d+)_*(\D*)", tok)
        num = int(m.group(1)) if m and m.group(1) else None
        ins = m.group(2) if m else ""
        return (num if num is not None else -1, ins, tok)

    return sorted(tokens, key=k)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(token_st, min_size=1, max_size=8), min_size=1, max_size=8))
def test_inscode_sort_property(spark, batches):
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(batches)], "i long, toks array<string>"
    )
    got = {
        r["i"]: r["s"]
        for r in df.select(
            "i", sort_tokens_numeric_inscode(F.col("toks")).alias("s")
        ).collect()
    }
    for i, toks in enumerate(batches):
        assert got[i] == "|".join(_ref_inscode_sort(toks)), toks


def _ref_pattern_to_range(s: str) -> list[int] | None:
    """Reference `pattern_to_range` (`process_pdb_structure.py:12-14`)
    semantics: "(a-b)" → [a..b]; bare int → [int]; else null."""
    m = re.search(r"(\d+)\s*-\s*(\d+)", s)
    if m:
        return list(range(int(m.group(1)), int(m.group(2)) + 1))
    m = re.match(r"^\(?(\d+)\)?$", s)
    return [int(m.group(1))] if m else None


@settings(max_examples=30, deadline=None)
@given(st.lists(range_st, min_size=1, max_size=16))
def test_pattern_to_range_property(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    got = {
        r["i"]: r["rng"]
        for r in df.select("i", pattern_to_range(F.col("v")).alias("rng")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == _ref_pattern_to_range(v), v


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.text(alphabet="ab\n; .", max_size=12), min_size=1, max_size=16),
    st.sampled_from(["\n;", " .", ";"]),
)
def test_strip_chars_property(spark, vals, chars):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", strip_chars(F.col("v"), chars).alias("s")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == v.strip(chars), repr(v)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=30, unique=True
    )
)
@settings(max_examples=20, deadline=None)
def test_hash_bucket_portable_arithmetic(spark, ids):
    """The sampling hash bucket must equal the pure-arithmetic SQL
    formula for ANY 64-bit id — this is the property that lets a DuckDB
    oracle (or any engine) reproduce split/sample/mix decisions
    exactly."""
    from pyspark.sql import functions as F

    from procoggraph_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }
    want = {i: ((i % 2147483648) * 2654435761) % 4294967296 % 100 for i in ids}
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1, max_size=40),
        min_size=1, max_size=12, unique=True,
    )
)
def test_cms_bucket_matches_portable_arithmetic(spark, keys):
    """Every CMS cell assignment must equal the pure-integer SQL formula
    for arbitrary printable-ASCII keys — the property that lets any
    engine rebuild the identical sketch (and the reason the approximate
    counts can be hash-compared at all)."""
    from pyspark.sql import functions as F

    from procoggraph_spark.operators.sketches import _MOD, _MULT_BASE, _MULT_STEP, _ADD_STEP, _bucket
    from procoggraph_spark.operators.text import positional_fingerprint

    df = spark.createDataFrame([(k,) for k in keys], "term string")
    h = positional_fingerprint(F.col("term"))
    got = {
        (r["term"], rr): r[f"b{rr}"]
        for r in df.select(
            "term", *[_bucket(h, rr, 64).alias(f"b{rr}") for rr in range(4)]
        ).collect()
        for rr in range(4)
    }
    for k in keys:
        fp = sum(ord(c) * (i + 1) for i, c in enumerate(k[:64])) % 2147483647
        for rr in range(4):
            want = ((fp * (_MULT_BASE + rr * _MULT_STEP) + rr * _ADD_STEP) % _MOD) % 64
            assert got[(k, rr)] == want
