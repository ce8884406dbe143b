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


@given(
    u=st.integers(1, 99),
    r=st.integers(1, 99),
    s=st.integers(0, 99),
    body=st.from_regex(r"[A-Za-z0-9\-_\[\]]{0,20}", fullmatch=True),
)
@settings(max_examples=200, deadline=None)
def test_wurcs_counts_property(u, r, s, body):
    """wurcs_counts parses any well-formed header and rejects anything
    without one; the offline chain preserves the residue count into the
    final ring-polymer descriptor (pure-Python kernels — no Spark)."""
    from procoggraph_spark.functions import sugars as S

    w = f"WURCS=2.0/{u},{r},{s}/{body}"
    assert S.wurcs_counts(w) == (u, r, s)
    assert S.wurcs_counts(body if not body.startswith("WURCS=") else "x") is None

    desc = S.smiles_fallback(S.csdb_fallback(S.glycoct_fallback(w)))
    assert desc is not None
    assert desc.count(S._RING) == max(1, r)
    # bracket-balanced (the U5 fallback parse filter)
    assert desc.count("(") == desc.count(")")


@given(
    db=st.sampled_from(["CATH", "SCOP", "Pfam", "InterPro", "SCOP2", "SCOP2B", "Other"]),
    kind=st.sampled_from(["G3DSA:3.40.50.720", "SSF51735", "SF-DOMID:8033045",
                          "FA-DOMID:4000119", "PF00069", "2.40.110.10"]),
)
@settings(max_examples=60, deadline=None)
def test_normalize_domain_xrefs_property(spark, db, kind):
    """normalize_domain_xrefs invariants on arbitrary (db, acc) combos:
    output db is always a DomainKind key or an untouched pass-through;
    no G3DSA:/SF-DOMID:/FA-DOMID: wrapper survives on a mapped row; rows
    are never dropped or duplicated."""
    from procoggraph_spark.graph.model import DOMAIN_KINDS
    from procoggraph_spark.sources.parsers import normalize_domain_xrefs

    df = spark.createDataFrame(
        [(db, kind, None)], "xref_db string, xref_db_acc string, derived_from string"
    )
    out = normalize_domain_xrefs(df).collect()
    assert len(out) == 1
    row = out[0]
    if row["xref_db"] != db:
        # remapped rows land on a DomainKind key with wrappers stripped
        assert row["xref_db"] in DOMAIN_KINDS
        assert not row["xref_db_acc"].startswith(("G3DSA:", "SF-DOMID:", "FA-DOMID:"))
    else:
        # un-remapped rows pass through byte-identical (even nonsense
        # combos like CATH + a stray G3DSA: accession)
        assert row["xref_db_acc"] == kind
    if db == "SCOP2B":
        assert row["derived_from"] == "SCOP2B"


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=8,
        ),
        min_size=0,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_word_ngrams_matches_python_reference(spark, words, n):
    """The zip_with n-gram builder equals the obvious Python sliding
    window for any token list and window size (the shape the O(tokens^2)
    capture rewrite must preserve)."""
    from procoggraph_spark.operators.dedup import word_ngrams
    from pyspark.sql import functions as F

    text = " ".join(words)
    got = (
        spark.range(1)
        .select(word_ngrams(F.lit(text), n).alias("g"))
        .first()["g"]
    )
    # round-8 contract: word_ngrams uses the FILTERED tokenizer
    # (whitespace runs, no empty tokens) — exactly Python's str.split()
    toks = text.split()
    expect = (
        [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if len(toks) >= n
        else []
    )
    assert list(got or []) == expect


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40),
             min_size=1, max_size=60, unique=True),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=0, max_value=100),
)
def test_corpus_shuffle_is_permutation(spark, ids, n_shards, seed):
    """corpus_shuffle assigns every id (including negative ids) exactly
    one (shard, pos) with dense per-shard positions, for any shard
    count and seed."""
    from procoggraph_spark.operators.sampling import corpus_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = corpus_shuffle(
        df, id_col="doc_id", n_shards=n_shards, seed=seed
    ).collect()
    assert len(rows) == len(ids)
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


@given(
    texts=st.lists(
        st.text(alphabet="abcdef ", min_size=0, max_size=600), min_size=1, max_size=8
    ),
    chunk_size=st.integers(20, 200),
    overlap=st.integers(0, 19),
)
@settings(max_examples=20, deadline=None)
def test_chunk_documents_property(spark, texts, chunk_size, overlap):
    """For ANY text and any valid (chunk_size, overlap): chunks start at
    stride multiples, every chunk after the first adds at least one new
    character, the overlap region matches the previous chunk's tail,
    and concatenating first-chunk + per-chunk novel suffixes rebuilds
    the document exactly."""
    from procoggraph_spark.operators.text import chunk_documents

    stride = chunk_size - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(
        df, id_col="doc_id", text_col="text",
        chunk_size=chunk_size, overlap=overlap,
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        got = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        if not text:
            assert got == []
            continue
        assert got, f"non-empty doc {i} produced no chunks"
        assert got[0]["chunk_start"] == 0
        rebuilt = got[0]["chunk_text"]
        for prev, cur in zip(got, got[1:]):
            assert cur["chunk_start"] == prev["chunk_start"] + stride
            novel = cur["chunk_text"][len(prev["chunk_text"]) - stride:]
            assert novel, "chunk added no new characters"
            assert (
                prev["chunk_text"][stride:]
                == cur["chunk_text"][: len(prev["chunk_text"]) - stride]
            )
            rebuilt += novel
        assert rebuilt == text


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "cc", "dd", "e"]), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_bigram_logprob_matches_python_reference(spark, docs):
    """bigram_logprob must equal a direct pure-Python computation of the
    add-1-smoothed bigram cross-entropy on arbitrary small corpora —
    including single-word docs (no bigrams -> absent from output) and
    the derived history counts c(w1*) = sum_w2 c(w1 w2)."""
    import math
    from collections import Counter

    from procoggraph_spark.operators.text import bigram_logprob

    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_logprob(
        df, id_col="doc_id", text_col="text", k=1.0).collect()}

    # pure-Python reference (round-7 tokens() contract: no empty
    # tokens — an empty doc has ZERO tokens, contributes nothing to
    # the vocabulary, and has no bigrams)
    tok = {i: ws for i, ws in enumerate(docs)}
    bigrams = {i: list(zip(ws, ws[1:])) for i, ws in tok.items()}
    c12 = Counter(bg for bgs in bigrams.values() for bg in bgs)
    c1 = Counter(bg[0] for bgs in bigrams.values() for bg in bgs)
    vocab = len({w for ws in tok.values() for w in ws})
    for i, bgs in bigrams.items():
        if not bgs:
            assert i not in got
            continue
        want = sum(
            -math.log((c12[bg] + 1.0) / (c1[bg[0]] + 1.0 * vocab)) for bg in bgs
        ) / len(bgs)
        assert got[i]["n_bigrams"] == len(bgs)
        assert abs(got[i]["avg_neg_logprob_bigram"] - round(want, 6)) <= 1e-6, i


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-8, 8).map(lambda i: i / 16), min_size=8, max_size=8),
        min_size=4,
        max_size=12,
    )
)
def test_ivf_pq_index_twin_property(spark, vecs):
    """The column-algebra and Arrow-batched IVF+PQ index builders must
    agree row-for-row on arbitrary vector sets — including the heavy
    tie cases hypothesis gravitates to (duplicate vectors => duplicate
    centroids => exact distance ties resolved by the lowest-id
    convention on both backends). Components are dyadic rationals
    (i/16), so every squared distance is EXACTLY representable and the
    fold vs expanded-square forms compute the identical double — the
    property isolates the tie/ordering convention from the documented
    ~1e-13 float-cancellation caveat."""
    from procoggraph_spark.operators.pq import ivf_pq_index, ivf_pq_index_numpy

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = [(c, vecs[c]) for c in range(min(3, len(vecs)))]
    books = [
        [vecs[c][s * 2:(s + 1) * 2] for c in range(min(3, len(vecs)))]
        for s in range(4)
    ]

    def canon(d):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["pq_codes"])) for r in d.collect()
        )

    assert canon(ivf_pq_index(df, cents, books)) == canon(
        ivf_pq_index_numpy(df, cents, books)
    )


# --- round-6 portable-arithmetic properties --------------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=20, deadline=None)
def test_zorder_key_is_invertible(spark, pairs):
    """The Morton key must be a bijection on [0,256)^2: de-interleaving
    the key recovers both inputs exactly (no bit collisions/drops)."""
    df = spark.createDataFrame(pairs, "x long, y long")
    from procoggraph_spark.operators.layout import zorder_key

    got = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        x = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r["x"], r["y"])


@given(st.lists(st.integers(0, 2**31 - 2), min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_pseudo_embedding_matches_python(spark, fps):
    """pseudo_embedding replays exactly in pure Python (the portability
    contract the DuckDB oracles rely on), and every component lies in
    [-0.5, 0.5)."""
    from procoggraph_spark.operators.similarity import pseudo_embedding

    df = spark.createDataFrame([(f,) for f in fps], "fp long")
    got = df.select(
        "fp", pseudo_embedding(F.col("fp"), dim=4).alias("v")
    ).collect()
    for r in got:
        for j, c in enumerate(r["v"]):
            b = (r["fp"] % 2147483648) * (2 * j + 1) % 2147483648
            expect = (b * 2654435761 % 4294967296) / 4294967296.0 - 0.5
            assert c == expect
            assert -0.5 <= c < 0.5


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),                     # user
            st.integers(0, 30 * 86400),            # age offset seconds
        ),
        min_size=1,
        max_size=30,
    )
)
def test_recency_engagement_bounds_property(spark, rows):
    """Each hyperbolic-decay term lies in (0, 1], so per-user engagement
    is bounded by (0, n_events] and the newest event's user scores at
    least 1.0 — for ANY event layout."""
    from datetime import datetime, timedelta

    from procoggraph_spark.operators.analytics import (
        recency_weighted_engagement,
    )

    base = datetime(2024, 6, 1)
    data = [
        (i, base + timedelta(seconds=off), u, "view")
        for i, (u, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = recency_weighted_engagement(df).collect()
    newest_user = max(rows, key=lambda r: (r[1], -r[0]))[0]
    by_user = {r["user_id"]: r for r in out}
    assert set(by_user) == {u for u, _ in rows}
    for r in out:
        assert 0 < r["engagement"] <= r["n_events"] + 1e-9
    assert by_user[newest_user]["engagement"] >= 1.0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.text(alphabet="abcXYZ09_|", min_size=0, max_size=20),
             min_size=1, max_size=40),
    st.sampled_from([2, 8, 32]),
)
def test_hash_bucket_audit_partition_property(spark, feats, n_buckets):
    """The bucket audit is a partition of the feature vocabulary: row
    and feature counts are conserved, every bucket is in range, and
    collided mirrors n_features — for ANY feature strings (including
    empty and punctuation-only)."""
    from procoggraph_spark.operators.features import hash_bucket_audit

    df = spark.createDataFrame([(f,) for f in feats], "f string")
    out = hash_bucket_audit(df, F.col("f"), n_buckets=n_buckets).collect()
    assert sum(r["n_rows"] for r in out) == len(feats)
    assert sum(r["n_features"] for r in out) == len(set(feats))
    for r in out:
        assert 0 <= r["bucket"] < n_buckets
        assert r["collided"] == (r["n_features"] > 1)


# --- U7 select_cofactor vs the reference rule on arbitrary sets -------------

_COFACTOR_LABELS = (
    "Cofactor", "Coenzyme", "Prosthetic Group", "Siderophore", "N",
    "Other Role",
)


def _ref_select_cofactor(cofactor_set: set) -> str:
    """Pure-Python reimplementation of `get_ec_information.py:332-342`."""
    s = set(cofactor_set)
    if len(s) == 1:
        return next(iter(s))
    s.discard("N")
    inter = s & {"Coenzyme", "Prosthetic Group", "Siderophore"}
    if len(inter) == 1:
        return next(iter(inter))
    return "/".join(sorted(s))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.sets(st.sampled_from(_COFACTOR_LABELS), max_size=6),
        min_size=1,
        max_size=24,
    )
)
def test_select_cofactor_matches_reference_on_random_sets(spark, sets):
    from procoggraph_spark.functions.chem import select_cofactor

    df = spark.createDataFrame(
        [(i, sorted(s)) for i, s in enumerate(sets)],
        "i int, s array<string>",
    )
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", select_cofactor(F.col("s")).alias("out")
        ).collect()
    }
    for i, s in enumerate(sets):
        assert got[i] == _ref_select_cofactor(s), (s, got[i])


# --- batched-BPE sequential equivalence (pure-Python differential) --------

def _py_pair_counts(syms, wc):
    from collections import Counter

    pc = Counter()
    for w, s in syms.items():
        for x, y in zip(s, s[1:]):
            pc[(x, y)] += wc[w]
    return pc


def _py_apply_merge(syms, a, b):
    for w, s in syms.items():
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        syms[w] = out


def _py_bpe_sequential(words, n_merges):
    from collections import Counter

    wc = Counter(words)
    syms = {w: [*w, "</w>"] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = _py_pair_counts(syms, wc)
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        _py_apply_merge(syms, a, b)
    return merges, syms


def _py_bpe_batched(words, n_merges, batch_size):
    from collections import Counter

    from procoggraph_spark.operators.bpe import _select_batch

    wc = Counter(words)
    syms = {w: [*w, "</w>"] for w in wc}
    merges = []
    while len(merges) < n_merges:
        pc = _py_pair_counts(syms, wc)
        rows = [
            {"a": a, "b": b, "cnt": c}
            for (a, b), c in sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ]
        batch = _select_batch(
            rows,
            batch_size=min(batch_size, n_merges - len(merges)),
            complete=True,
        )
        if not batch:
            break
        merges.extend(batch)
        for a, b, _ in batch:
            _py_apply_merge(syms, a, b)
    return merges, syms


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=2, max_value=8),
)
def test_select_batch_sequential_equivalence(words, batch_size):
    """The round-8 batched-merge selection must be EXACTLY sequential-
    equivalent for ANY corpus — this is the proof in
    operators/bpe._select_batch under randomized attack. A two-letter
    alphabet maximizes symbol conflicts and count ties (the cases the
    conflict-stop and strict-truncation rules exist for); the whole
    differential runs in pure Python (the Spark fold's equivalence to
    the Python merge is pinned separately), so hundreds of corpora are
    cheap."""
    words = [w for w in words if w]
    if not words:
        return
    seq_m, seq_s = _py_bpe_sequential(words, 12)
    bat_m, bat_s = _py_bpe_batched(words, 12, batch_size)
    assert bat_m == seq_m
    assert bat_s == seq_s


# ---------------------------------------------------------------------------
# salted_join ≡ plain join, under randomized attack
# ---------------------------------------------------------------------------


def _py_join(fact, dim_keys, how):
    """Pure-Python reference for a fact-preserving equi-join of
    fact=(k, fid) rows against a dim key set."""
    if how == "inner":
        return sorted((k, fid) for k, fid in fact if k in dim_keys)
    if how == "left_semi":
        return sorted((k, fid) for k, fid in fact if k in dim_keys)
    if how == "left_anti":
        return sorted((k, fid) for k, fid in fact if k not in dim_keys)
    raise AssertionError(how)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-5, 5), st.integers(0, 10 ** 6)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[1],
    ),
    st.sets(st.integers(-5, 5), max_size=8),
    st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    st.integers(min_value=1, max_value=6),
)
def test_salted_join_equivalence_property(spark, fact_rows, dim_keys, how, salts):
    """operators.skew.salted_join must be value-identical to the plain
    join for EVERY accepted fact-preserving how, any salt count, and
    NEGATIVE keys too (the pmod-vs-% regression: a plain % emits a
    negative salt for negative keys and those fact rows silently
    vanish from the inner join against the 0..salts-1 dim replicas).
    The reference semantics are computed in pure Python; keys are
    drawn from a tiny domain so hot keys (many fact rows on one key —
    the operator's raison d'être) occur constantly."""
    from procoggraph_spark.operators.skew import salted_join

    fact = spark.createDataFrame(fact_rows, "k long, fid long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in sorted(dim_keys)], "k long, name string"
    )
    got = salted_join(fact, dim, key_col="k", salt_from="fid", salts=salts, how=how)
    if how == "left":
        rows = [
            (r["name"] and int(r["name"][1:]), r["fid"])
            for r in got.select("name", "fid").collect()
        ]
        expect = [
            (k if k in dim_keys else None, fid) for k, fid in fact_rows
        ]
        # None sorts incomparably vs int in py3: compare as multisets
        assert sorted(rows, key=str) == sorted(expect, key=str)
    else:
        rows = sorted((r["k"], r["fid"]) for r in got.select("k", "fid").collect())
        assert rows == _py_join(fact_rows, dim_keys, how)
