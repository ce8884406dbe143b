"""Semantic tests for the round-6 fourth-batch operators (the
star_llmops7 registry rows): normalized dedup, OOV audit, skew
diagnostics, salted join, SCD2 merge, and the RAG index capstone.
Oracle parity is covered by test_oracle_parity; these pin the operator
SEMANTICS on constructed inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from procoggraph_spark.operators.dedup import exact_dedup
from procoggraph_spark.operators.skew import (
    key_skew_audit,
    salted_join,
)
from procoggraph_spark.operators.temporal import scd2_merge
from procoggraph_spark.operators.text import normalize_text, oov_rate


def test_normalize_text_collapses_variants(spark):
    """Case/punct/whitespace variants normalize to the same key; a
    genuinely different text does not."""
    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO----WORLD"),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    d = df.withColumn("k", F.md5(normalize_text(F.col("text"))))
    out = {
        r["canonical_doc_id"]: r["n_copies"]
        for r in exact_dedup(d, key_cols=["k"], id_col="doc_id").collect()
    }
    assert out == {1: 3, 4: 1}


def test_oov_rate_vocab_cut_and_ties(spark):
    """With vocab_size=1 only the most frequent term is in-vocab; the
    frequency tie breaks lexicographically."""
    df = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "bb cc aa aa")], "doc_id long, text string"
    )
    # counts: aa=4, bb=2, cc=1 -> vocab {aa}
    out = {r["doc_id"]: r for r in oov_rate(df, vocab_size=1).collect()}
    assert out[1]["n_oov"] == 1 and out[1]["oov_rate"] == round(1 / 3, 6)
    assert out[2]["n_oov"] == 2 and out[2]["oov_rate"] == 0.5
    # tie: with 'aa aa bb bb', vocab_size=1 keeps 'aa' (lexicographic)
    df2 = spark.createDataFrame([(1, "aa aa bb bb")], "doc_id long, text string")
    r = oov_rate(df2, vocab_size=1).collect()[0]
    assert r["n_oov"] == 2


def test_key_skew_audit_flags_hot_key(spark):
    """90 rows on one key + 10 singleton keys: the hot key ranks first
    with share 0.9 and skew_ratio 9.9 (11 keys, mean 100/11)."""
    rows = [(1,)] * 90 + [(100 + i,) for i in range(10)]
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_audit(df, "k", top_k=3).collect()
    head = [r for r in out if r["rank"] == 1][0]
    assert head["k"] == 1 and head["n_rows"] == 90
    assert head["row_share"] == 0.9
    assert head["skew_ratio"] == round(90 * 11 / 100, 6)


def test_salted_join_equals_plain_join(spark):
    """The salted join is value-identical to the plain join, including
    rows under the hot key, for inner and left joins."""
    fact = spark.createDataFrame(
        [(1, i, 10.0) for i in range(50)] + [(2, 100, 5.0), (9, 101, 1.0)],
        "k long, row_id long, qty double",
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    plain = sorted(
        map(tuple, fact.join(dim, "k").select("k", "row_id", "name").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(fact, dim, key_col="k", salt_from="row_id", salts=4)
            .select("k", "row_id", "name")
            .collect(),
        )
    )
    assert plain == salted
    # left join keeps the dangling fact row exactly once
    left = salted_join(
        fact, dim, key_col="k", salt_from="row_id", salts=4, how="left"
    )
    assert left.count() == 52
    assert left.filter(F.col("k") == 9).count() == 1


def test_scd2_merge_three_cases(spark):
    """Unchanged key -> one current v1 row; changed -> closed v1 + open
    v2; inserted -> current v1; a no-op delta row (same value) counts
    as unchanged."""
    base = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "k long, attr string"
    )
    updates = spark.createDataFrame(
        [(2, "B2"), (3, "C"), (4, "D")], "k long, attr string"
    )
    out = sorted(
        map(
            tuple,
            scd2_merge(base, updates, key_col="k", attr_col="attr").collect(),
        )
    )
    assert out == [
        (1, "A", 1, True),
        (2, "B", 1, False),
        (2, "B2", 2, True),
        (3, "C", 1, True),
        (4, "D", 1, True),
    ]


def test_scd2_merge_null_attr_rows_survive(spark):
    """A present row with a NULL attribute is present (not dropped):
    NULL -> value is a change; NULL -> NULL is unchanged."""
    base = spark.createDataFrame([(1, None), (2, None)], "k long, attr string")
    updates = spark.createDataFrame([(1, "X"), (2, None)], "k long, attr string")
    out = sorted(
        map(
            tuple,
            scd2_merge(base, updates, key_col="k", attr_col="attr").collect(),
        ),
        key=str,
    )
    assert (1, None, 1, False) in out and (1, "X", 2, True) in out
    assert (2, None, 1, True) in out and len(out) == 3


def test_rag_pipeline_retrieval_contract(spark):
    """The registry capstone returns 3 cross-document neighbors per
    query chunk, never a same-document chunk, with ranks 1..3 in
    descending similarity."""
    from procoggraph_spark.queries.star_llmops7 import rag_index_pipeline
    from tests.conftest import SF_SMOKE

    out = rag_index_pipeline(spark, SF_SMOKE).collect()
    per_q = {}
    for r in out:
        assert r["neighbor_doc"] != r["query_doc"]
        per_q.setdefault((r["query_doc"], r["query_start"]), []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3]
        sims = [r["cosine_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_scd2_apply_generalizes_merge(spark):
    """scd2_apply(snapshot-as-history, delta) equals scd2_merge(base,
    delta); a second apply builds version-3 history."""
    from procoggraph_spark.operators.temporal import (
        scd2_apply,
        scd2_from_snapshot,
    )

    base = spark.createDataFrame([(1, "A"), (2, "B")], "k long, attr string")
    d1 = spark.createDataFrame([(2, "B2"), (3, "C")], "k long, attr string")
    h0 = scd2_from_snapshot(base, key_col="k", attr_col="attr")
    h1 = scd2_apply(h0, d1, key_col="k", attr_col="attr")
    merged = scd2_merge(base, d1, key_col="k", attr_col="attr")
    assert sorted(map(tuple, h1.collect())) == sorted(
        map(tuple, merged.collect())
    )
    d2 = spark.createDataFrame([(2, "B3")], "k long, attr string")
    h2 = sorted(map(tuple, scd2_apply(h1, d2, key_col="k", attr_col="attr").collect()))
    assert h2 == [
        (1, "A", 1, True),
        (2, "B", 1, False),
        (2, "B2", 2, False),
        (2, "B3", 3, True),
        (3, "C", 1, True),
    ]


def test_scd2_apply_intra_batch_conflict_deterministic(spark):
    """Two conflicting attr values for one key in a single delta
    resolve to the greatest value, deterministically."""
    from procoggraph_spark.operators.temporal import (
        scd2_apply,
        scd2_from_snapshot,
    )

    base = spark.createDataFrame([(1, "A")], "k long, attr string")
    delta = spark.createDataFrame(
        [(1, "X"), (1, "Z"), (1, "Y")], "k long, attr string"
    )
    h = scd2_apply(
        scd2_from_snapshot(base, key_col="k", attr_col="attr"),
        delta,
        key_col="k",
        attr_col="attr",
    )
    assert sorted(map(tuple, h.collect())) == [
        (1, "A", 1, False),
        (1, "Z", 2, True),
    ]


def test_salted_join_negative_keys_not_dropped(spark):
    """A negative salt_from value must still produce a salt in
    [0, salts) — no silent row loss in the inner join."""
    fact = spark.createDataFrame(
        [(1, -5, 1.0), (1, -2147483600, 2.0)], "k long, row_id long, qty double"
    )
    dim = spark.createDataFrame([(1, "a")], "k long, name string")
    out = salted_join(fact, dim, key_col="k", salt_from="row_id", salts=4)
    assert out.count() == 2


def test_data_card_first_gate_attribution(spark):
    """Counts sum to n_docs; a doc failing multiple gates is attributed
    to the FIRST gate in pipeline order (language before quality)."""
    from procoggraph_spark.operators.text import curation_data_card

    rows = [
        # fails lang AND quality -> attributed to lang
        (1, "s1", "zz der und das die nicht ist"),
        # passes lang (en marker), fails quality: punct-saturated, short,
        # mean word length out of range -> q = 0.4475 < 0.5
        (2, "s1", "the " + "!" * 25),
        # kept: long enough, stopwords, clean
        (
            3,
            "s1",
            "the quick brown fox jumps over a lazy dog and it runs to the "
            "den with speed and grace while birds are watching from an oak",
        ),
        # repetition: passes lang+quality but repeats one bigram heavily
        (4, "s2", "the cat sat and " * 30 + "the end is near in the it of"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in curation_data_card(df).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3
    assert (
        s1["n_drop_lang"] + s1["n_drop_quality"] + s1["n_drop_repetition"]
        + s1["n_kept"]
        == 3
    )
    assert s1["n_drop_lang"] == 1 and s1["n_drop_quality"] == 1
    assert s1["n_kept"] == 1
    assert out["s2"]["n_drop_repetition"] == 1


def test_target_encode_smoothing_pulls_rare_categories(spark):
    """A 1-row category encodes near the global mean; a heavy category
    encodes near its own mean; exact arithmetic check on tiny input."""
    from procoggraph_spark.operators.features import target_encode

    rows = [("big", 100.0)] * 90 + [("rare", 500.0)]
    df = spark.createDataFrame(rows, "cat string, price double")
    out = {
        r["cat"]: r
        for r in target_encode(
            df, category_col="cat", target_col="price", smoothing=10.0
        ).collect()
    }
    gmean = (90 * 100.0 + 500.0) / 91
    assert out["rare"]["cat_mean"] == 500.0
    assert out["rare"]["encoded"] == round((500.0 + 10 * gmean) / 11, 6)
    assert abs(out["rare"]["encoded"] - gmean) < abs(500.0 - gmean) * 0.2
    assert out["big"]["encoded"] == round(
        (9000.0 + 10 * gmean) / 100, 6
    )


def test_robust_scale_clips_outliers(spark):
    """Values below p05 / above p95 clip to the band edges (scaled 0/1);
    interior values scale linearly; a constant group scales to 0."""
    from procoggraph_spark.operators.features import robust_scale

    rows = [(i, "g", v) for i, v in enumerate([0, 10, 20, 30, 40, 50, 60,
                                               70, 80, 90, 100, 110, 120,
                                               130, 140, 150, 160, 170,
                                               180, 100000])]
    rows += [(100 + i, "const", 7) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    out = robust_scale(
        df, id_col="id", group_col="grp", value_col="v"
    ).collect()
    g = {r["id"]: r for r in out if r["grp"] == "g"}
    # n=20: lo_rank=1 -> 0, hi_rank=19 -> 180
    assert g[0]["scaled"] == 0.0
    assert g[19]["clipped"] == 180 and g[19]["scaled"] == 1.0
    assert g[9]["scaled"] == 0.5
    const = [r for r in out if r["grp"] == "const"]
    assert all(r["scaled"] == 0.0 and r["clipped"] == 7 for r in const)


def test_release_diff_statuses(spark):
    """Added / removed / changed / unchanged classify correctly on a
    constructed two-version corpus."""
    from procoggraph_spark.queries.star_llmops7 import corpus_release_diff
    from tests.conftest import SF_SMOKE

    out = corpus_release_diff(spark, SF_SMOKE).collect()
    tot = {
        k: sum(r[k] for r in out)
        for k in ("n_added", "n_removed", "n_changed", "n_unchanged")
    }
    # v1 = ids %7!=0 (428 of 500); v2 = ids %3!=0 (333); changed where
    # both present and %5==0
    assert tot["n_added"] > 0 and tot["n_removed"] > 0
    assert tot["n_changed"] > 0 and tot["n_unchanged"] > 0
    n_docs = 500
    in_v1 = sum(1 for i in range(n_docs) if i % 7 != 0)
    in_v2 = sum(1 for i in range(n_docs) if i % 3 != 0)
    both = sum(1 for i in range(n_docs) if i % 7 != 0 and i % 3 != 0)
    assert tot["n_removed"] == in_v1 - both
    assert tot["n_added"] == in_v2 - both
    assert tot["n_changed"] == sum(
        1 for i in range(n_docs) if i % 7 != 0 and i % 3 != 0 and i % 5 == 0
    )
    assert tot["n_unchanged"] == both - tot["n_changed"]


def test_length_buckets_padding_bound(spark):
    """Every band's padding waste is under 50% (the power-of-two
    guarantee) and pad_to is the band ceiling."""
    from procoggraph_spark.queries.star_llmops7 import serve_length_buckets
    from tests.conftest import SF_SMOKE

    out = serve_length_buckets(spark, SF_SMOKE).collect()
    assert out
    for r in out:
        assert r["pad_to"] == 2 ** r["bucket"]
        assert r["padding_waste"] < 0.5
        assert r["real_tokens"] + r["padding_tokens"] == r["n_docs"] * r["pad_to"]


def test_centroid_drift_detects_planted_shift(spark):
    """Identical halves drift 0; a planted constant offset on one half
    reports exactly its L2 norm."""
    from procoggraph_spark.operators.similarity import pseudo_embedding  # noqa: F401
    from procoggraph_spark.queries.star_llmops7 import emb_centroid_drift  # noqa: F401
    from pyspark.sql import functions as F

    rows = []
    for i in range(40):
        v = [float(j) for j in range(4)]
        if i % 2 == 1:
            v = [x + (3.0 if i % 2 else 0.0) for x in v]  # half 1 shifted by 3 per dim
        rows.append((i, v, 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    e = df.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("_pos", "_x"),
    )
    dims = e.groupBy("label", "half", "_pos").agg(F.avg("_x").alias("m"))
    a = dims.filter(F.col("half") == 0).select("label", "_pos", F.col("m").alias("m0"))
    b = dims.filter(F.col("half") == 1).select("label", "_pos", F.col("m").alias("m1"))
    got = (
        a.join(b, ["label", "_pos"])
        .groupBy("label")
        .agg(F.round(F.sqrt(F.sum((F.col("m0") - F.col("m1")) ** 2)), 6).alias("s"))
        .collect()[0]["s"]
    )
    assert got == round((3.0**2 * 4) ** 0.5, 6)


def test_normalize_text_ascii_case_fold_is_engine_portable(spark):
    """Case-mapping contract (round-11 fuzz leg): the dedup content key
    case-folds ASCII ONLY, because full Unicode case mapping is
    locale-fraught and engine-specific — Java maps İ -> i+combining-dot,
    ß upper -> SS, ﬁ -> FI, trailing Σ -> ς while utf8proc does 1:1
    mappings. The Spark key and the DuckDB twin must agree byte-for-byte
    on exactly the texts where engine lower() does not."""
    import duckdb

    texts = [
        (0, "İstanbul ıspanak SİVAS normalized"),
        (1, "straße ẞeta GROßE footnotes"),
        (2, "ΣΟΦΟΣ σοφόΣ τέλοΣ paragraph"),
        (3, "ﬁle ﬂow oﬃce ǅungla ǅENTRY"),
        (4, "Plain ASCII Mixed CASE 42!"),
        (5, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("k")
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT doc_id, trim(regexp_replace("
            "translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
            " 'abcdefghijklmnopqrstuvwxyz'),"
            " '[^a-z0-9]+', ' ', 'g')) FROM (VALUES "
            + ", ".join(
                f"({i}, {'NULL' if t is None else repr(t)})"
                for i, t in texts
            )
            + ") v(doc_id, text)"
        ).fetchall()
    )
    assert got == want
    assert got[4] == "plain ascii mixed case 42"
    # non-ASCII letters fall to the strip on BOTH engines — İ/ß/Σ never
    # reach the key, so no locale mapping can diverge it
    assert "stanbul" in got[0] and "ß" not in got[1]


def test_pareto_null_source_tie_is_engine_stable(spark, tmp_path):
    """NULL-tiebreak contract (round-11 case-mapping leg side-find): the
    Pareto cumulative window tiebreaks on the nullable source column,
    and Spark's asc default is NULLS FIRST while DuckDB's is NULLS LAST
    — a token-count tie involving the NULL-source group reorders the
    cumulative sums unless both faces pin NULLS LAST explicitly."""
    import duckdb

    from procoggraph_spark.queries import registry

    qs, oracles = registry()
    sf = str(tmp_path)
    rows = [
        (1, "alpha beta gamma", "src1"),   # 3 tokens
        (2, "one two three", None),        # 3 tokens — TIES with src1
        (3, "a b", "src2"),                # 2 tokens
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    got = sorted(
        (str(r["source"]), r["n_tokens"], r["cum_share"], r["in_top80"])
        for r in qs["corpus_pareto_coverage"](spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(
        (str(r[0]), int(r[1]), float(r[2]), bool(r[3]))
        for r in con.execute(oracles["corpus_pareto_coverage"]).fetchall()
    )
    assert [(s, n) for s, n, *_ in got] == [(s, n) for s, n, *_ in want]
    assert got == want
