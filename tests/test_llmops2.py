"""Semantics tests for the round-5 second-batch operators: context
chunking, leakage-safe split, Bloom decontamination, packed-context
materialization, and the training-shard writer. Oracle parity for the
four registry queries runs in test_oracle_parity.py; these tests pin
the operator CONTRACTS (reconstruction, no-straddle, no-false-negative,
layout) that a value-hash alone doesn't express.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from procoggraph_spark.operators.dedup import (
    benchmark_contamination,
    bloom_decontaminate,
)
from procoggraph_spark.operators.sampling import (
    corpus_shuffle,
    deterministic_split,
    leakage_safe_split,
)
from procoggraph_spark.operators.text import chunk_documents
from tests.conftest import SF_SMOKE


def test_chunk_documents_reconstructs_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "a" * 450),
            (2, "short"),
            (3, "x" * 200),            # exactly one chunk
            (4, "y" * 201),            # tail chunk of 41 chars (overlap 40 + 1)
            (5, ""),                   # empty: no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_size=200, overlap=40
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 5 not in by_doc  # empty doc emits nothing
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        # chunk boundaries: stride 160, full coverage, overlap carried
        rebuilt = rows[0]["chunk_text"]
        for prev, cur in zip(rows, rows[1:]):
            assert cur["chunk_start"] == prev["chunk_start"] + 160
            # every non-final chunk is full, so the first 40 chars of
            # each chunk repeat the prior chunk's tail (the overlap)
            assert len(prev["chunk_text"]) == 200
            assert prev["chunk_text"][160:] == cur["chunk_text"][:40]
            rebuilt += cur["chunk_text"][40:]
        assert rebuilt == texts[doc_id], doc_id
        assert all(1 <= r["chunk_len"] <= 200 for r in rows)
    # a doc of exactly chunk_size chars is ONE chunk: the window at 160
    # would contain only overlap and is skipped
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_len"] == 200
    # one char past chunk_size: the second window adds that char
    assert len(by_doc[4]) == 2 and by_doc[4][-1]["chunk_len"] == 41


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, id_col="doc_id", text_col="text",
                        chunk_size=100, overlap=100)


def test_leakage_safe_split_never_straddles(spark):
    # 60 duplicate groups; copies of a group carry ids spread far apart,
    # so a per-row hash split WOULD scatter them across splits
    rows = []
    for g in range(60):
        for c in range(3):
            rows.append((g + 1000 * c, f"dup group {g} canonical text body"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "kp", F.substring("text", 1, 40)
    )
    out = leakage_safe_split(
        docs, id_col="doc_id", key_cols=["kp"],
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).collect()
    by_key: dict[str, set] = {}
    canon: dict[str, set] = {}
    for r in out:
        by_key.setdefault(r["kp"], set()).add(r["split"])
        canon.setdefault(r["kp"], set()).add(r["canonical_id"])
    assert len(out) == 180
    for k, splits in by_key.items():
        assert len(splits) == 1, f"group {k} straddles splits: {splits}"
        assert len(canon[k]) == 1
    # the baseline per-row split DOES straddle on this data (the hazard
    # this operator removes) — guards against a vacuous test
    base = deterministic_split(
        docs, id_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).collect()
    base_by_key: dict[str, set] = {}
    for r in base:
        base_by_key.setdefault(r["kp"], set()).add(r["split"])
    assert any(len(s) > 1 for s in base_by_key.values())


def test_bloom_decontaminate_matches_exact_and_never_misses(spark):
    bench = spark.createDataFrame(
        [(0, "the secret eval question about spark shuffles and codegen")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "intro words then the secret eval question about spark "
                 "shuffles and codegen plus trailing text"),
            (11, "completely unrelated content with its own distinct vocabulary"),
            (12, "two words"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bloom_decontaminate(
        corpus, bench, id_col="doc_id", text_col="text", n=3).collect()}
    exact = {r["doc_id"]: r for r in benchmark_contamination(
        corpus, bench, id_col="doc_id", text_col="text", n=3).collect()}
    assert set(got) == set(exact)
    for doc_id, e in exact.items():
        g = got[doc_id]
        # phase-2 refine makes the final counts exactly the exact ones
        assert g["n_shingles"] == e["n_shingles"]
        assert g["n_contaminated"] == e["n_contaminated"]
        assert g["contamination_ratio"] == e["contamination_ratio"]
        # Bloom has no false negatives: candidates bound contaminated
        assert g["n_candidates"] >= g["n_contaminated"]
        assert g["n_candidates"] <= g["n_shingles"]


def test_bloom_prunes_clean_shingles(spark):
    # with a tiny benchmark and a 4096-bit filter the clean doc's
    # shingles should essentially all be pruned before the exact join
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(10, " ".join(f"tok{i} tok{i+1} tok{i+2}" for i in range(50)))],
        "doc_id long, text string",
    )
    row = bloom_decontaminate(
        corpus, bench, id_col="doc_id", text_col="text", n=3).collect()[0]
    assert row["n_contaminated"] == 0
    # 4 benchmark trigrams × 3 bits in 4096 → expected FP rate ~3e-9 per
    # probe; even 1% of shingles surviving would signal a broken filter
    assert row["n_candidates"] <= row["n_shingles"] * 0.01


def test_write_training_shards_layout_and_order(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    shuffled = corpus_shuffle(docs, id_col="doc_id", n_shards=4, seed=7)
    expected: dict[int, list] = {}
    for r in shuffled.collect():
        expected.setdefault(r["shard"], []).append((r["shard_pos"], r["doc_id"]))
    for v in expected.values():
        v.sort()

    from procoggraph_spark.sources.sinks import write_training_shards

    out_dir = str(tmp_path / "shards")
    write_training_shards(shuffled, out_dir)

    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/shard=*"))
    assert dirs == [f"shard={s}" for s in sorted(expected)]
    for shard, exp in expected.items():
        files = glob.glob(f"{out_dir}/shard={shard}/*.parquet")
        assert len(files) == 1, f"shard {shard} should be one file"
        tbl = pq.read_table(files[0]).to_pydict()
        # rows stored in training order: on-disk order == pos order
        assert tbl["shard_pos"] == [p for p, _ in exp]
        assert tbl["doc_id"] == [d for _, d in exp]


def test_hll_union_merge_bounded_error_and_deterministic(spark):
    """Union-merging per-shard HLL sketches approximates sketching the
    whole corpus directly — the property that lets 100 TB cardinality
    roll up shard-by-shard without re-shuffling the key space. The
    merge is NOT estimate-exact at small cardinalities (a direct sketch
    stays in exact sparse/list mode; the union promotes to dense HLL
    mode — measured here: 988 vs 1000 for 997 true distinct), so the
    contract is bounded error plus determinism, not equality."""
    df = spark.createDataFrame(
        [(i % 7, f"term{i % 997}") for i in range(5000)], "shard long, term string"
    )
    per_shard = df.groupBy("shard").agg(F.hll_sketch_agg("term").alias("sk"))
    merged = per_shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("term")).alias("est")
    ).collect()[0]["est"]
    assert abs(merged - 997) <= 0.05 * 997
    assert abs(direct - 997) <= 0.05 * 997
    rerun = per_shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    assert rerun == merged


def test_hll_estimate_accuracy_and_all_row(spark):
    """Driver contract of sketch_hll_distinct: every row's 5%-tolerance
    flag holds (that IS what the oracle hashes), the __ALL__ row
    carries the corpus-wide EXACT distinct from the same rollup pass,
    and the per-source exacts recompute independently."""
    from procoggraph_spark.queries import registry

    qs, _ = registry()
    rows = {r["source"]: r for r in
            qs["sketch_hll_distinct"](spark, SF_SMOKE).collect()}
    assert "__ALL__" in rows
    assert all(r["hll_within_tol"] for r in rows.values()), rows
    from procoggraph_spark.operators import text as X
    from procoggraph_spark.queries.common import t as load

    d = load(spark, SF_SMOKE, "documents")
    tok = d.select("source", F.explode(X.tokens(F.col("text"))).alias("term"))
    exact_all = tok.select("term").distinct().count()
    assert rows["__ALL__"]["exact_distinct"] == exact_all
    per = {r["source"]: r["cnt"] for r in
           tok.groupBy("source").agg(
               F.count_distinct("term").alias("cnt")).collect()}
    for src, cnt in per.items():
        assert rows[src]["exact_distinct"] == cnt, src


def test_learned_quality_distills_the_gate(spark):
    """The trained linear model must agree with the heuristic gate it
    distills on a large majority of held-out documents, and training
    must be deterministic for fixed input."""
    from procoggraph_spark.operators.classifier import featurize, score, train_logreg
    from procoggraph_spark.operators.text import corpus_keep_decision
    from procoggraph_spark.queries.common import t as load

    d = load(spark, SF_SMOKE, "documents")
    labeled = featurize(
        d.withColumn("label", corpus_keep_decision(F.col("text")).cast("int")),
        text_col="text", n_features=64,
    ).localCheckpoint(eager=True)
    train = labeled.filter(F.col("doc_id") % 5 != 0)
    test = labeled.filter(F.col("doc_id") % 5 == 0)
    w, b = train_logreg(train, n_features=64, iters=30, lr=2.0)
    scored = score(test, w, b).withColumn(
        "pred", (F.col("prob") >= 0.5).cast("int")
    )
    agg = scored.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
        F.avg("label").alias("base"),
    ).collect()[0]
    # must beat always-predict-majority AND clear a floor
    majority = max(agg["base"], 1 - agg["base"])
    assert agg["acc"] >= max(0.75, majority), (agg["acc"], majority)
    w2, b2 = train_logreg(train, n_features=64, iters=30, lr=2.0)
    assert b2 == pytest.approx(b, abs=1e-9)
    assert w2 == pytest.approx(w, abs=1e-9)


def test_leakage_safe_split_keeps_null_keys(spark):
    """Rows with a NULL dedup key must still be assigned a split (null-
    safe join); a plain equi-join would silently drop them."""
    df = spark.createDataFrame(
        [(1, "kA"), (2, "kA"), (3, None), (4, None), (5, "kB")],
        "doc_id long, kp string",
    )
    out = leakage_safe_split(
        df, id_col="doc_id", key_cols=["kp"],
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).collect()
    assert len(out) == 5
    nulls = [r for r in out if r["kp"] is None]
    assert len(nulls) == 2
    # the null-key group has one canonical and one split like any other
    assert {r["canonical_id"] for r in nulls} == {3}
    assert len({r["split"] for r in nulls}) == 1


def test_bpe_matches_python_reference(spark):
    """The distributed BPE trainer must learn the EXACT merge sequence
    of a pure-Python reference implementation (same tie-break: max
    count, then pair ascending), and produce the same final symbol
    arrays per word."""
    from collections import Counter

    from procoggraph_spark.operators.bpe import END, train_bpe

    corpus = [
        "low lower lowest low low newer newest new",
        "wider wide wide new newer low",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    merges, vocab = train_bpe(df, n_merges=12)

    # pure-Python BPE reference
    wc = Counter(w for t in corpus for w in t.split())
    syms = {w: [*w, END] for w in wc}
    ref_merges = []
    for _ in range(12):
        pc = Counter()
        for w, s in syms.items():
            for x, y in zip(s, s[1:]):
                pc[(x, y)] += wc[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        ref_merges.append((a, b, cnt))
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
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == syms


def test_bpe_batched_equals_sequential(spark):
    """Batched merge selection (the round-8 scale fix: one vocab pass
    per ROUND instead of one Spark job per merge) must reproduce the
    one-merge-at-a-time sequence EXACTLY — _select_batch only accepts
    a symbol-disjoint, concat-safe, count-dominating prefix, which is
    provably sequential-equivalent. A planted corpus with shared
    symbols across the hottest pairs exercises the conflict-stop and
    truncation paths, not just the trivially disjoint case."""
    from procoggraph_spark.operators.bpe import train_bpe

    corpus = [
        "the then there these that this though through threshold",
        "other mother weather together bother rather gather",
        "shell shall she ship shape sharp short shore sheet",
        "ingest ingrid singing ringing bringing kingdom making",
        "low lower lowest slow slower glow flow below yellow",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    seq, vocab_seq = train_bpe(df, n_merges=40, batch_size=1)
    bat, vocab_bat = train_bpe(df, n_merges=40, batch_size=16)
    assert bat == seq
    a = {r["word"]: list(r["syms"]) for r in vocab_seq.collect()}
    b = {r["word"]: list(r["syms"]) for r in vocab_bat.collect()}
    assert a == b
    # the batch must actually batch on this corpus (fewer rounds than
    # merges) — otherwise the scale fix silently degenerated to B=1
    from procoggraph_spark.operators.bpe import _pair_counts, word_vocab  # noqa: F401


def test_bpe_greedy_mode_valid_and_deterministic(spark):
    """exact=False (greedy disjoint packing) may reorder merge
    priorities but must stay a VALID deterministic BPE trainer: the
    head merge of round 1 is still the global argmax (identical to
    sequential), every learned merge had count >= 2 at selection time,
    and reruns produce the identical sequence."""
    from procoggraph_spark.operators.bpe import train_bpe

    corpus = ["low lower lowest low low newer newest new",
              "wider wide wide new newer low"] * 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    seq, _ = train_bpe(df, n_merges=10, batch_size=1)
    g1, _ = train_bpe(df, n_merges=10, batch_size=8, exact=False)
    g2, _ = train_bpe(df, n_merges=10, batch_size=8, exact=False)
    assert g1 == g2
    assert g1[0] == seq[0]  # round-1 head is the exact argmax
    assert all(c >= 2 for _, _, c in g1)
    assert len(g1) == len(seq) == 10


def test_bpe_select_batch_conflict_stop_and_truncation():
    """Driver-side batch selection invariants: (1) scan stops at the
    first row sharing a symbol with an accepted pair — nothing after a
    conflict is safe; (2) accepted tail is truncated to counts STRICTLY
    above the stopping row (ties could lose the sequential tie-break to
    a newly created pair); (3) the head row always survives; (4) an
    incomplete sample floors at the last collected count."""
    from procoggraph_spark.operators.bpe import _select_batch

    class R(dict):
        __getitem__ = dict.get

    def rows(*t):
        return [R(a=a, b=b, cnt=c) for a, b, c in t]

    # conflict on 'b' stops the scan; ('x','y') never considered
    got = _select_batch(
        rows(("a", "b", 100), ("b", "c", 90), ("x", "y", 80)),
        batch_size=8, complete=True,
    )
    assert got == [("a", "b", 100)]
    # disjoint accepts survive only above the stop count: ('d','e',90)
    # ties the conflicting ('b','c',90) row and must be dropped
    got = _select_batch(
        rows(("a", "b", 100), ("d", "e", 90), ("b", "c", 90), ("f", "g", 80)),
        batch_size=8, complete=True,
    )
    assert got == [("a", "b", 100)]
    # strictly dominating disjoint prefix batches fully
    got = _select_batch(
        rows(("a", "b", 100), ("d", "e", 90), ("f", "g", 80)),
        batch_size=8, complete=True,
    )
    assert got == [("a", "b", 100), ("d", "e", 90), ("f", "g", 80)]
    # concat hazard: 'ab' equals a later pair's left symbol -> stop
    got = _select_batch(
        rows(("a", "b", 100), ("ab", "c", 90), ("f", "g", 80)),
        batch_size=8, complete=True,
    )
    assert got == [("a", "b", 100)]
    # incomplete sample: floor at last collected cnt (80) drops the tie
    got = _select_batch(
        rows(("a", "b", 100), ("d", "e", 90), ("f", "g", 80)),
        batch_size=8, complete=False,
    )
    assert got == [("a", "b", 100), ("d", "e", 90)]
    # batch_size caps accepts; the next row still bounds truncation
    got = _select_batch(
        rows(("a", "b", 100), ("d", "e", 100), ("f", "g", 100)),
        batch_size=2, complete=True,
    )
    assert got == [("a", "b", 100)]


def test_text_operator_family_tolerates_null_and_empty_text(spark):
    """NULL / empty / whitespace-only / single-word documents must not
    crash any text-family operator (dirty corpora are the NORMAL input
    of a curation pipeline). Locks no-crash plus basic row accounting:
    per-doc operators either emit the row (possibly with null outputs)
    or drop it by documented contract — never an exception."""
    from procoggraph_spark.operators import bpe as B
    from procoggraph_spark.operators import text as X
    from procoggraph_spark.operators.classifier import featurize

    docs = spark.createDataFrame(
        [
            (1, "a normal document with several words"),
            (2, ""),
            (3, None),
            (4, "   "),
            (5, "one"),
        ],
        "doc_id long, text string",
    )
    assert len(X.text_stats(docs).collect()) == 5
    assert len(featurize(docs).collect()) == 5
    # chunker: empty/None emit nothing, others chunk
    chunked = chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_size=10, overlap=2
    ).collect()
    assert {r["doc_id"] for r in chunked} == {1, 4, 5}
    # bigram LM: only docs with >= 2 tokens appear
    bg = X.bigram_logprob(docs, id_col="doc_id", text_col="text").collect()
    assert {r["doc_id"] for r in bg} == {1}
    # BPE vocab: null/empty contribute no words; no empty-string word
    words = {r["word"] for r in B.word_vocab(docs).collect()}
    assert "" not in words and "one" in words
    # curation gate evaluates without raising on every row
    assert docs.select(X.corpus_keep_decision(F.col("text"))).count() == 5


def test_bpe_encode_matches_reference_segmentation(spark):
    """bpe_encode over the trained vocab must count exactly the
    reference segmentation's subwords, and an OOV word must degrade to
    characters + end marker."""
    from procoggraph_spark.operators.bpe import END, bpe_encode, train_bpe

    corpus = ["low lower lowest low low newer newest new",
              "wider wide wide new newer low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    _, vocab = train_bpe(df, n_merges=12)
    syms = {r["word"]: list(r["syms"]) for r in vocab.collect()}

    probe = spark.createDataFrame(
        [(0, "low lower zzq")], "doc_id long, text string"
    )
    row = bpe_encode(probe, vocab).collect()[0]
    oov = [*"zzq", END]
    want_tokens = len(syms["low"]) + len(syms["lower"]) + len(oov)
    assert row["n_words"] == 3
    assert row["n_subword_tokens"] == want_tokens
    lens = sum(len(s) for s in syms["low"] + syms["lower"] + oov)
    assert row["mean_subword_len"] == round(lens / want_tokens, 6)


def test_pq_codes_valid_deterministic_and_recall(spark):
    """PQ: every code in [0, k); encode is rerun-deterministic; ADC
    top-10 recall vs exact L2 clears a floor on uniform random data
    (the hard case — measured 0.5 mean at m=16, k=16 on this table);
    and each query finds its own vector despite quantization."""
    import numpy as np

    from procoggraph_spark.operators.pq import pq_adc_topk, pq_encode, train_pq
    from procoggraph_spark.queries.common import t as load

    e = load(spark, SF_SMOKE, "embeddings")
    books = train_pq(e, m=16, k=16, dim=64, iterations=2)
    assert len(books) == 16 and all(len(b) == 16 for b in books)
    codes = pq_encode(e, books)
    rows = codes.collect()
    assert all(0 <= c < 16 for r in rows for c in r["pq_codes"])
    rerun = pq_encode(e, books).collect()
    assert sorted(map(tuple, ((r["vec_id"], tuple(r["pq_codes"])) for r in rows))) == \
           sorted(map(tuple, ((r["vec_id"], tuple(r["pq_codes"])) for r in rerun)))

    qrows = [(r["vec_id"], [float(x) for x in r["embedding"]])
             for r in e.filter(F.col("vec_id") < 5).collect()]
    got = pq_adc_topk(codes, qrows, books, top_k=10).collect()
    db = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in e.collect()}
    recalls = []
    for qid, qv in qrows:
        q = np.array(qv)
        exact = set(sorted(db, key=lambda i: float(((db[i] - q) ** 2).sum()))[:10])
        mine = {r["vec_id"] for r in got if r["query_id"] == qid}
        recalls.append(len(exact & mine) / 10)
    assert sum(recalls) / len(recalls) >= 0.25, recalls


def test_ivf_pq_recall_and_pruning(spark):
    """The composed IVF+PQ query must (a) keep useful recall vs exact
    L2 while probing a quarter of the cells, (b) actually prune — every
    scored candidate sits in one of the query's probed cells, and the
    index is one map-only plan with no join."""
    import numpy as np

    from procoggraph_spark.operators.pq import (
        ivf_pq_index,
        ivf_pq_topk,
        train_pq,
    )
    from procoggraph_spark.operators.similarity import train_centroids
    from procoggraph_spark.queries.common import t as load

    e = load(spark, SF_SMOKE, "embeddings")
    cents = train_centroids(e, n_cells=16, iterations=2)
    books = train_pq(e, m=16, k=16, dim=64, iterations=2)
    idx = ivf_pq_index(e, cents, books)
    from tests.test_plans import plan

    p = plan(spark, idx)
    # exactly the ONE key_unique survivorship exchange (the index is a
    # keyed entity store — dirty-keys contract), no join, no Python;
    # the encode itself stays column algebra on the survivors
    assert p.count("Exchange (") == 1
    assert "Join" not in p and "Python" not in p

    qrows = [(r["vec_id"], [float(x) for x in r["embedding"]])
             for r in e.filter(F.col("vec_id") < 5).collect()]
    got = ivf_pq_topk(idx, qrows, cents, books, n_probe=4, top_k=10).collect()
    cells = {r["vec_id"]: r["cell"] for r in idx.collect()}
    db = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in e.collect()}
    recalls = []
    for qid, qv in qrows:
        q = np.array(qv)
        probed = sorted(
            ((float(((np.array(cv) - q) ** 2).sum()), cell) for cell, cv in cents)
        )[:4]
        probe_set = {cell for _, cell in probed}
        mine = [r for r in got if r["query_id"] == qid]
        assert all(cells[r["vec_id"]] in probe_set for r in mine)
        exact = set(sorted(db, key=lambda i: float(((db[i] - q) ** 2).sum()))[:10])
        recalls.append(len(exact & {r["vec_id"] for r in mine}) / 10)
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_ivf_pq_rerank_matches_exact_within_probed_cells(spark):
    """`ivf_pq_rerank_topk` (ADC shortlist -> exact L2 rerank) must
    return EXACTLY the exact-L2 top-k restricted to the probed cells
    whenever the shortlist covers all probed candidates — i.e. the
    rerank stage recovers the IVF bound, the quantization error of the
    codes only ever cuts, never ranks. Also: no cartesian product in
    the plan, and exclude_self drops the query's own row."""
    import numpy as np

    from procoggraph_spark.operators.pq import (
        ivf_pq_index,
        ivf_pq_rerank_topk,
        train_pq,
    )
    from procoggraph_spark.operators.similarity import train_centroids
    from procoggraph_spark.queries.common import t as load

    e = load(spark, SF_SMOKE, "embeddings")
    cents = train_centroids(e, n_cells=16, iterations=2)
    books = train_pq(e, m=16, k=16, dim=64, iterations=2)
    idx = ivf_pq_index(e, cents, books)
    qrows = [(r["vec_id"], [float(x) for x in r["embedding"]])
             for r in e.filter(F.col("vec_id") < 5).collect()]
    # shortlist larger than any probed-cell population -> rerank must
    # equal exact-within-probed-cells
    n_rows = e.count()
    got = ivf_pq_rerank_topk(
        idx, e, qrows, cents, books,
        n_probe=4, shortlist=int(n_rows), top_k=10, exclude_self=True,
    ).collect()
    cells = {r["vec_id"]: r["cell"] for r in idx.collect()}
    db = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in e.collect()}
    for qid, qv in qrows:
        q = np.array(qv)
        probed = {
            cell
            for _, cell in sorted(
                ((float(((np.array(cv) - q) ** 2).sum()), cell)
                 for cell, cv in cents)
            )[:4]
        }
        cand = [i for i in db if cells[i] in probed and i != qid]
        exact = sorted(
            cand, key=lambda i: (round(float(((db[i] - q) ** 2).sum()), 6), i)
        )[:10]
        mine = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )]
        assert mine == exact
        assert qid not in mine

    from tests.test_plans import plan

    p = plan(
        spark,
        ivf_pq_rerank_topk(
            idx, e, qrows, cents, books, n_probe=4, shortlist=50, top_k=10
        ),
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_ivf_pq_index_numpy_twin_equality(spark):
    """The Arrow-batched index builder (`ivf_pq_index_numpy`, the
    million-scale path the 1M probe uses) must produce row-for-row the
    same (id, cell, pq_codes) as the column-algebra builder on the
    driver's embeddings table, with exactly the one key_unique
    survivorship exchange and no join."""
    from procoggraph_spark.operators.pq import (
        ivf_pq_index,
        ivf_pq_index_numpy,
        train_pq,
    )
    from procoggraph_spark.operators.similarity import train_centroids
    from procoggraph_spark.queries.common import t as load

    e = load(spark, SF_SMOKE, "embeddings")
    cents = train_centroids(e, n_cells=16, iterations=2)
    books = train_pq(e, m=16, k=16, dim=64, iterations=2)

    def canon(df):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["pq_codes"])) for r in df.collect()
        )

    col_rows = canon(ivf_pq_index(e, cents, books))
    np_rows = canon(ivf_pq_index_numpy(e, cents, books))
    assert col_rows == np_rows

    from tests.test_plans import plan

    p = plan(spark, ivf_pq_index_numpy(e, cents, books))
    # one key_unique survivorship exchange (keyed-entity-store
    # contract, same as the column builder), then the map-only Arrow
    # encode; still no join
    assert p.count("Exchange (") == 1 and "Join" not in p


def test_compression_ratio_exact_and_ordering(spark):
    """compression_ratio must equal a direct zlib recomputation
    byte-for-byte, rank repetitive text below random-ish text, and
    survive empty/null documents."""
    import zlib

    from procoggraph_spark.operators.text import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam " * 50),
            (2, "the quick brown fox jumps over a lazy dog while counting"
                " seventeen distinct prime numbers backwards"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    for i, text in [(1, "spam spam spam " * 50),
                    (2, "the quick brown fox jumps over a lazy dog while counting"
                        " seventeen distinct prime numbers backwards")]:
        raw = text.encode()
        assert got[i]["n_bytes"] == len(raw)
        assert got[i]["compressed_bytes"] == len(zlib.compress(raw, 6))
        assert got[i]["compression_ratio"] == round(
            len(zlib.compress(raw, 6)) / len(raw), 6)
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    assert got[3]["compression_ratio"] is None and got[3]["n_bytes"] == 0
    assert got[4]["compression_ratio"] is None


def test_bpe_greedy_vocab_valid_at_scale(spark):
    """Production-posture validity at a merge count where the greedy
    packer actually batches: the learned artifact must stay a real
    tokenizer — no duplicate merges, valid merge-order dependencies,
    symbol arrays still spell their words — and the round count must be
    far below the merge count (the whole point of greedy packing).
    The FULL production probe (10k-30k merges on the 50 k-doc Zipfian
    corpus) lives in tools/bpe_probe.py and records to BENCH.md; this
    is its suite-bounded twin sharing the same validator."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from bpe_probe import validate

    from procoggraph_spark.operators.bpe import train_bpe

    # mid-size Zipfian corpus: hash-derived word ranks, deterministic
    from pyspark.sql import functions as F

    n_words = 2000
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    u = (
        F.pmod(F.hash("doc_id", F.col("p"), F.lit(7919)), F.lit(1_000_003))
        / 1_000_003.0
    )
    rank = F.least(
        F.lit(n_words - 1), F.floor(F.pow(u, F.lit(3.0)) * n_words).cast("int")
    )
    word = F.concat(
        F.lpad(F.conv(F.col("r").cast("string"), 10, 26), 3, "a"),
        F.substring(F.md5(F.col("r").cast("string")), 1, 2),
    )
    corpus = (
        docs.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("p"))
        .withColumn("r", rank)
        .withColumn("w", word)
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )
    stats: dict = {}
    merges, vocab = train_bpe(
        corpus, n_merges=400, batch_size=64, exact=False, stats=stats
    )
    ok, problems = validate(
        merges, vocab.select("word", "syms").collect(), 400
    )
    assert ok, problems
    assert stats["rounds"] < 400 / 4, stats  # greedy must actually batch
