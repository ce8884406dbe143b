"""Text-analysis operators for training-data pipelines: tokenization
stats, quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side) — no Python in the hot path, so
these run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword langid
# heuristic. Deterministic and replicable in plain SQL for the oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "los", "de", "que", "es"),
    "fr": ("le", "la", "les", "et", "est", "que"),
    "zh": ("de", "le", "shi", "bu", "wo", "zai"),
}

STOPWORDS_EN = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")


def let(bound: Column, body) -> Column:
    """Single-evaluation let-binding for column expressions.

    Catalyst inlines aliased columns into every reference site (filter
    pushdown, project collapse), and higher-order functions never enter
    whole-stage codegen, so its subexpression elimination cannot help
    either: an expression referenced k times is EVALUATED k times per
    row, interpreted. A lambda argument, by contrast, is a bound
    variable — ``transform`` evaluates ``bound`` once per row and every
    reference inside ``body`` reads the bound value. NULL-transparent:
    ``array(NULL)`` is ``[NULL]``, so ``body`` sees NULL exactly as
    inline composition would. Measured on the curation gate (quality +
    repetition + lang-ID): ~30 tokenize/fold evaluations per row
    collapse to one tokenize + one fold, value-identical."""
    return F.transform(F.array(bound), body)[0]


def tokens(text: Column) -> Column:
    """Whitespace tokenization: split on runs of whitespace, no empty
    tokens. ``trim`` strips only spaces, so a document starting with a
    tab/newline (or containing only whitespace) would otherwise emit
    empty leading/trailing tokens that pollute counts, ratios, and
    n-grams — found by the round-7 fuzz audit; real corpora have such
    documents even though the driver testdata does not."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != F.lit(""))


def bpe_ish_tokens(text: Column) -> Column:
    """A BPE-ish regex pre-tokenization: letter runs, digit runs, and each
    punctuation mark become separate tokens (approximates the GPT-2-style
    pre-tokenizer split classes)."""
    spaced = F.regexp_replace(text, r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", " $1 ")
    return F.filter(F.split(F.trim(spaced), r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[!-/:-@\[-`{-~]", "")
    )
    return n_punct / F.greatest(F.length(text), F.lit(1))


def _stopword_ratio_of(ws: Column, stopwords: tuple[str, ...]) -> Column:
    """stopword_ratio over an already-bound token array."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return n_stop / F.greatest(F.size(ws), F.lit(1))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    return let(tokens(text), lambda ws: _stopword_ratio_of(ws, stopwords))


def _mean_token_len_of(ws: Column) -> Column:
    """mean_token_len over an already-bound token array."""
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return total / F.greatest(F.size(ws), F.lit(1))


def mean_token_len(text: Column) -> Column:
    return let(tokens(text), _mean_token_len_of)


def _quality_score_of(text: Column, ws: Column) -> Column:
    """quality_score with the token array bound once (``ws``); the
    mean-token-length scalar is additionally let-bound because the band
    check references it twice."""
    len_ok = F.when(F.length(text) >= 100, 1.0).otherwise(F.length(text) / 100.0)
    punct_ok = 1.0 - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_ok = F.least(_stopword_ratio_of(ws, STOPWORDS_EN) * 5.0, F.lit(1.0))
    mtl_ok = let(
        _mean_token_len_of(ws),
        lambda m: F.when((m >= 3.0) & (m <= 12.0), 1.0).otherwise(0.5),
    )
    return F.round((len_ok + punct_ok + stop_ok + mtl_ok) / 4.0, 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, low punctuation,
    some stopwords, sane mean token length. Mirrors the shape of common
    C4/Gopher-style document filters (public heuristics), kept simple and
    SQL-replicable. The token array is let-bound so the whole composite
    tokenizes once per row (was: once per sub-metric reference)."""
    return let(tokens(text), lambda ws: _quality_score_of(text, ws))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-word hit counts."""
    ws = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))
    return out


def _predict_lang_of(ws: Column) -> Column:
    """predict_lang over an already-bound token array: the marker-count
    fold runs ONCE (its finish lambda binds the count struct, and an
    inner let binds the argmax), where field-by-field access to an
    inline ``aggregate`` re-ran the whole fold per reference — ~35
    copies in the composed curation gate's physical plan."""
    langs = sorted(LANG_MARKERS)  # tiebreak: first lang in asc order wins
    zero = F.struct(*[F.lit(0).alias(lg) for lg in langs])

    def step(acc, w):
        return F.struct(
            *[
                (
                    acc[lg] + F.when(w.isin(*LANG_MARKERS[lg]), 1).otherwise(0)
                ).alias(lg)
                for lg in langs
            ]
        )

    def finish(counts):
        best = counts[langs[0]]
        for lg in langs[1:]:
            best = F.greatest(best, counts[lg])

        def pick(b):
            pred = F.lit("und")
            # build reverse so earlier langs take precedence on ties
            for lg in reversed(langs):
                pred = F.when(counts[lg] == b, lg).otherwise(pred)
            return F.when(b > 0, pred).otherwise("und")

        return let(best, pick)

    # NULL token array (NULL text): the inline form compared NULL counts
    # field-by-field — every `when` missed and the tiebreak chain fell
    # through to 'und'. aggregate() short-circuits NULL input past the
    # finish lambda, so restate that fall-through with a coalesce.
    return F.coalesce(F.aggregate(ws, zero, step, finish), F.lit("und"))


def predict_lang(text: Column) -> Column:
    """Argmax language by marker-word hits; deterministic tiebreak on
    language code ascending; 'und' when no marker hits at all.

    Single pass over ONE tokenization AND one fold: the token split is
    let-bound, the struct-accumulator aggregate counts every language's
    marker hits together, and the argmax/tiebreak run inside the fold's
    finish lambda over the bound count struct (``isin`` compiles to a
    hash-set probe per token). Counts are identical to ``lang_scores`` —
    the langid-confusion oracle replays the same per-language hit
    counting in SQL."""
    return let(tokens(text), _predict_lang_of)


def positional_fingerprint(text: Column, max_chars: int = 64) -> Column:
    """Deterministic positional fingerprint: sum_i ascii(text[i]) * i over
    the first ``max_chars`` chars, mod 2^31-1. Integer-exact and
    SQL-replicable; used as a cheap shard/dedup key."""
    # greatest(n, 1): F.sequence(1, 0) would produce the DESCENDING
    # [1, 0], not an empty array — harmless here only because both
    # ghost terms are 0, but guard it so the ghost elements never
    # exist. Contract (fuzz-pinned): the fingerprint of '' is 0, not
    # NULL — a fingerprint is a shard/dedup KEY, and NULL keys break
    # grouping; the SQL twin coalesces its empty-list NULL to match.
    n = F.greatest(F.least(F.length(text), F.lit(max_chars)), F.lit(1))
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.ascii(F.substring(text, 1, max_chars).substr(i, F.lit(1))) * i,
    )
    return (F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x) % 2147483647).alias(
        "fingerprint"
    )


def rolling_hash_fingerprint(text: Column, max_chars: int = 64, base: int = 31) -> Column:
    """Polynomial rolling hash h = (h*base + ascii(c)) mod 2^31-1 over the
    first ``max_chars`` chars — an order-sensitive document fingerprint
    (the classic Rabin-Karp/Karp-Rabin construction)."""
    n = F.least(F.length(text), F.lit(max_chars))
    chars = F.split(F.substring(text, 1, max_chars), "")
    return F.aggregate(
        F.slice(chars, 1, n),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % 2147483647,
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats column family to a documents frame."""
    text = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(text))
        .withColumn("punct_ratio", F.round(punct_ratio(text), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(text), 6))
        .withColumn("mean_token_len", F.round(mean_token_len(text), 6))
        .withColumn("quality", quality_score(text))
        .withColumn("pred_lang", predict_lang(text))
        .withColumn("fingerprint", positional_fingerprint(text))
    )


def _repeated_ngram_ratio_of(ws: Column, n: int) -> Column:
    """repeated_ngram_ratio over an already-bound token array; the gram
    array is additionally let-bound (referenced by total, distinct and
    the guard — four sites)."""
    k = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    # zip_with over row-level slices, NOT transform with a lambda that
    # references ws: a captured outer expression is re-evaluated PER
    # ELEMENT by the higher-order function, turning the tokenize into
    # O(tokens^2) regex splits per row (measured 22 s -> 1.5 s on 5 k
    # docs at sf0.1). slice() evaluates ws once per row; zip_with's
    # lambda binds only its element arguments.
    grams = F.slice(ws, 1, k)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(ws, 1 + j, k), lambda a, b: F.concat_ws(" ", a, b)
        )

    def ratio(g):
        n_total = F.size(g)
        n_unique = F.size(F.array_distinct(g))
        return F.when(n_total <= 0, 0.0).otherwise(
            F.round((n_total - n_unique) / n_total, 6)
        )

    return let(grams, ratio)


def repeated_ngram_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram in
    the same document — the Gopher-style intra-document repetition
    signal (high values flag boilerplate/spam). JVM-side: n-grams via
    zip_with over let-bound token-array slices, distinct via
    array_distinct; one tokenize per row."""
    return let(tokens(text), lambda ws: _repeated_ngram_ratio_of(ws, n))


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def scrub_pii(text: Column) -> Column:
    """Redact emails and URLs (the minimum-viable PII pass every
    training-data pipeline runs before anything else): regex classes
    replaced with typed placeholder tokens — pure regexp_replace, stays
    in codegen."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, URL_RE, "<URL>")


def corpus_keep_decision(
    text: Column,
    *,
    min_quality: float = 0.5,
    max_repetition: float = 0.2,
    langs: tuple[str, ...] = ("en",),
) -> Column:
    """The composed curation gate: quality score ≥ threshold AND
    repetition below threshold AND predicted language allowed. One
    boolean per doc, all JVM-side — the decision column a 100 TB corpus
    filter partitions on. The token array is let-bound across all three
    legs, so the gate tokenizes once per row and runs each fold once
    (the naive composition evaluated ~30 tokenize/fold copies per row,
    interpreted — higher-order functions never reach codegen CSE)."""

    def body(ws):
        lang_ok = _predict_lang_of(ws).isin(*langs)
        return (
            (_quality_score_of(text, ws) >= min_quality)
            & (_repeated_ngram_ratio_of(ws, 2) <= max_repetition)
            & lang_ok
        )

    return let(tokens(text), body)


def tfidf_top_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """TF-IDF term scoring with the top-``k`` terms per document — the
    keyword-extraction / relevance-weighting primitive of a corpus
    pipeline (and the feature base for BM25-style dedup-aware sampling).

    Scale shape: one term explode feeding two hash aggregations (the
    per-document term frequency, then the corpus document frequency
    derived from the TF table — never a second scan of the corpus), a
    shuffle equi-join on the term key (the vocabulary is corpus-sized,
    so it is NOT broadcast), and one window for the per-document top-k.
    The corpus size enters the plan as a broadcast 1-row aggregate, not
    a driver-side collect. All arithmetic is JVM-side; scores are
    rounded before ranking so the (score, term) order is engine-portable.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    # The TF table is lazily localCheckpoint-ed because it has two
    # consumers (the document-frequency rollup and the scoring join)
    # and Spark does not CSE the subplan across them — without the
    # checkpoint the corpus tokenize-explode-aggregate runs TWICE per
    # execution. The cached frame is (doc, distinct-term)-grained —
    # far smaller than the token stream it replaces a second pass over.
    tf = (
        tok.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # df(term) = number of documents containing the term; TF rows are
    # already distinct per (doc, term), so a plain count suffices.
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def unigram_logprob(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model scoring: per-document mean negative log
    probability (cross-entropy against the corpus's own unigram
    distribution) — the cheap LM-perplexity proxy curation pipelines use
    to rank documents as typical vs gibberish before a real LM scores
    them.

    Scale shape: one tokenize-explode feeding the corpus term-frequency
    aggregation, a shuffle equi-join of tokens to their corpus frequency
    (the vocabulary is corpus-sized — not broadcast), the corpus token
    total as a broadcast 1-row aggregate, and a per-document average.
    Entirely JVM-side arithmetic.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    # The frequency table is lazily localCheckpoint-ed and the corpus
    # token total derived from it (Σ cnt == COUNT(*) over the token
    # stream exactly): without this, `total` and the probe join each
    # re-run the corpus tokenize-explode (no plan-level CSE across the
    # broadcast subquery), i.e. THREE full tokenize passes per run
    # instead of the two the algorithm needs (one to build the LM, one
    # to score against it). The cached frame is vocabulary-sized.
    tf = (
        tok.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    total = tf.agg(F.sum("cnt").alias("total"))
    return (
        tok.join(tf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("cnt") / F.col("total"))), 6).alias(
                "avg_neg_logprob"
            ),
        )
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 200,
    overlap: int = 40,
) -> DataFrame:
    """Context-window chunking: split each document into fixed-size
    character chunks with ``overlap`` characters of context carried
    between consecutive chunks — the step that turns raw documents into
    model-context-sized training rows.

    Chunk ``i`` covers characters ``[i*stride, i*stride + chunk_size)``
    with ``stride = chunk_size - overlap``; the tail chunk may be
    shorter, an empty document emits no chunks, and a trailing window
    that would contain ONLY overlap (no characters beyond what the
    previous chunk already covered) is skipped — every emitted chunk
    after the first contributes at least one new character.

    Scale shape: ``sequence`` + ``explode`` is a generator applied on
    the scan — no shuffle, no Python; ~``chars/stride`` output rows per
    document produced at scan parallelism, and the generate fuses with
    downstream projections in one codegen stage. Pure integer/substring
    algebra, so a SQL oracle (generate_series + substr) replays the
    chunk boundaries exactly.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    ex = df.select(
        F.col(id_col), F.col(text_col), F.explode(starts).alias("chunk_start")
    ).filter(
        (F.col("chunk_start") < F.length(F.col(text_col)))
        & (
            (F.col("chunk_start") == 0)
            | (F.col("chunk_start") + overlap < F.length(F.col(text_col)))
        )
    )
    chunk = F.substring(F.col(text_col), F.col("chunk_start") + 1, F.lit(chunk_size))
    return ex.select(
        F.col(id_col),
        (F.col("chunk_start") / stride).cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


def bigram_logprob(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Bigram language-model scoring with add-k smoothing: per-document
    mean of ``-ln p(w_i | w_{i-1})`` where ``p = (c(w1 w2) + k) /
    (c(w1·) + k·V)`` — the next step up from `unigram_logprob` as a
    fluency/perplexity proxy (a doc of common words in an uncommon
    ORDER now scores badly too). Documents shorter than two words have
    no bigrams and drop out.

    Scale shape: one bigram explode feeding two hash aggregations (the
    bigram table and the history-count table), two vocabulary-keyed
    shuffle equi-joins back to the exploded stream (corpus-sized keys —
    NOT broadcast, same discipline as the unigram/TF-IDF joins), the
    vocab size as a broadcast 1-row aggregate, and a per-doc average.
    Pure column algebra; integer counts make the smoothed probability
    engine-exact before the final rounding.
    """
    # local import: word_ngrams lives in dedup (the shingle family);
    # importing it at module level would cycle dedup -> text
    from procoggraph_spark.operators.dedup import word_ngrams

    bg = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("bg")
    ).withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
    # history counts derived FROM the bigram table, not from a second
    # pass over the exploded stream: c(w1·) = Σ_w2 c(w1 w2) exactly, and
    # the rollup input is vocabulary-sized instead of corpus-sized.
    # The bigram table is localCheckpoint-ed (lazy) because Spark does
    # not CSE the c12 subplan across its two consumers (the probe join
    # and the c1 rollup) — without it the corpus explode+agg runs twice.
    # Interleaved A/B/C at sf0.1/x10: original two-agg 1.08/2.06 s,
    # derived-no-checkpoint 1.16/1.94 s, derived+checkpoint 1.11/1.44 s
    # — the materialized derivation wins 30% at 10× and is floor-noise
    # at sf0.1; the win grows with corpus size (it removes a second
    # corpus-scale explode in exchange for a vocab-sized cache).
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12")).localCheckpoint(
        eager=False
    )
    c1 = (
        c12.withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    vocab = df.select(
        F.explode(tokens(F.col(text_col))).alias("term")
    ).agg(F.count_distinct("term").alias("v"))
    return (
        bg.join(c12, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(-F.log((F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v")))),
                6,
            ).alias("avg_neg_logprob_bigram"),
        )
    )


def compression_ratio(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document zlib compression ratio (compressed bytes / raw
    bytes) — the classic template/repetition signal (a highly
    compressible document is boilerplate, machine-generated, or
    looping text; used by Gopher/RefinedWeb-style curation stacks as a
    cheap complement to the n-gram repetition ratio).

    This is one of the repo's few legitimate Python stages: there is no
    JVM codec expression for per-row compression, so it runs as
    mapInPandas — Arrow-batched, one zlib pass per document, no
    per-row Python function-call overhead beyond the codec itself.
    Deterministic (zlib level 6 is stable for fixed input), so the
    pytest recomputes exact values with the same library.
    """
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_bytes long, compressed_bytes long, "
        "compression_ratio double"
    )

    def fn(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            n = raw.map(len)
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n,
                    "compressed_bytes": comp,
                    "compression_ratio": [
                        round(c / nb, 6) if nb else None
                        for c, nb in zip(comp, n)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, out_schema)


def dsir_logratio(
    df: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how much more likely its tokens are under the TARGET
    domain's unigram distribution than under the raw corpus's own —
    avg_t[ln p_target(w) - ln p_raw(w)] with add-one smoothing over the
    shared vocabulary. Positive means target-like; selection keeps the
    top of the ranking (or resamples ∝ exp(weight)).

    Scale shape: identical to unigram_logprob twice over — one
    tokenize-explode feeding two term-frequency aggregations, the raw
    token stream joined to both frequency tables on the term key
    (vocabulary-sized shuffles, never broadcast), and the three scalar
    totals (raw tokens, target tokens, vocabulary size) broadcast as a
    1-row frame. Smoothing keeps terms absent from the target finite, so
    the join to target counts is a LEFT join with a 0 fill.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tok_t = target.select(F.explode(tokens(F.col(text_col))).alias("term"))
    # Both frequency tables are lazily localCheckpoint-ed: each has two
    # consumers (the totals row and the scoring joins) and without the
    # checkpoint each consumer re-runs its corpus tokenize-explode —
    # five tokenize passes per run instead of the three the algorithm
    # needs. Both cached frames are vocabulary-sized.
    tf_r = (
        tok.groupBy("term")
        .agg(F.count("*").alias("c_raw"))
        .localCheckpoint(eager=False)
    )
    tf_t = (
        tok_t.groupBy("term")
        .agg(F.count("*").alias("c_tgt"))
        .localCheckpoint(eager=False)
    )
    totals = (
        tf_r.join(tf_t, "term", "left")
        .agg(
            F.sum("c_raw").alias("n_raw"),
            F.sum(F.coalesce(F.col("c_tgt"), F.lit(0))).alias("n_tgt"),
            F.count("*").alias("vocab"),
        )
    )
    scored = (
        tok.join(tf_r, "term")
        .join(tf_t, "term", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_lr",
            F.log(
                (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("n_tgt") + F.col("vocab")).cast("double")
            )
            - F.log(
                (F.col("c_raw") + F.lit(1)).cast("double")
                / (F.col("n_raw") + F.col("vocab")).cast("double")
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        # + 0.0 canonicalizes the zero's SIGN (IEEE: -0.0 + 0.0 = +0.0,
        # identity elsewhere): a doc whose log-ratios cancel averages
        # to ±epsilon depending on float summation order, and
        # round(...) then emits -0.0 on one engine and +0.0 on the
        # other (live sf0.1 divergence, doc 3533) — the oracle carries
        # the same normalization
        (F.round(F.avg("_lr"), 6) + F.lit(0.0)).alias("avg_log_ratio"),
    )


def gopher_quality_rules(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    max_dup_word_frac: float = 0.5,
) -> DataFrame:
    """Gopher-style structural quality rules (Rae et al. 2021 §A1.1,
    public heuristics), word-level variant: per document the rule
    metrics — word count, mean word length, alphabetic-word fraction,
    stopword hits, duplicate-word fraction — plus the composed
    ``gopher_keep`` flag from the published-threshold shape.

    The keep flag is computed from the UNROUNDED metrics (the rounded
    columns are for reporting), so the decision is the same arithmetic
    in any engine. Pure column algebra over one tokenize per row — no
    shuffle, scan speed at 100 TB.
    """
    ws = F.col("_ws")
    n = F.size(ws)
    nn = F.greatest(n, F.lit(1))
    total_len = F.aggregate(ws, F.lit(0), lambda a, w: a + F.length(w))
    mtl = total_len / nn
    alpha = F.size(F.filter(ws, lambda w: w.rlike("^[a-zA-Z]+$"))) / nn
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    dup = (n - F.size(F.array_distinct(ws))) / nn
    keep = (
        (n >= min_words)
        & (n <= max_words)
        & (mtl >= min_mean_word_len)
        & (mtl <= max_mean_word_len)
        & (alpha >= min_alpha_frac)
        & (n_stop >= min_stopwords)
        & (dup <= max_dup_word_frac)
    )
    return df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_ws")
    ).select(
        id_col,
        n.alias("n_words"),
        F.round(mtl, 6).alias("mean_word_len"),
        F.round(alpha, 6).alias("frac_alpha_words"),
        n_stop.alias("n_stopwords"),
        F.round(dup, 6).alias("dup_word_frac"),
        # a missing (NULL-text) document is never kept: explicit false,
        # not NULL — a curation gate must not let NULL slip through a
        # `WHERE gopher_keep` filter ambiguously, and a NULL boolean
        # also materializes asymmetrically in pandas across engines
        F.coalesce(keep, F.lit(False)).alias("gopher_keep"),
    )


def tokenizer_fertility(
    df: DataFrame,
    *,
    group_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility audit per corpus slice: BPE-ish tokens per
    whitespace word (fertility — the multilingual tokenizer-efficiency
    number every training pipeline tracks per language) and characters
    per BPE token. One tokenize per row feeding a hash aggregation to
    (lang, source) grain — map-side combine, bounded output."""
    txt = F.col(text_col)
    per_doc = df.select(
        *group_cols,
        F.size(bpe_ish_tokens(txt)).cast("long").alias("_bpe"),
        F.size(tokens(txt)).cast("long").alias("_ws"),
        F.length(txt).cast("long").alias("_chars"),
    )
    return per_doc.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("_bpe").alias("n_bpe_tokens"),
        F.sum("_ws").alias("n_ws_tokens"),
        F.sum("_chars").alias("n_chars"),
        F.round(
            F.sum("_bpe") / F.greatest(F.sum("_ws"), F.lit(1)), 6
        ).alias("fertility"),
        F.round(
            F.sum("_chars") / F.greatest(F.sum("_bpe"), F.lit(1)), 6
        ).alias("chars_per_bpe_token"),
    )


def perplexity_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
    document inside its source by the unigram-LM cross-entropy proxy
    (``unigram_logprob``) and cut each source into ``n_buckets``
    head/middle/tail bands, reporting per-band document counts, mean
    score, and token mass — the table a curation pipeline uses to decide
    which perplexity band of which source to keep.

    Determinism: the ntile order is (rounded score, doc id) — total, so
    band assignment is engine- and partitioning-stable. Scale shape:
    the per-source ntile is a per-source sort (CCNet's own shape — one
    sort per language); at 100 TB replace the exact ntile with
    percentile_approx cut points broadcast against the scan, same
    output contract.
    """
    lp = unigram_logprob(df, id_col=id_col, text_col=text_col)
    joined = lp.join(df.select(id_col, source_col), id_col)
    w = Window.partitionBy(source_col).orderBy("avg_neg_logprob", id_col)
    b = joined.withColumn("bucket", F.ntile(n_buckets).over(w))
    # Band mean via exact micro-unit integers, not a float AVG: the
    # per-doc scores are 1e-6-grid doubles, but a float sum's order
    # differs between engines and a last-ulp difference straddles the
    # ROUND(...,6) display grid (unicode-whitespace fuzz leg caught a
    # live 3.629449-vs-3.629450 band). Long sums are order-free.
    micro = F.round(F.col("avg_neg_logprob") * 1e6).cast("long")
    return b.groupBy(source_col, "bucket").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.sum(micro) / (F.count("*") * F.lit(1e6)), 6
        ).alias("avg_score"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def normalize_text(text: Column) -> Column:
    """Canonical text normalization before content-keyed dedup:
    ASCII-only case fold (A-Z -> a-z via a 1:1 translate), strip every
    non-alphanumeric to a space, collapse whitespace runs, trim. Pure
    column algebra — scan speed, and exactly replicable in any engine.

    Deliberately NOT lower(): full Unicode case mapping is
    locale-fraught and engine-specific — Java (Spark) maps İ -> i +
    combining dot, ß upper -> SS, ﬁ -> FI, trailing Σ -> ς, while
    utf8proc (DuckDB) does 1:1 mappings (İ -> i, ß upper -> ẞ, ﬁ
    unchanged, Σ -> σ) — so a dedup content key built on lower()
    differs between engines on Turkish/German/Greek text (case-mapping
    fuzz leg, round 11). The Turkish-I problem is the canonical reason
    data pipelines normalize keys ASCII-only; non-ASCII letters fall to
    the [^a-z0-9] strip identically on both engines either way."""
    out = F.translate(
        text, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
    )
    out = F.regexp_replace(out, "[^a-z0-9]+", " ")
    return F.trim(out)


def oov_rate(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 100,
) -> DataFrame:
    """Vocabulary-coverage audit: build the corpus's top-``vocab_size``
    term vocabulary (by frequency, ties toward the lexicographically
    smaller term) and report per document the token count, OOV token
    count, and OOV rate — the number a tokenizer/vocab rollout is gated
    on (how much of the corpus a candidate vocabulary fails to cover).

    Scale shape: term frequencies aggregate with map-side combine; the
    vocabulary cut is a TakeOrderedAndProject (vocab-sized, never a
    corpus sort) and broadcasts to the token stream for the OOV probe —
    the corpus-sized side never reshuffles beyond the per-doc count.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("_cnt"))
        .orderBy(F.desc("_cnt"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(True).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def curation_data_card(
    df: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    max_repetition: float = 0.2,
) -> DataFrame:
    """The corpus "data card": per source, how many documents each
    curation gate dropped and how many survived — the provenance table
    every published dataset ships so consumers can see what was
    filtered and why. Attribution is FIRST-failing-gate in the fixed
    pipeline order (language → quality → repetition), so the counts
    per source sum exactly to n_docs and re-running the pipeline cannot
    shift blame between gates.

    Scale shape: the three gate signals are the existing scan-side
    column algebra (no joins), and the card is one hash agg to source
    grain — the whole audit is a single pass over the corpus.
    """
    txt = F.col(text_col)
    decision = (
        F.when(~predict_lang(txt).isin(*langs), "drop_lang")
        .when(quality_score(txt) < min_quality, "drop_quality")
        .when(repeated_ngram_ratio(txt) > max_repetition, "drop_repetition")
        .otherwise("kept")
    )
    per = df.select(F.col(source_col), decision.alias("_d"))
    n = F.count("*")
    return per.groupBy(source_col).agg(
        n.alias("n_docs"),
        F.sum(F.when(F.col("_d") == "drop_lang", 1).otherwise(0))
        .cast("long")
        .alias("n_drop_lang"),
        F.sum(F.when(F.col("_d") == "drop_quality", 1).otherwise(0))
        .cast("long")
        .alias("n_drop_quality"),
        F.sum(F.when(F.col("_d") == "drop_repetition", 1).otherwise(0))
        .cast("long")
        .alias("n_drop_repetition"),
        F.sum(F.when(F.col("_d") == "kept", 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.round(
            F.sum(F.when(F.col("_d") == "kept", 1).otherwise(0)) / n, 6
        ).alias("kept_rate"),
    )
