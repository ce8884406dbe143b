"""Training-pipeline extension queries (round 5, second batch):
context-window chunking, leakage-safe splitting, Bloom-filter
decontamination, and packed-context materialization.

Registered LAST in the registry union so the driver's 50-row sample
window (pinned by tests/test_oracle_parity.py::test_driver_window_rotation)
is unaffected; queries here are oracle-backed (verified by the full
parity suite at sf0.001 and the gate-fidelity sf0.01 run) except the
HLL sketch tier, whose sketch binary is engine-specific (rows-only +
mergeability/accuracy pytest). All rotate into driver visibility on a
later round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procoggraph_spark.operators import dedup as D
from procoggraph_spark.operators import text as X
from procoggraph_spark.queries.common import t

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


# --- context-window chunking (map-only generator; no shuffle) -------------

@q(
    "text_chunk_overlap",
    """
    SELECT doc_id, s // 160 AS chunk_idx, s AS chunk_start,
           substr(text, CAST(s + 1 AS INT), 200) AS chunk_text,
           length(substr(text, CAST(s + 1 AS INT), 200)) AS chunk_len
    FROM documents,
         LATERAL unnest(generate_series(0, length(text) - 1, 160)) AS u(s)
    WHERE s = 0 OR s + 40 < length(text)
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 200-char chunks with 40-char overlap per document (sequence+explode generator — map-only, no shuffle)."""
    d = t(spark, sf_dir, "documents")
    return X.chunk_documents(
        d, id_col="doc_id", text_col="text", chunk_size=200, overlap=40
    )


# --- leakage-safe split (duplicates can never straddle train/test) --------

@q(
    "split_leakage_safe",
    """
    WITH k AS (SELECT doc_id, substr(text, 1, 40) AS kp FROM documents),
    canon AS (SELECT kp, MIN(doc_id) AS canonical_id FROM k GROUP BY kp),
    j AS (
      -- IS NOT DISTINCT FROM: NULL-text docs form ONE duplicate group
      -- (GROUP BY already groups NULLs; a plain equi-join would then
      -- silently DROP those rows — a split must cover every document)
      SELECT k.doc_id, c.canonical_id,
             ((c.canonical_id % 2147483648) * 2654435761)
               % 4294967296 % 100 AS b
      FROM k JOIN canon c ON k.kp IS NOT DISTINCT FROM c.kp
    )
    SELECT doc_id, canonical_id,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM j
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware 80/10/10 split: every row takes its duplicate group's canonical split, so copies never straddle train and test (groupBy + join-back, skew-safe)."""
    from procoggraph_spark.operators.sampling import leakage_safe_split

    d = t(spark, sf_dir, "documents").withColumn(
        "kp", F.substring("text", 1, 40)
    )
    s = leakage_safe_split(
        d,
        id_col="doc_id",
        key_cols=["kp"],
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return s.select("doc_id", "canonical_id", "split")


# --- Bloom-filter decontamination (two-phase: bitmap prune + exact) -------

_BLOOM_FP = (
    "CAST(list_sum(list_transform(generate_series(1, least(length(s), 64)),"
    " i -> ascii(substr(s, i, 1)) * i)) % 2147483647 AS BIGINT)"
)

@q(
    "text_decontaminate_bloom",
    f"""
    WITH cw AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), _t -> _t <> '') AS w
      FROM documents WHERE doc_id >= 10
    ),
    csh AS (
      SELECT DISTINCT doc_id, s FROM cw, LATERAL unnest(
        CASE WHEN len(w) >= 3
             THEN list_transform(generate_series(1, len(w) - 2),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
             ELSE [] END) AS u(s)
    ),
    bw AS (
      SELECT list_filter(string_split_regex(trim(text), '\\s+'), _t -> _t <> '') AS w
      FROM documents WHERE doc_id < 10
    ),
    bsh AS (
      SELECT DISTINCT s FROM bw, LATERAL unnest(
        CASE WHEN len(w) >= 3
             THEN list_transform(generate_series(1, len(w) - 2),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
             ELSE [] END) AS u(s)
    ),
    bfp AS (SELECT s, {_BLOOM_FP} AS h FROM bsh),
    bits AS (
      SELECT DISTINCT
             ((h * (2654435761 + g.r * 40503) + g.r * 1009)
              % 2147483648) % 4096 AS bit
      FROM bfp CROSS JOIN generate_series(0, 2) AS g(r)
    ),
    cfp AS (SELECT doc_id, s, {_BLOOM_FP} AS h FROM csh),
    cpos AS (
      SELECT doc_id, s,
             ((h * (2654435761 + g.r * 40503) + g.r * 1009)
              % 2147483648) % 4096 AS bit
      FROM cfp CROSS JOIN generate_series(0, 2) AS g(r)
    ),
    cand AS (
      SELECT doc_id, s FROM cpos JOIN bits USING (bit)
      GROUP BY doc_id, s HAVING COUNT(*) = 3
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM csh GROUP BY doc_id),
    nc AS (SELECT doc_id, COUNT(*) AS n_candidates FROM cand GROUP BY doc_id),
    hit AS (
      SELECT doc_id, COUNT(*) AS n_contaminated
      FROM cand JOIN bsh USING (s) GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(c.n_candidates, 0) AS n_candidates,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           ROUND(COALESCE(h.n_contaminated, 0) * 1.0 / t.n_shingles, 6)
               AS contamination_ratio
    FROM tot t LEFT JOIN nc c USING (doc_id) LEFT JOIN hit h USING (doc_id)
    """,
)
def text_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase Bloom decontamination: broadcast bitmap prunes provably-clean shingles map-side, exact join verifies only the survivors — same final ratio as text_decontaminate at a fraction of the shuffle volume."""
    d = t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") >= 10)
    benchmark = d.filter(F.col("doc_id") < 10)
    return D.bloom_decontaminate(
        corpus, benchmark, id_col="doc_id", text_col="text", n=3,
        n_bits=4096, n_hashes=3,
    )


# --- packed-context materialization (the training artifact itself) --------

@q(
    "pack_concat_context",
    """
    WITH tok AS (
      SELECT doc_id, source, text,
             len(list_filter(string_split_regex(trim(text), '\\s+'), _t -> _t <> '')) AS n_tokens
      FROM documents
    ),
    c AS (
      -- ORDER BY (doc_id, text): total over everything the packing AND
      -- the concatenation depend on, so replayed doc_ids (dirty-keys
      -- fuzz) pack and concatenate deterministically
      SELECT doc_id, source, text, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY doc_id, text NULLS FIRST
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM tok
    )
    SELECT source, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           -- COALESCE: a bin of only NULL texts concatenates to ''
           -- (Spark's array_join skips NULL elements; string_agg
           -- would return NULL)
           COALESCE(string_agg(text, '<|eod|>' ORDER BY doc_id, text NULLS FIRST), '')
               AS context_text
    FROM c GROUP BY source, (cum - n_tokens) // 512
    """,
)
def pack_concat_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed contexts: the 512-token bins of pack_token_budget concatenated into the actual training string per bin (sorted collect + array_join — the A6 concat-agg shape on the packing output)."""
    from procoggraph_spark.operators.sampling import pack_sequences

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", X.token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(
        d, id_col="doc_id", token_col="n_tokens", budget=512,
        partition_cols=["source"], order_cols=["doc_id", "text"],
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s["text"],
            ),
            "<|eod|>",
        ).alias("context_text"),
    )


# --- HLL distinct-count sketch tier (mergeable, datasketches-backed) ------

_HLL_TOL_SQL = r"""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '')) AS term
      FROM documents
    ),
    per AS (
      SELECT source, COUNT(*) AS n_tokens,
             COUNT(DISTINCT term) AS exact_distinct
      FROM tok GROUP BY source
    )
    SELECT source, n_tokens, exact_distinct, TRUE AS hll_within_tol FROM per
    UNION ALL
    SELECT '__ALL__' AS source, COUNT(*) AS n_tokens,
           COUNT(DISTINCT term) AS exact_distinct, TRUE AS hll_within_tol
    FROM tok
    """


@q("sketch_hll_distinct", _HLL_TOL_SQL)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: per-source HyperLogLog over
    document terms (hll_sketch_agg), plus an __ALL__ row union-merged
    from the per-source sketches (hll_union_agg) — the sketch path for
    vocabulary cardinality at 100 TB, where per-shard sketches merge by
    union instead of re-shuffling the key space. The raw sketch binary
    and its estimate are engine-specific, so (like
    a3_approx_count_distinct) the driver-facing contract is the
    accuracy bound itself: ``hll_within_tol`` asserts each estimate —
    including the union-merged one, which promotes sparse sketches to
    dense HLL mode — lands within 5% of the exact count computed in the
    same pass (one rollup: per-source rows + grand total, no second
    shuffle). Deterministic for fixed data; the oracle replays the
    exact counts with a constant TRUE, so a drifting estimator turns
    the row red instead of being permanently unverifiable. pytest
    additionally pins the raw estimates, merge determinism, and the
    merge-error bound."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(X.tokens(F.col("text"))).alias("term"))
    # ONE shuffle for per-source rows AND the grand total (rollup);
    # checkpointed because the __ALL__ branch consumes the per-source
    # sketches a second time for the union-merge and Spark would
    # otherwise run the corpus-wide explode + agg twice (no plan-level
    # CSE)
    per = tok.rollup("source").agg(
        F.hll_sketch_agg("term").alias("_sk"),
        F.count_distinct("term").alias("exact_distinct"),
        F.count("*").alias("n_tokens"),
        F.grouping("source").alias("_g"),
    ).localCheckpoint(eager=False)
    within = lambda est, exact: (  # noqa: E731
        F.abs(est - exact) <= 0.05 * exact
    )
    per_source = per.filter(F.col("_g") == 0).select(
        "source",
        "n_tokens",
        "exact_distinct",
        within(
            F.hll_sketch_estimate("_sk"), F.col("exact_distinct")
        ).alias("hll_within_tol"),
    )
    # grand-total row: exact count from the rollup, estimate from the
    # union-merge of the per-source sketches (the 100 TB merge path)
    union_est = (
        per.filter(F.col("_g") == 0)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"))
    )
    merged = (
        per.filter(F.col("_g") == 1)
        .select("n_tokens", "exact_distinct")
        .crossJoin(F.broadcast(union_est))
        .select(
            F.lit("__ALL__").alias("source"),
            "n_tokens",
            "exact_distinct",
            within(F.col("_est"), F.col("exact_distinct")).alias(
                "hll_within_tol"
            ),
        )
    )
    return per_source.unionByName(merged)


# --- per-label centroid + medoid (embedding cluster QA) -------------------

@q(
    "emb_centroid_medoid",
    """
    WITH e AS (
      -- NULL vectors excluded on both engines (no coordinates, no
      -- distance); zero vectors are legitimate points and stay
      SELECT * FROM embeddings WHERE embedding IS NOT NULL
    ),
    d AS (
      SELECT vec_id, label, u.i - 1 AS dim,
             CAST(embedding[u.i] AS DOUBLE) AS v
      FROM e,
           LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    c AS (SELECT label, dim, AVG(v) AS cv FROM d GROUP BY label, dim),
    n AS (SELECT label, COUNT(*) AS n_vectors FROM e GROUP BY label),
    cn AS (
      SELECT label, ROUND(sqrt(SUM(cv * cv)), 6) AS centroid_norm
      FROM c GROUP BY label
    ),
    carr AS (SELECT label, list(cv ORDER BY dim) AS c_arr FROM c GROUP BY label),
    dist AS (
      -- d2 rounded to 6 decimals BEFORE the medoid rank so the
      -- tie-break key is identical across engines (raw float sums are
      -- summation-order-dependent; near-equal distances could
      -- otherwise rank differently in Spark vs DuckDB).
      -- Per-ROW fold over the broadcast centroid array, mirroring the
      -- Spark zip_with plan (the emb_outlier_zscore discipline): the
      -- earlier unnest + GROUP BY vec_id regroup CONFLATED replayed
      -- ids — two same-id rows summed BOTH payloads' deviations into
      -- one doubled d2, so the engines elected different medoids once
      -- a duplicated id became the borderline argmin (flatline fuzz,
      -- round 12). Row identity, not key identity, carries distance.
      SELECT e.vec_id, e.label,
             ROUND(list_sum(list_transform(
                 generate_series(1, len(e.embedding)),
                 i -> (CAST(e.embedding[i] AS DOUBLE) - c_arr[i])
                      * (CAST(e.embedding[i] AS DOUBLE) - c_arr[i]))), 6)
                 AS d2
      FROM e JOIN carr USING (label)
    ),
    med AS (
      SELECT label, vec_id AS medoid_vec_id,
             ROUND(sqrt(d2), 6) AS medoid_dist
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY d2, vec_id) AS rn
        FROM dist
      ) WHERE rn = 1
    )
    SELECT n.label, n.n_vectors, cn.centroid_norm,
           med.medoid_vec_id, med.medoid_dist
    FROM n JOIN cn USING (label) JOIN med USING (label)
    """,
)
def emb_centroid_medoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid and medoid: the cluster-QA shape (centroid norm as a drift signal; the medoid as the exemplar a human can inspect). Centroids via posexplode → per-dim mean (one hash aggregation, map-side combinable); distances via a BROADCAST of the labels×dim centroid arrays and a per-row zip_with/aggregate fold — distance runs at scan speed with a deterministic in-array summation order, never a per-label collect of raw vectors and never a (label,dim)-keyed shuffle of the corpus (interleaved A/B: the join-back form loses 37% at the 10× probe). min_by medoid with id tie-break. NULL vectors carry no coordinates and are excluded up front (fuzz contract: min_by's struct comparator would otherwise rank a NULL distance below every real one and elect the NULL row medoid); zero vectors are legitimate points and stay."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    d = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "_vf")
    ).withColumn("v", F.col("_vf").cast("double")).drop("_vf")
    c = d.groupBy("label", "dim").agg(F.avg("v").alias("cv"))
    n = e.groupBy("label").agg(F.count("*").alias("n_vectors"))
    cn = c.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("cv") * F.col("cv"))), 6).alias("centroid_norm")
    )
    carr = c.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s["cv"]
        ).alias("_c")
    )
    dist = (
        e.join(F.broadcast(carr), "label")
        .withColumn(
            "d2",
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    F.col("_c"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .select(
            "vec_id", "label", F.round(F.col("d2"), 6).alias("d2")
        )
    )
    med = dist.groupBy("label").agg(
        F.min_by("vec_id", F.struct(F.col("d2"), F.col("vec_id"))).alias(
            "medoid_vec_id"
        ),
        F.round(F.sqrt(F.min("d2")), 6).alias("medoid_dist"),
    )
    return n.join(cn, "label").join(med, "label")


# --- smoothed bigram LM scoring (fluency proxy; fully SQL-replicable) -----

@q(
    "text_bigram_logprob",
    r"""
    WITH ws AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, s AS bg, string_split(s, ' ')[1] AS w1
      FROM ws, LATERAL unnest(
        CASE WHEN len(w) >= 2
             THEN list_transform(generate_series(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i+1])
             ELSE [] END) AS u(s)
    ),
    c12 AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY bg),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    v AS (
      SELECT COUNT(DISTINCT tk) AS v FROM ws, LATERAL unnest(w) AS t(tk)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(-ln((c12.c12 + 1.0) / (c1.c1 + 1.0 * v.v))), 6)
               AS avg_neg_logprob_bigram
    FROM bg JOIN c12 USING (bg) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-1-smoothed bigram LM scoring: per-document mean -ln p(w_i|w_{i-1}) under the corpus's own bigram distribution — the fluency proxy that penalizes common words in uncommon order (see operators/text.bigram_logprob for the two-join scale shape)."""
    d = t(spark, sf_dir, "documents")
    return X.bigram_logprob(d, id_col="doc_id", text_col="text", k=1.0)


# --- learned quality classifier (fasttext-style linear, trained in-frame) --

@q("text_learned_quality")
def text_learned_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned curation scorer: distill the heuristic keep/drop gate into a logistic-regression model over hashed bag-of-words features (the fasttext-style fast classifier). Training = 30 batch-GD iterations, each ONE elementwise aggregation with only the 65 model floats crossing to the driver (the Lloyd-iteration discipline); scoring is a pure column-algebra dot product that runs at scan speed. Rows-only: the float training loop isn't SQL-replicable; pytest pins held-out agreement with the gate it distills."""
    from procoggraph_spark.operators.classifier import featurize, score, train_logreg

    d = t(spark, sf_dir, "documents")
    labeled = featurize(
        d.withColumn("label", X.corpus_keep_decision(F.col("text")).cast("int")),
        text_col="text",
        n_features=64,
    ).localCheckpoint(eager=True)  # pin features/labels across GD iterations
    w, b = train_logreg(labeled, n_features=64, iters=30, lr=2.0)
    return score(labeled, w, b).select(
        "doc_id",
        "label",
        F.round(F.col("prob"), 4).alias("keep_prob"),
        (F.col("prob") >= 0.5).cast("int").alias("pred"),
    )


# --- near-dup-aware leakage-safe split (clusters, not just exact dups) ----

def _neardup_split_sql() -> str:
    from procoggraph_spark.queries.star_llmops import _CLUSTER_JACCARD_SQL

    return f"""
    WITH base AS ({_CLUSTER_JACCARD_SQL}),
    j AS (
      SELECT doc_id, canonical_id,
             ((canonical_id % 2147483648) * 2654435761)
               % 4294967296 % 100 AS b
      FROM base
    )
    SELECT doc_id, canonical_id,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM j
    """


@q("split_leakage_safe_neardup", None)
def split_leakage_safe_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware leakage-safe split: Jaccard candidate pairs → connected components → canonical per cluster → the whole CLUSTER takes the canonical's deterministic split, so even non-identical near-duplicates can never straddle train and test (the full-strength version of split_leakage_safe; oracle replays the component closure with a recursive CTE)."""
    from procoggraph_spark.operators.sampling import deterministic_split

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    pairs = D.ngram_jaccard_pairs(
        d, id_col="doc_id", text_col="text", n=2, threshold=0.5, max_shingle_df=50
    )
    clusters = D.dedup_clusters(pairs, d, id_col="doc_id")
    s = deterministic_split(
        clusters,
        id_col="canonical_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return s.select("doc_id", "canonical_id", "split")


ORACLES["split_leakage_safe_neardup"] = _neardup_split_sql()


# --- BPE merge training (iterative vocab-table algorithm) -----------------

@q("text_bpe_train")
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training over the corpus (Sennrich et al. 2016): the corpus collapses once to a word-frequency table, then every merge iteration runs pair-count aggregation + argmax on the VOCAB-sized table with one (pair, count) row to the driver per merge — the third iterative-trainer shape next to k-means and the logistic classifier. Output: the learned merge table in order. Rows-only: the sequential merge loop isn't SQL-expressible; pytest pins exact merge-sequence equality with a pure-Python reference."""
    from procoggraph_spark.operators.bpe import train_bpe

    d = t(spark, sf_dir, "documents")
    merges, _ = train_bpe(d, text_col="text", n_merges=12)
    return spark.createDataFrame(
        [(i, a, b, a + b, int(c)) for i, (a, b, c) in enumerate(merges)],
        "rank long, sym_a string, sym_b string, merged string, pair_count long",
    )


@q("text_bpe_encode")
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-BPE encoding stats: learn 12 merges on the corpus, then tokenize every document with the learned vocab via a broadcast word→symbols join (OOV words fall back to characters+end-marker) — per doc: word count, subword token count, mean subword length. The encode pass is one map-side join at scan speed; the merge loop never reruns. Rows-only: depends on the trained merges; pytest pins the encode against the reference segmentation."""
    from procoggraph_spark.operators.bpe import bpe_encode, train_bpe

    d = t(spark, sf_dir, "documents")
    _, vocab = train_bpe(d, text_col="text", n_merges=12)
    return bpe_encode(d, vocab, id_col="doc_id", text_col="text")


# --- PQ compressed-vector ANN (ADC over 16-byte codes) --------------------

@q("sim_pq_adc_topk")
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ's compression half: train m=16 sub-codebooks (per-subspace Lloyd, model-only driver traffic), encode every vector to 16 one-byte codes map-side, then answer top-5 neighbor queries by scanning CODES with broadcast per-query distance tables (ADC) — zero vector arithmetic on the database side, 16 bytes scanned per vector instead of 256. Rows-only: depends on the trained codebooks; pytest pins code validity, encode determinism, and recall vs exact L2. Encode rides the Arrow/GEMM twin (the column-algebra form expands to m·k interpreted folds per row — 3.3 s vs 0.9 s at 50k×64d, and interpreter-bound at 1M+); outputs verified identical across sf0.001/0.01/0.1 and the tie convention is twin-property-pinned."""
    from procoggraph_spark.operators.pq import pq_adc_topk, pq_encode_numpy, train_pq

    e = t(spark, sf_dir, "embeddings")
    books = train_pq(e, m=16, k=16, dim=64, iterations=2)
    codes = pq_encode_numpy(e, books)
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in e.filter(
            (F.col("vec_id") < 3) & F.col("embedding").isNotNull()
        ).collect()
    ]
    return pq_adc_topk(codes, queries, books, top_k=5)


@q("sim_ivf_pq_topk")
def sim_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed billion-scale ANN serving shape: coarse IVF cells prune candidates (broadcast equi-join on the query's n_probe nearest cells), then ADC over 16-byte PQ codes reranks only the probed share of the corpus — no raw-vector arithmetic anywhere on the database side. Index built map-only (cell argmin + m code argmins) via the Arrow/GEMM twin, the documented 1M+ path (the column-algebra builder is interpreter-bound: 1.9 s vs 0.8 s at 50k×64d); outputs verified identical across sf0.001/0.01/0.1, tie convention twin-property-pinned. Rows-only: trained models; pytest pins recall vs exact and that pruning actually skips cells."""
    from procoggraph_spark.operators.pq import ivf_pq_index_numpy, ivf_pq_topk, train_pq
    from procoggraph_spark.operators.similarity import train_centroids

    e = t(spark, sf_dir, "embeddings")
    cents = train_centroids(e, n_cells=16, iterations=2)
    books = train_pq(e, m=16, k=16, dim=64, iterations=2)
    idx = ivf_pq_index_numpy(e, cents, books)
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in e.filter(
            (F.col("vec_id") < 3) & F.col("embedding").isNotNull()
        ).collect()
    ]
    return ivf_pq_topk(idx, queries, cents, books, n_probe=4, top_k=5)


@q("text_compression_ratio")
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the template/boilerplate curation signal (highly compressible = repetitive). One of the repo's few legitimate Python stages: no JVM codec expression exists, so it runs Arrow-batched under mapInPandas. Rows-only: codec output isn't SQL-replicable; pytest recomputes exact values with zlib directly and pins the repetitive<random ordering."""
    d = t(spark, sf_dir, "documents")
    return X.compression_ratio(d, id_col="doc_id", text_col="text")
