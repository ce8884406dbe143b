"""Training-pipeline extension queries (round 5, third batch):
containment near-dup, incremental-ingest dedup, per-source caps,
Zipf corpus auditing, and embedding outlier QA.

Registered LAST in the registry union so the driver's 50-row sample
window (pinned by tests/test_oracle_parity.py::test_driver_window_rotation)
is unaffected; every query here is oracle-backed and verified by the
full parity suite at sf0.001 plus the gate-fidelity sf0.01 run. All
rotate into driver visibility on a later round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# --- asymmetric containment near-dup (quote/subset duplication) -----------

@q(
    "dedup_containment",
    r"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, g AS sh
      FROM w, LATERAL unnest(list_transform(generate_series(1, len(w) - 1),
                                            i -> w[i] || ' ' || w[i + 1])) AS u(g)
    ),
    hot AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 200),
    cool AS (SELECT doc_id, sh FROM sh ANTI JOIN hot USING (sh)),
    sizes AS (SELECT doc_id, count(*) AS n FROM cool GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM cool a JOIN cool b USING (sh)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b, i, sa.n AS na, sb.n AS nb
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT CASE WHEN na < nb OR (na = nb AND id_a < id_b)
                THEN id_a ELSE id_b END AS contained_id,
           CASE WHEN na < nb OR (na = nb AND id_a < id_b)
                THEN id_b ELSE id_a END AS container_id,
           round(i / least(na, nb), 6) AS containment
    FROM pairs
    WHERE round(i / least(na, nb), 6) >= 0.3
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: |A∩B| / |smaller| over distinct word bigrams — catches the quote/subset case symmetric Jaccard misses (a short doc embedded in a long one is containment 1.0 but low Jaccard). Same shingle-keyed self-join shape and hot-shingle df guard as ngram_jaccard_pairs; output names the direction (contained_id = smaller shingle set, id-asc ties)."""
    return D.containment_pairs(
        t(spark, sf_dir, "documents"),
        n=2,
        threshold=0.3,
        max_shingle_df=200,
    )


# --- incremental-ingest dedup (the continual-crawl shape) -----------------

@q(
    "dedup_incremental_ingest",
    """
    WITH batch AS (
      SELECT doc_id, COALESCE(md5(text), '__NULL_TEXT__') AS k
      FROM documents WHERE source = 'src0'
    ),
    hist AS (
      SELECT DISTINCT COALESCE(md5(text), '__NULL_TEXT__') AS k
      FROM documents WHERE source <> 'src0'
    ),
    first AS (SELECT k, MIN(doc_id) AS first_id FROM batch GROUP BY k)
    SELECT b.doc_id,
           CASE WHEN h.k IS NOT NULL THEN 'dup_history'
                WHEN b.doc_id <> f.first_id THEN 'dup_batch'
                ELSE 'new' END AS decision
    FROM batch b JOIN first f USING (k) LEFT JOIN hist h USING (k)
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continual-ingestion dedup: the 'src0' slice plays the incoming crawl batch, every other source the already-ingested history. Each batch doc is classified new / dup_batch / dup_history by md5 content key — history reduced to its distinct key set before the join (the state an incremental key table maintains), within-batch firsts via groupBy(min)+join-back, never a window over the unbounded hash-key space."""
    docs = t(spark, sf_dir, "documents")
    return D.incremental_ingest_dedup(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )


# --- per-source document cap (the per-domain quota from CC pipelines) -----

@q(
    "curation_source_cap",
    """
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ((doc_id % 2147483648) * 2654435761)
                          % 4294967296 % 1000000, doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rn <= 15
    """,
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the per-domain quota every web-corpus pipeline applies so one giant domain can't dominate the mix): keep at most 15 docs per source, selected by the portable multiplicative-hash rank with id tie-break — a pure function of (source, doc_id), so reruns and re-ingests keep the identical subset. One shuffle on the source key via exact_k_per_group."""
    from procoggraph_spark.operators.sampling import exact_k_per_group

    return exact_k_per_group(
        t(spark, sf_dir, "documents").select("doc_id", "source"),
        id_col="doc_id",
        group_col="source",
        k=15,
    ).select("doc_id", "source")


# --- Zipf rank-frequency audit (corpus-health diagnostic) -----------------

@q(
    "text_zipf_slope",
    r"""
    WITH tk AS (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '')) AS term
      FROM documents
    ),
    c AS (SELECT term, COUNT(*) AS c FROM tk GROUP BY term),
    top AS (SELECT term, c FROM c ORDER BY c DESC, term LIMIT 1000),
    r AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rank FROM top
    )
    SELECT COUNT(*) AS n_terms,
           ROUND(regr_slope(ln(c), ln(rank)), 6) AS zipf_slope,
           ROUND(regr_intercept(ln(c), ln(rank)), 6) AS zipf_intercept
    FROM r
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency audit: least-squares slope of ln(freq) vs ln(rank) over the top-1000 terms — natural corpora sit near -1; a flat slope flags template/boilerplate floods, a cliff flags vocabulary collapse. The rank window runs on the LIMITed 1000-row table (bounded by construction — the forbidden-unbounded-window rule doesn't apply), ordered (freq desc, term) so both engines cut and rank the identical set; the term count itself is one map-side-combinable aggregation."""
    d = t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    top = counts.orderBy(F.desc("c"), "term").limit(1000)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("c"), "term"))
    )
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.regr_slope(F.log("c"), F.log("rank")), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(F.log("c"), F.log("rank")), 6).alias(
            "zipf_intercept"
        ),
    )


# --- embedding outlier QA (per-dim z-score, broadcast-fold) ---------------

@q(
    "emb_outlier_zscore",
    """
    WITH fe AS (
      -- finite_vectors boundary: a NaN/Inf component would poison the
      -- per-dim mean (Spark) and overflow STDDEV_POP (DuckDB raises
      -- Out of Range) — non-finite vectors are excluded from the
      -- population on both engines; zero-norm vectors stay (legit QA
      -- data points)
      SELECT vec_id, label, embedding FROM embeddings
      WHERE embedding IS NOT NULL
        AND COALESCE(list_sum(list_transform(
              embedding, x -> CAST(x AS DOUBLE) * x)), 0) < 'inf'::DOUBLE
    ),
    x AS (
      SELECT vec_id, label, i, embedding[i] AS v
      FROM fe, LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
    ),
    s AS (SELECT i, AVG(v) AS m, stddev_pop(v) AS sd FROM x GROUP BY i),
    -- per-ROW z fold over a broadcast stats array, mirroring the Spark
    -- plan: the earlier GROUP BY vec_id regroup silently MERGED
    -- bit-exact duplicate observations (redelivered rows, dirty-keys
    -- fuzz) and double-counted their dims; a bag of two observations
    -- must yield two QA rows
    sarr AS (SELECT list(m ORDER BY i) AS ms, list(sd ORDER BY i) AS sds FROM s),
    z AS (
      SELECT vec_id, label,
             list_max(zl) AS max_abs_z,
             CAST(len(list_filter(zl, zz -> zz >= 2.0)) AS BIGINT)
                 AS n_dims_over_2
      FROM (
        SELECT vec_id, label,
               list_transform(generate_series(1, len(embedding)),
                 i -> ABS(ROUND(CASE WHEN sds[i] = 0 THEN 0
                                     ELSE (CAST(embedding[i] AS DOUBLE) - ms[i])
                                          / sds[i] END, 4))) AS zl
        FROM fe CROSS JOIN sarr
      )
    )
    SELECT vec_id, label, max_abs_z, n_dims_over_2
    FROM z WHERE max_abs_z >= 3.0
    """,
)
def emb_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier QA: flag vectors whose worst per-dimension z-score is ≥3 (corrupt encodes, wrong-modality rows, normalization bugs). Per-dim mean/stddev_pop is one hash aggregation over a BOUNDED key space (the dim index); the stats come back as a single broadcast row of dim-indexed arrays and the z fold runs zip_with/aggregate at scan speed — the emb_centroid_medoid discipline: never a (vec,dim)-keyed join-back of the corpus, never a per-dim collect of raw vectors. z rounded to 4 before compare so both engines gate on identical values. Non-finite vectors are excluded from the population (finite_vectors boundary — a NaN component poisons the per-dim mean; DuckDB's STDDEV_POP raises outright on Inf)."""
    from procoggraph_spark.operators.similarity import finite_vectors

    e = finite_vectors(t(spark, sf_dir, "embeddings"))
    d = e.select("vec_id", F.posexplode("embedding").alias("dim", "_vf")).withColumn(
        "v", F.col("_vf").cast("double")
    )
    stats = d.groupBy("dim").agg(
        F.avg("v").alias("m"), F.stddev_pop("v").alias("sd")
    )
    sarr = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m", "sd"))),
            lambda s: s["m"],
        ).alias("_m"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m", "sd"))),
            lambda s: s["sd"],
        ).alias("_sd"),
    )
    zarr = F.zip_with(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("_m"),
            lambda a, b: a - b,
        ),
        F.col("_sd"),
        lambda num, sd: F.abs(
            F.round(F.when(sd == 0.0, F.lit(0.0)).otherwise(num / sd), 4)
        ),
    )
    return (
        e.crossJoin(F.broadcast(sarr))
        .select(
            "vec_id",
            "label",
            F.array_max(zarr).alias("max_abs_z"),
            F.size(F.filter(zarr, lambda z: z >= 2.0)).alias("n_dims_over_2"),
        )
        .filter(F.col("max_abs_z") >= 3.0)
    )


# --- cross-source shingle overlap matrix (mix-component diagnostics) ------

@q(
    "curation_source_overlap",
    r"""
    WITH w AS (
      SELECT source, list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT source, g AS sh
      FROM w, LATERAL unnest(list_transform(generate_series(1, len(w) - 1),
                                            i -> w[i] || ' ' || w[i + 1])) AS u(g)
    ),
    sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_shingles
      FROM sh a JOIN sh b USING (sh)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, shared_shingles,
           sa.n AS n_a, sb.n AS n_b,
           round(shared_shingles / least(sa.n, sb.n), 6) AS overlap_coef
    FROM shared JOIN sizes sa ON sa.source = source_a
                JOIN sizes sb ON sb.source = source_b
    """,
)
def curation_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap matrix: for every pair of corpus components, the overlap coefficient of their distinct word-bigram sets — the template/boilerplate-leakage diagnostic a mix designer reads before weighting sources (high overlap = the components are not independent evidence). CONTRACT: source is a mix-component label (tens to hundreds), so the per-shingle pair fanout is bounded by sources² — for domain-granularity overlap use the content-key path instead. The per-source distinct shingle table (sources × vocab — small) feeds three consumers, so it is lazily checkpointed once; the pair join is shingle-keyed, never cartesian."""
    from procoggraph_spark.operators.dedup import word_ngrams

    d = t(spark, sf_dir, "documents")
    sh = (
        d.select(
            "source",
            F.explode(F.array_distinct(word_ngrams(F.col("text"), 2))).alias("sh"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    a = sh.select(F.col("source").alias("source_a"), "sh")
    b = sh.select(F.col("source").alias("source_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_shingles"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_shingles",
            "n_a",
            "n_b",
            F.round(
                F.col("shared_shingles") / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("overlap_coef"),
        )
    )


# --- per-source quality drift (corpus monitoring) -------------------------

_QUALITY_BY_SOURCE_SQL = r"""
    WITH s AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(trim(text), '\s+'), _t -> _t <> '') AS ws,
             length(text) AS n,
             length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS np
      FROM documents
    ),
    m AS (
      SELECT source,
             ROUND((
               (CASE WHEN n >= 100 THEN 1.0 ELSE n / 100.0 END)
               + (1.0 - least(np * 1.0 / greatest(n, 1) * 5.0, 1.0))
               + least(len(list_filter(ws, w -> list_contains(
                   ['the','a','an','of','and','or','to','in','is','it'], w)))
                   * 1.0 / greatest(len(ws), 1) * 5.0, 1.0)
               + (CASE WHEN (list_sum(list_transform(ws, w -> length(w)))
                            * 1.0 / greatest(len(ws), 1)) BETWEEN 3.0 AND 12.0
                       THEN 1.0 ELSE 0.5 END)
             ) / 4.0, 6) AS quality
      FROM s
    ),
    per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             ROUND(AVG(quality), 6) AS avg_quality,
             ROUND(stddev_pop(quality), 6) AS sd_quality
      FROM m GROUP BY source
    ),
    g AS (
      SELECT AVG(avg_quality) AS gm, stddev_pop(avg_quality) AS gsd
      FROM per_src
    )
    SELECT source, n_docs, avg_quality, sd_quality,
           ROUND(CASE WHEN gsd = 0 THEN 0
                      ELSE (avg_quality - gm) / gsd END, 4) AS drift_z
    FROM per_src CROSS JOIN g
"""


@q("curation_quality_drift", _QUALITY_BY_SOURCE_SQL)
def curation_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality drift monitor: mean/spread of the composite quality score per corpus component, plus each component's z-score against the across-source distribution — the dashboard row that catches one source going bad between crawls. Two bounded aggregations (source key space, then a single-row global over the per-source table broadcast back with a crossJoin); the per-doc scoring is the same scan-speed column algebra as text_quality_score."""
    from procoggraph_spark.operators import text as X

    d = t(spark, sf_dir, "documents")
    per_doc = d.select("source", X.quality_score(F.col("text")).alias("quality"))
    per_src = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.stddev_pop("quality"), 6).alias("sd_quality"),
    )
    # two consumers (global stats + final select) and no plan-level
    # CSE would re-run the corpus-wide scoring scan twice; the
    # checkpointed frame is source-cardinality tiny (interleaved
    # best-of-4 at the 10× probe: 0.73 vs 0.93 s)
    per_src = per_src.localCheckpoint(eager=False)
    g = per_src.agg(
        F.avg("avg_quality").alias("_gm"),
        F.stddev_pop("avg_quality").alias("_gsd"),
    )
    return (
        per_src.crossJoin(F.broadcast(g))
        .select(
            "source",
            "n_docs",
            "avg_quality",
            "sd_quality",
            F.round(
                F.when(F.col("_gsd") == 0.0, F.lit(0.0)).otherwise(
                    (F.col("avg_quality") - F.col("_gm")) / F.col("_gsd")
                ),
                4,
            ).alias("drift_z"),
        )
    )
