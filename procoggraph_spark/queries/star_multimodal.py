"""Multimodal-column coverage over the `documents` table: opaque binary
payloads with typed metadata, mapInPandas feature extraction, and video
frame-sampling plumbing (SURVEY §7 M6 / driver's multimodal family).

The container has no codec libraries, so payloads are derived
deterministically from the text column (`encode(text)` on both engines)
and the "decoder" is the deterministic fake in operators.multimodal —
the Spark-side plumbing (BinaryType columns, Arrow batch shapes,
explode-based frame plans) is real and oracle/pytest-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procoggraph_spark.operators import multimodal as M
from procoggraph_spark.operators import similarity as S
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


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → asset table with a real BinaryType payload column.

    mime is derived from `source` so the metadata is typed and joinable;
    at 100 TB this column layout (id, mime, binary payload) is the
    Parquet schema a crawl archive would use.
    """
    d = t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(F.lit("application/x-"), F.col("source")).alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


@q(
    "mm_resize",
    """
    WITH a AS (
      SELECT doc_id AS asset_id,
             'application/x-' || source AS mime,
             CAST(100 + doc_id % 500 AS INT) AS width,
             CAST(80 + doc_id % 300 AS INT) AS height,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    s AS (
      SELECT *,
             CASE WHEN greatest(width, height) <= 256 THEN 1.0
                  ELSE 256 / greatest(width, height) END AS scale
      FROM a
    ),
    tgt AS (
      SELECT asset_id, mime, width, height, n,
             CAST(CEIL(width * scale) AS INT) AS target_width,
             CAST(CEIL(height * scale) AS INT) AS target_height
      FROM s
    )
    SELECT asset_id, mime, width, height, target_width, target_height,
           CASE WHEN target_width * target_height >= width * height OR n = 0
                THEN n
                ELSE CAST(CEIL(n * 1.0 / greatest(
                       (width * height) // (target_width * target_height), 1))
                     AS BIGINT)
           END AS resized_bytes
    FROM tgt
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing end-to-end: JVM-side aspect-preserving target
    dims + mapInPandas payload transform (deterministic byte-stride
    fake; a codec-backed resize slots into the same batch signature).
    The oracle recomputes the byte count arithmetically — integer-exact
    on both engines."""
    a = _assets(spark, sf_dir).select(
        "asset_id",
        "mime",
        (100 + F.col("asset_id") % 500).cast("int").alias("width"),
        (80 + F.col("asset_id") % 300).cast("int").alias("height"),
        "payload",
    )
    resized = M.resize_images(a, max_side=256)
    return resized.select(
        "asset_id",
        "mime",
        "width",
        "height",
        "target_width",
        "target_height",
        F.octet_length("payload").cast("long").alias("resized_bytes"),
    )


# --- typed metadata over binary columns ------------------------------------

@q(
    "mm_asset_metadata",
    """
    SELECT mime, COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, MAX(n_bytes) AS max_bytes
    FROM (
      SELECT 'application/x-' || source AS mime,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ) GROUP BY mime
    """,
)
def mm_asset_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction over opaque binary asset columns (size/kind/dims) without decoding payloads."""
    a = _assets(spark, sf_dir)
    return a.groupBy("mime").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )


# --- video frame-sampling plumbing (sequence + explode, shuffle-free) ------

@q(
    "mm_frame_sample",
    """
    WITH v AS (
      SELECT doc_id AS asset_id, (n_chars % 240) + 1 AS n_frames
      FROM documents WHERE doc_id < 100
    )
    SELECT asset_id, CAST(u.frame_idx AS INT) AS frame_idx
    FROM v, LATERAL unnest(range(0, n_frames, 30)) AS u(frame_idx)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling positions for video-like assets (stride from metadata, no codec)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    v = d.select(
        F.col("doc_id").alias("asset_id"),
        ((F.col("n_chars") % 240) + 1).cast("int").alias("n_frames"),
    )
    return M.frame_sample_plan(v, every_n=30)


# --- mapInPandas feature extraction over binary batches --------------------

def _feat_h_expr() -> str:
    """The 5-step polynomial fold of `multimodal._shingle_hash` as a
    DuckDB expression over BYTE positions of the UTF-8 payload. The
    kernel hashes raw bytes, so the twin must too: byte i is read from
    the hex dump of encode(text) (two hex chars per byte, decoded with
    the strpos('123456789ABCDEF', ...) trick — '0' maps to 0 because
    strpos returns 0 on no-match). The earlier codepoint form
    (ascii(substr(text, ...))) agreed only on pure-ASCII corpora and
    diverged on the round-8 unicode fuzz docs."""
    def byte(pos: str) -> str:
        return (
            f"(16 * strpos('123456789ABCDEF', substr(hx, 2 * ({pos}) - 1, 1))"
            f" + strpos('123456789ABCDEF', substr(hx, 2 * ({pos}), 1)))"
        )

    expr = "0"
    for k in range(5):
        b = f"(CASE WHEN u.i + {k} <= n THEN {byte(f'u.i + {k}')} ELSE 0 END)"
        expr = f"(({expr}) * 1000003 + {b}) % 2147483648"
    return expr


_FEATURE_EXTRACT_SQL = f"""
    WITH a AS (
      SELECT doc_id AS asset_id, 'application/x-' || source AS mime,
             hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE doc_id < 100
    ),
    sh AS (
      -- NULL payload never reaches the shingle fold (the kernel
      -- returns the all-zero vector without hashing); the LEFT JOIN +
      -- COALESCE below reproduces exactly that zero vector
      SELECT asset_id, (h * 2654435761) % 2147483648 AS hm
      FROM (
        SELECT asset_id, {_feat_h_expr()} AS h
        FROM a, LATERAL unnest(generate_series(1, greatest(n - 4, 1))) AS u(i)
        WHERE hx IS NOT NULL
      )
    ),
    acc AS (
      SELECT asset_id, hm % 8 AS bucket,
             SUM(CASE WHEN (hm // 8) % 2 = 1 THEN 1 ELSE -1 END) AS v
      FROM sh GROUP BY asset_id, hm % 8
    ),
    nrm AS (
      SELECT asset_id,
             CASE WHEN SUM(v * v) = 0 THEN 1.0 ELSE sqrt(SUM(v * v)) END AS n0
      FROM acc GROUP BY asset_id
    ),
    f AS (
      SELECT acc.asset_id, bucket, ROUND(v / n0, 6) AS fv
      FROM acc JOIN nrm USING (asset_id)
    ),
    fn AS (
      SELECT asset_id, ROUND(sqrt(SUM(fv * fv)), 4) AS feat_norm
      FROM f GROUP BY asset_id
    )
    SELECT a.asset_id, a.mime, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bytes,
           COALESCE(fn.feat_norm, 0.0) AS feat_norm,
           COALESCE(f0.fv, 0.0) AS feat_0,
           COALESCE(f1.fv, 0.0) AS feat_1,
           COALESCE(f2.fv, 0.0) AS feat_2,
           COALESCE(f3.fv, 0.0) AS feat_3
    FROM a
    LEFT JOIN fn ON fn.asset_id = a.asset_id
    LEFT JOIN f f0 ON f0.asset_id = a.asset_id AND f0.bucket = 0
    LEFT JOIN f f1 ON f1.asset_id = a.asset_id AND f1.bucket = 1
    LEFT JOIN f f2 ON f2.asset_id = a.asset_id AND f2.bucket = 2
    LEFT JOIN f f3 ON f3.asset_id = a.asset_id AND f3.bucket = 3
    """


@q("mm_feature_extract", _FEATURE_EXTRACT_SQL)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake feature extractor over binary payloads —
    oracle-backed end to end since the round-6 portable kernel: the
    DuckDB twin replays the 5-byte shingle fold, multiplicative-mix
    bucketing, ±1 signs, and L2 normalization from the base table
    (payload bytes == ascii codes on the pure-ASCII driver corpora,
    which the parity suite checks at both SFs).

    Driver-facing projection: the raw ``array<double>`` feature column
    is unsortable by the external checker's pandas canonicalizer
    (round-5 check crashed on it), so the registered query replaces it
    with deterministic scalars — vector L2 norm and the first four
    components, rounded — while ``attach_fake_features`` keeps returning
    the full array for pytest and ANN composition."""
    a = _assets(spark, sf_dir).filter(F.col("asset_id") < 100)
    feat = M.attach_fake_features(a)
    return feat.select(
        "asset_id",
        "mime",
        "n_bytes",
        F.round(
            F.sqrt(F.aggregate("features", F.lit(0.0), lambda s, x: s + x * x)), 4
        ).alias("feat_norm"),
        F.round(F.col("features")[0], 6).alias("feat_0"),
        F.round(F.col("features")[1], 6).alias("feat_1"),
        F.round(F.col("features")[2], 6).alias("feat_2"),
        F.round(F.col("features")[3], 6).alias("feat_3"),
    )


# --- multimodal → similarity: features feed the ANN operators --------------

def _neardup_oracle_sql() -> str:
    """SQL twin of the whole multimodal near-dup pipeline. The Spark
    side's pigeonhole block join is LOSSLESS for pairs within
    max_hamming (that is the pigeonhole guarantee), so the oracle
    replays its semantics as all-pairs Hamming <= 20 per plane family
    — plus the portable feature kernel (shared CTEs with
    mm_feature_extract's oracle), the sha256-derived hyperplane
    coefficients inlined as literals (sim_lsh_ann precedent), 64-bit
    signatures as signed BIGINT bit sums (bit 63 emitted as the
    negative two's-complement literal Spark's long also wraps to),
    and the exact cosine rerank with the fold's dimension order."""
    from procoggraph_spark.operators.similarity import _det_plane_component

    dims = 8

    def sig_expr(off: int) -> str:
        terms = []
        for p in range(64):
            coeffs = [_det_plane_component(off + p, d) for d in range(dims)]
            dot = " + ".join(
                f"f{d} * ({float(c)})" for d, c in enumerate(coeffs)
            )
            bit = (1 << p) if p < 63 else -(1 << 63)
            terms.append(
                f"(CASE WHEN {dot} >= 0 THEN CAST({bit} AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            )
        return "\n         + ".join(terms)

    pivot = ",\n             ".join(
        f"COALESCE(MAX(CASE WHEN bucket = {d} THEN fv END), 0.0) AS f{d}"
        for d in range(dims)
    )
    dot_ab = " + ".join(f"va.f{d} * vb.f{d}" for d in range(dims))
    na = " + ".join(f"va.f{d} * va.f{d}" for d in range(dims))
    nb = " + ".join(f"vb.f{d} * vb.f{d}" for d in range(dims))
    return f"""
    WITH a AS (
      SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE doc_id < 100
    ),
    sh AS (
      -- hx IS NOT NULL: a NULL payload has NO shingles (the kernel
      -- returns the zero vector without hashing) — without the filter
      -- the CASE fold hashes the all-zero ghost shingle and a missing
      -- asset impersonates the empty-payload feature vector, pairing
      -- at cosine 1.0 with every empty document (fuzz finding); here
      -- it drops out of f entirely, matching the Spark side where the
      -- zero vector's NULL cosine never passes the 0.9 gate
      SELECT asset_id, (h * 2654435761) % 2147483648 AS hm
      FROM (
        SELECT asset_id, {_feat_h_expr()} AS h
        FROM a, LATERAL unnest(generate_series(1, greatest(n - 4, 1))) AS u(i)
        WHERE hx IS NOT NULL
      )
    ),
    acc AS (
      SELECT asset_id, hm % 8 AS bucket,
             SUM(CASE WHEN (hm // 8) % 2 = 1 THEN 1 ELSE -1 END) AS v
      FROM sh GROUP BY asset_id, hm % 8
    ),
    nrm AS (
      SELECT asset_id,
             CASE WHEN SUM(v * v) = 0 THEN 1.0 ELSE sqrt(SUM(v * v)) END AS n0
      FROM acc GROUP BY asset_id
    ),
    f AS (
      SELECT acc.asset_id, bucket, ROUND(v / n0, 6) AS fv
      FROM acc JOIN nrm USING (asset_id)
    ),
    v AS (
      SELECT asset_id,
             {pivot}
      FROM f GROUP BY asset_id
    ),
    s0 AS (SELECT asset_id, {sig_expr(0)} AS sig FROM v),
    s1 AS (SELECT asset_id, {sig_expr(64)} AS sig FROM v),
    cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT x.asset_id AS id_a, y.asset_id AS id_b
        FROM s0 x JOIN s0 y ON x.asset_id < y.asset_id
        WHERE bit_count(xor(x.sig, y.sig)) <= 20
        UNION ALL
        SELECT x.asset_id AS id_a, y.asset_id AS id_b
        FROM s1 x JOIN s1 y ON x.asset_id < y.asset_id
        WHERE bit_count(xor(x.sig, y.sig)) <= 20
      )
    )
    SELECT c.id_a, c.id_b,
           ROUND(({dot_ab}) / (sqrt({na}) * sqrt({nb})), 6) AS cosine_sim
    FROM cand c
    JOIN v va ON va.asset_id = c.id_a
    JOIN v vb ON vb.asset_id = c.id_b
    WHERE ROUND(({dot_ab}) / (sqrt({na}) * sqrt({nb})), 6) >= 0.9
    """


@q("mm_feature_neardup", _neardup_oracle_sql())
def mm_feature_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal near-dup: binary payload → mapInPandas
    features → hyperplane-SimHash blocking → exact cosine rerank.

    The candidate stage reuses the text path's machinery: TWO independent
    64-plane hyperplane signatures per feature vector (plane families
    0..63 and 64..127), each through the pigeonhole-block equi-join
    (dedup.simhash_near_pairs), candidates unioned — so work scales with
    per-block co-residents, never O(n²); the final cosine is exact on
    candidates only. Recall is approximate by construction: a 0.9-cosine
    pair differs on ~9.2 of 64 planes (σ≈2.8), so one 20-bit Hamming
    gate misses with p≈3e-5 (4σ); two independent tables bound the miss
    at p≈1e-9 at the 0.9 operating point. Oracle-backed since the
    round-6 portable feature kernel: the DuckDB twin rebuilds features,
    inlined-coefficient signatures, the (lossless) Hamming-20 candidate
    semantics, and the cosine rerank; pytest additionally checks every
    emitted pair against a pandas recomputation."""
    from procoggraph_spark.operators import dedup as D

    # the feature frame feeds both signature tables (each self-joined —
    # map-only lineage re-executes per join side) and both rerank
    # sides: six executions of the Python feature stage without a
    # checkpoint; materialize the model-sized frame once
    feats = M.attach_fake_features(
        _assets(spark, sf_dir).filter(F.col("asset_id") < 100)
    ).localCheckpoint(eager=False)
    cands = []
    for off in (0, 64):
        sigs = feats.select(
            "asset_id",
            S.hyperplane_signature(
                F.col("features"), n_planes=64, dim=M.FEATURE_DIM, plane_offset=off
            ).alias("simhash"),
        )
        cands.append(
            D.simhash_near_pairs(sigs, id_col="asset_id", max_hamming=20).select(
                "id_a", "id_b"
            )
        )
    cand = cands[0].unionByName(cands[1]).distinct()
    a = feats.select(F.col("asset_id").alias("id_a"), F.col("features").alias("_va"))
    b = feats.select(F.col("asset_id").alias("id_b"), F.col("features").alias("_vb"))
    sim = S.cosine(F.col("_va"), F.col("_vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine_sim", F.round(sim, 6))
        .filter(F.col("cosine_sim") >= 0.9)
        .select("id_a", "id_b", "cosine_sim")
    )
