"""Product quantization (PQ) for compressed-vector similarity search
(Jégou et al. 2011) — the missing half of the IVF+PQ stack next to
`similarity.ivf_*`: vectors compress to ``m`` small codes (here m
sub-codebooks of k centroids each → m·log2(k) bits per vector, e.g.
64-d float32 → 16 bytes at m=16, k=16), and queries scan the CODES with
asymmetric distance (ADC) — per-query lookup tables replace all
floating-point vector arithmetic on the database side.

Scale shape: training is per-subspace Lloyd reusing
`similarity.train_centroids` (model-only driver traffic, m small
k-means runs); encoding is a map-only column-algebra argmin per
subspace (no shuffle, no Python); the ADC scan broadcasts the queries
WITH their precomputed distance tables (model-sized) and folds m table
lookups per database row — the database never touches raw vectors at
query time, which is the entire point at 100 TB (16 B/vector scanned
instead of 256 B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from procoggraph_spark.operators.similarity import train_centroids


def train_pq(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k: int = 16,
    dim: int = 64,
    iterations: int = 3,
) -> list[list[list[float]]]:
    """Train the PQ codebooks: split the ``dim``-dimensional space into
    ``m`` contiguous subspaces and run Lloyd's k-means (k centroids)
    independently in each — ``codebooks[s][c]`` is subspace ``s``'s
    centroid ``c`` (a dim/m-float list). Deterministic end-to-end (the
    reused trainer seeds from lowest ids with stable ties)."""
    if dim % m != 0:
        raise ValueError("dim must divide evenly into m subspaces")
    d_sub = dim // m
    books: list[list[list[float]]] = []
    for s in range(m):
        sub = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col).cast("array<double>"), s * d_sub + 1, d_sub).alias(
                "embedding"
            ),
        )
        crows = train_centroids(
            sub, id_col="vec_id", vec_col="embedding",
            n_cells=k, iterations=iterations,
        )
        books.append([v for _, v in crows])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-centroid codes — pure
    column algebra on the scan (per subspace: k squared-distance folds,
    argmin via sorted struct array with code-ascending tie-break), no
    shuffle and no Python."""
    m = len(codebooks)
    k = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    codes = []
    for s in range(m):
        sub = F.slice(v, s * d_sub + 1, d_sub)
        cands = F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(x)) for x in codebooks[s][c]]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(c).alias("c"),
            )
            for c in range(k)
        ])
        codes.append(F.array_sort(cands)[0]["c"])
    return df.select(F.col(id_col), F.array(*codes).alias(code_col))


def pq_adc_topk(
    db_codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    top_k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: for each (query_id, vector) build the
    m×k table of exact subspace distances DRIVER-side (model-sized),
    broadcast the flattened tables, and score every database row with
    ``m`` array lookups — zero vector arithmetic on the database side.
    Returns (query_id, vec_id, adc_dist, rank), rank-limited per query
    (WindowGroupLimit: bounded per-query candidate lists)."""
    m = len(codebooks)
    k = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    rows = []
    for qid, qv in queries:
        table = []
        for s in range(m):
            qs = qv[s * d_sub:(s + 1) * d_sub]
            for c in range(k):
                cent = codebooks[s][c]
                table.append(sum((a - b) ** 2 for a, b in zip(qs, cent)))
        rows.append((qid, table))
    spark = db_codes.sparkSession
    qdf = spark.createDataFrame(rows, "query_id long, _dtable array<double>")
    scored = db_codes.crossJoin(F.broadcast(qdf)).withColumn(
        "adc_dist",
        F.round(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.element_at(
                        "_dtable",
                        (s * k + F.element_at(F.col(code_col), s + 1) + 1).cast(
                            "int"
                        ),
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", id_col, "adc_dist", "rank")
    )
