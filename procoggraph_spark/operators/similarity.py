"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query set
against a full scan of the corpus; JVM-side `zip_with`/`aggregate` dot
products, no Python. Scale path: LSH bucketing (random-hyperplane signs
with deterministic integer planes) so candidate generation is an
equi-join on bucket signature instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    # NOTE(measured): an unrolled a[0]*b[0]+...+a[63]*b[63] expression is
    # ~2x SLOWER than this higher-order fold (per-element null checks and
    # a 64-deep Add tree vs one primitive array loop) — don't "optimize"
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def searchable(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The similarity family's shared boundary filter: NULL vectors,
    zero-norm (all-zero) vectors, and vectors with any NON-FINITE
    component are unsearchable and unindexable — cosine is undefined at
    zero norm, an unguarded division NaNs, and a NaN/Inf similarity
    sorts ABOVE every real one in a desc rank window on the JVM path
    while numpy's argsort puts NaN LAST, so a single poisoned vector
    makes ranks engine-dependent. One predicate, applied at every
    operator's vector load, so the whole family shares one edge
    contract; the SQL twin is SEARCHABLE_SQL.

    Squares in DOUBLE (matching SEARCHABLE_SQL's CAST(x AS DOUBLE)):
    squaring in the array's native float would underflow |x| ~< 1e-23
    to a zero sum and disagree with the oracle on which vectors are
    searchable. Finiteness rides the same fold: a NaN component makes
    the sum NaN and an Inf/overflow component makes it +Inf, and BOTH
    engines place NaN above +Inf in the comparison total order, so
    `sum < +Inf` is a one-predicate finite-and-usable test."""
    sq = _sq_sum(vec_col)
    return df.filter(
        F.col(vec_col).isNotNull()
        & (sq > 0.0)
        & (sq < F.lit(float("inf")))
    )


def _sq_sum(vec_col: str) -> Column:
    """Sum of double-squared components — NaN if any component is NaN,
    +Inf if any component is ±Inf (or the squares overflow)."""
    return F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def finite_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The weaker boundary for population statistics (covariance,
    per-dim z-scores): non-NULL vectors whose components are all
    finite. Unlike ``searchable``, zero-norm vectors STAY — an all-zero
    embedding is a legitimate data point for corpus QA, it is only
    undefined as a cosine-search operand. A NaN/Inf component, by
    contrast, poisons any aggregate it enters (and integer
    quantization ANSI-crashes on it), so a non-finite vector
    contributes to no population on either engine. SQL twin:
    FINITE_SQL."""
    sq = _sq_sum(vec_col)
    return df.filter(
        F.col(vec_col).isNotNull() & (sq < F.lit(float("inf")))
    )


def key_unique(
    df: DataFrame, id_col: str, payload_cols: list[str]
) -> DataFrame:
    """Deterministic key survivorship for the id-keyed ANN operators:
    one row per ``id_col``, the lexicographic minimum of the payload
    struct. Operators whose INTERNAL algebra keys on the id — IVF cell
    assignment (one cell per id), PQ shortlist fetch-by-id, the kNN
    vote's label join — are ill-defined over a bag with replayed ids
    (dirty-keys fuzz: a duplicated vec_id made the kept copy
    partition-dependent via dropDuplicates, and doubled kNN votes via
    the label join-back), so they resolve duplicates at their input
    boundary, deterministically on both engines. Pure ranking
    operators (brute force / GEMM top-k) are bag-safe and take inputs
    as-is. Apply AFTER ``searchable``/``finite_vectors`` so the
    payload order never compares non-finite components. SQL twin:
    ``ROW_NUMBER() OVER (PARTITION BY id ORDER BY <payload...>) = 1``.
    One groupBy on the id; min(struct) combines map-side."""
    return (
        df.groupBy(id_col)
        .agg(F.min(F.struct(*payload_cols)).alias("_p"))
        .select(
            id_col, *[F.col(f"_p.{c}").alias(c) for c in payload_cols]
        )
    )


# SQL fragment for the same boundary in DuckDB oracles (append to the
# embedding-scan WHERE clause; `{v}` is the raw vector column).
# NOTE: NOT list_dot_product — DuckDB's list_inner_product raises on a
# NULL list even behind `{v} IS NOT NULL AND ...` (no short-circuit
# guarantee in WHERE); the list_sum fold is NULL-safe (NULL -> 0).
# The `< 'inf'` leg is the finiteness test (NaN > Inf in DuckDB's
# comparison order too, so it excludes NaN and Inf sums alike).
_SQ_SQL = "COALESCE(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * x)), 0)"
SEARCHABLE_SQL = f"{_SQ_SQL} > 0 AND {_SQ_SQL} < 'inf'::DOUBLE"
# finite_vectors' twin: non-NULL + all-finite (zero-norm kept)
FINITE_SQL = f"{{v}} IS NOT NULL AND {_SQ_SQL} < 'inf'::DOUBLE"


def _dominant_dim(vectors) -> int:
    """The model dimension of a vector sample: the most common length
    (tie -> smallest, deterministic). Anchoring on 'the first row'
    breaks when that row is itself ragged — the mode does not."""
    from collections import Counter

    counts = Counter(len(v) for v in vectors)
    return min(sorted(counts), key=lambda n: (-counts[n], n))


def rows_of_dim(pdf, vec_col: str, d: int):
    """Per-batch dimension guard for the numpy kernels: rows whose
    vector length differs from the query/model dimension ``d`` are
    unsearchable against it and are dropped — a ragged encoder output
    (e.g. a truncated embedding) must degrade like a NULL vector, not
    crash ``np.stack`` with an inhomogeneous-shape error (dirty-vector
    probe). The JVM paths already degrade (zip_with NULL-pads)."""
    lens = pdf[vec_col].map(len)
    mask = lens == d
    return pdf if bool(mask.all()) else pdf[mask]


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm (the
    mathematically undefined case — an all-zero feature vector, e.g.
    from an empty payload, must not ANSI-crash the division; hit live
    on the NULL-input sweep through mm_feature_neardup's join
    condition)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    The query side is broadcast (it is the small side by construction);
    ranking is a window per query with a deterministic (sim desc, id asc)
    order. Output: (query_id, neighbor_id, cosine_sim, rank).

    Each side's L2 norm is computed once per ROW (before the pair
    blow-up), not once per pair — at N corpus × Q queries that turns
    2·N·Q norm evaluations into N + Q.
    """
    # cast float→double up front: float products carry ~1e-7 relative
    # error, which breaks 6-decimal agreement with the oracle.
    # NULL vectors AND zero-norm vectors are unsearchable and
    # unindexable — both sides load through the family's shared
    # searchable() boundary (cosine is undefined at zero norm; an
    # unguarded division would yield NaN, which sorts ABOVE real
    # similarities in the desc rank window and would make a zero
    # vector every query's top neighbor). searchable() sums squares in
    # double, so a denormal-float vector passes here exactly as it
    # does in ivf/lsh/mmr/rocchio — one edge contract, no per-operator
    # fork.
    q = F.broadcast(
        searchable(queries, vec_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        ).withColumn("_qn", l2_norm(F.col("_qv")))
    )
    c = searchable(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def gemm_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k via one BLAS GEMM per Arrow batch — the
    Python-wins variant of ``brute_force_topk`` (same results, same
    rounding on the tested data; ~40% faster at sf0.1 where compute
    dominates, parity at 100 k vectors where Arrow transfer does).

    The query matrix (small by construction) ships in the closure; each
    corpus partition computes ``V @ Q.T`` and keeps its local top-k per
    query, so the shuffle is (partitions × queries × k) rows — the
    global window only ranks that. Demonstrates the engine's UDF
    discipline: when Python IS the fast path, it is Arrow-batched
    matrix algebra, never per-row.

    ulp note: numpy's pairwise summation can differ from the JVM
    fold's sequential order in the last bit; a ROUND(...,6) disagreement
    needs a value within ~1e-10 of a rounding boundary — checked
    exact-equal against the oracle on the driver datasets.
    """
    import numpy as np
    import pandas as pd

    # the family's shared searchable() boundary drops NULL and
    # zero-norm queries (double-summed squares, same contract as
    # ivf/lsh/brute-force); the collect is model-sized by construction
    qrows = searchable(queries, vec_col).select(id_col, vec_col).collect()
    if not qrows:
        # searching with zero queries finds zero neighbors — return an
        # empty frame with the contract schema instead of crashing on a
        # zero-row GEMM (hit by the empty-input robustness sweep).
        # Id field types are derived from the inputs so the degenerate
        # path returns the SAME schema as the normal path for non-long
        # ids (unions/downstream schema checks must not fork on empty).
        return corpus.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", queries.schema[id_col].dataType),
                    T.StructField("neighbor_id", corpus.schema[id_col].dataType),
                    T.StructField("cosine_sim", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )
    # the query set defines the search dimension (dominant length);
    # deviant-dim queries are unsearchable, same contract as
    # rows_of_dim below
    d = _dominant_dim(r[vec_col] for r in qrows)
    qrows = [r for r in qrows if len(r[vec_col]) == d]
    qids = np.array([r[id_col] for r in qrows])
    Q = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    Qn = np.linalg.norm(Q, axis=1)

    def part(batches):
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if len(pdf):
                pdf = rows_of_dim(pdf, vec_col, d)
            if not len(pdf):
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            Vn = np.linalg.norm(V, axis=1)
            # zero-norm corpus rows: same boundary drop as the NULL
            # filter above (would otherwise divide to NaN)
            nz = Vn != 0.0
            if not nz.all():
                V, ids, Vn = V[nz], ids[nz], Vn[nz]
            if not len(ids):
                continue
            S = (V @ Q.T) / np.outer(Vn, Qn)
            out = []
            for j, qid in enumerate(qids):
                # round BEFORE the local cut: the global window and the
                # SQL oracle rank by the 6-decimal value with id-asc
                # tie-break, so the local top-k must use the identical
                # key or a k-boundary tie can keep the row the oracle
                # drops
                s = np.round(S[:, j], 6)
                mask = ids != qid
                idx = np.lexsort((ids[mask], -s[mask]))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": ids[mask][idx],
                            "cosine_sim": s[mask][idx],
                        }
                    )
                )
            if out:
                yield pd.concat(out)

    # corpus load through the same searchable() boundary; the in-batch
    # NULL/zero-norm guards below stay as defense in depth (a repartition
    # between filter and mapInPandas cannot reorder them away, but the
    # contract lives in ONE place)
    partial = searchable(corpus, vec_col).select(id_col, vec_col).mapInPandas(
        part,
        T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("neighbor_id", corpus.schema[id_col].dataType),
                T.StructField("cosine_sim", T.DoubleType()),
            ]
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _det_plane_component(plane: int, dim: int) -> int:
    """Deterministic, well-mixed plane component in [-6, 6]: sha256 of
    the (plane, dim) coordinate — no RNG state, identical on every run
    and driver (unlike salted `hash()`)."""
    import hashlib

    h = hashlib.sha256(f"{plane}:{dim}".encode()).digest()
    return int.from_bytes(h[:4], "big") % 13 - 6


def hyperplane_signature(
    vec: Column, *, n_planes: int, dim: int, plane_offset: int = 0
) -> Column:
    """Sign pattern of the vector against ``n_planes`` deterministic
    integer hyperplanes, packed as a long bitmask. ``plane_offset``
    selects an independent plane family (offset 64 → planes 64..127),
    for multi-table blocking with independent miss probabilities."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        coeffs = [_det_plane_component(plane_offset + p, d) for d in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in coeffs]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str = "_v",
    n_probe: int = 1,
) -> DataFrame:
    """Assign every vector to its ``n_probe`` nearest centroids.

    Broadcast the (small) centroid table against a full scan — a
    broadcast nested-loop + per-id top-n, the shape that survives a
    100× corpus scale-up because the corpus is never shuffled against
    itself. For n_probe=1 the argmax is a single map-side
    ``max(struct(score, -cell))`` agg (deterministic tie-break to the
    lowest cell id) — no window, one shuffle on id."""
    # norms once per vector / per centroid, not per (vector, centroid)
    v = vectors.withColumn("_vn", l2_norm(F.col(vec_col)))
    cents = centroids.withColumn("_ctn", l2_norm(F.col("_cv")))
    scored = v.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_cell"),
        # rounded like the numpy path, so both assignment backends (and
        # the SQL oracle twin) resolve near-tie cells identically
        F.round(
            dot(F.col(vec_col), F.col("_cv")) / (F.col("_vn") * F.col("_ctn")), 6
        ).alias("_score"),
    )
    if n_probe == 1:
        best = scored.groupBy(id_col, vec_col).agg(
            F.max(F.struct(F.col("_score"), (-F.col("_cell")).alias("_nc"))).alias("_b")
        )
        return best.select(id_col, vec_col, (-F.col("_b._nc")).alias("_cell"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.asc("_cell"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .select(id_col, vec_col, "_cell")
    )


def ivf_assign_numpy(
    vectors: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    *,
    id_col: str,
    vec_col: str = "_v",
    n_probe: int = 1,
    metric: str = "cosine",
) -> DataFrame:
    """Vectorized cell assignment: one Arrow batch → one numpy matrix
    multiply against the (tiny, driver-held) centroid matrix — the
    per-element interpreted cost of the column-algebra path becomes one
    BLAS call per batch (~10× at 100k vectors). The centroid list is
    the 'model' side: bounded by n_cells, shipped in the task closure
    exactly like a broadcast.

    ``metric`` picks the assignment rule: ``"cosine"`` (rounded cosine
    argmax — the `ivf_topk` convention its SQL oracle replays) or
    ``"l2"`` (rounded squared-L2 argmin — the `ivf_pq_index`
    convention; training IVF cells with the same metric the index
    assigns by is worth ~0.1 recall@10 at 1M vectors)."""
    import numpy as np

    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    cells = np.array([cid for cid, _ in centroid_rows], dtype=np.int64)
    # a malformed (ragged-seed) centroid becomes a +inf row: cosine ~0
    # / L2 inf — never a plausible assignment, and np.stack stays
    # rectangular (same contract as the PQ builders)
    d_cell = _dominant_dim(v for _, v in centroid_rows)
    C = np.stack(
        [
            np.asarray(v, dtype=np.float64)
            if len(v) == d_cell
            else np.full(d_cell, np.inf)
            for _, v in centroid_rows
        ]
    )
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0.0] = 1.0
    Cn2 = (C * C).sum(axis=1)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.DoubleType())),
            T.StructField("_cell", T.LongType()),
        ]
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf):
                # model dim rules: deviant-dim vectors are unindexable
                pdf = rows_of_dim(pdf, vec_col, C.shape[1])
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy())
            # round before the argmax/argmin cut (same convention as
            # gemm_topk): assignment ties become well-defined at 1e-6
            # and resolve by centroid order on BOTH engines, so a SQL
            # twin replays identical cell assignments despite BLAS
            # vs sequential-fold summation differing in the last ulp
            if metric == "cosine":
                vn = np.linalg.norm(V, axis=1)
                vn[vn == 0.0] = 1.0
                scores = np.round((V @ C.T) / (vn[:, None] * Cn[None, :]), 6)
            else:
                scores = -np.round(
                    (V * V).sum(axis=1)[:, None]
                    - 2.0 * (V @ C.T)
                    + Cn2[None, :],
                    6,
                )
            if n_probe == 1:
                picked = scores.argmax(axis=1)[:, None]
            else:
                # stable partial sort → deterministic lowest-index ties
                picked = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe]
            ids = np.repeat(pdf[id_col].to_numpy(), picked.shape[1])
            vecs = np.repeat(pdf[vec_col].to_numpy(), picked.shape[1])
            yield pd.DataFrame(
                {id_col: ids, vec_col: vecs, "_cell": cells[picked].ravel()}
            )

    return vectors.mapInPandas(assign, schema=out_schema)


def train_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iterations: int = 3,
    metric: str = "cosine",
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means for the IVF index: assign (numpy-batched, full
    scan) → recompute per-cell mean vectors (posexplode + grouped avg —
    one distributed agg per round; only the n_cells×dim means, the
    'model', ever reach the driver). Deterministic: lowest-id seeds +
    stable argmax ties. Empty cells keep their previous centroid.
    ``metric`` must match how the downstream index assigns cells:
    ``"cosine"`` for `ivf_topk`, ``"l2"`` for `ivf_pq_index`."""
    c = searchable(corpus, vec_col).select(
        F.col(id_col).cast("long").alias("cid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # over-collect seeds, then keep only rows matching the FIRST
    # (lowest-id) seed's dimension: the model dim is defined by that
    # deterministic anchor, and a deviant-dim row in the seed window
    # must not crash the centroid stack (ragged-encoder contract)
    # (cid, _v) order, not cid alone: a TOTAL order, so a replayed id
    # in the seed window cannot make WHICH copy seeds a centroid
    # partition-dependent (takeOrdered breaks ties by partition order —
    # dirty-keys audit; a no-op on unique ids, and the comparator
    # short-circuits on cid)
    seed_rows = [
        (r["cid"], list(r["_v"]))
        for r in c.orderBy("cid", "_v").limit(4 * n_cells).collect()
    ]
    if not seed_rows:
        raise ValueError(
            "train_centroids: corpus is empty (0 rows) — cannot seed "
            "any cells; check the upstream vector filters"
        )
    d0 = _dominant_dim(v for _, v in seed_rows)
    crows = [(i, v) for i, v in seed_rows if len(v) == d0][:n_cells]
    # re-key cells to dense 0..n_cells-1 so means map back positionally
    crows = [(i, v) for i, (_, v) in enumerate(crows)]
    for _ in range(iterations):
        assigned = ivf_assign_numpy(c, crows, id_col="cid", n_probe=1, metric=metric)
        means = (
            assigned.select("_cell", F.posexplode("_v").alias("_d", "_x"))
            .groupBy("_cell", "_d")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["_cell"], {})[r["_d"]] = r["_m"]
        crows = [
            (
                cell,
                [by_cell[cell][d] for d in range(len(vec))]
                if cell in by_cell
                else vec,
            )
            for cell, vec in crows
        ]
    return crows


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Index: the ``n_cells`` lowest-id corpus vectors serve as
    deterministic centroids (a k-means-free IVF — swap in trained
    centroids without touching the plan); every corpus vector is
    assigned to its single nearest cell. Search: each query probes its
    ``n_probe`` nearest cells and reranks exactly within them. The
    candidate join is an equi-join on ``_cell``, so work scales with
    corpus/n_cells per query, not with the full corpus."""
    # key_unique: cell assignment is one-cell-PER-ID — a replayed id
    # with two payloads would get two cells and a partition-dependent
    # dropDuplicates pick downstream (dirty-keys fuzz)
    c = key_unique(
        searchable(corpus, vec_col).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        "neighbor_id",
        ["_v"],
    )
    centroid_df = (
        c.orderBy("neighbor_id")
        .limit(n_cells)
        .select(F.col("neighbor_id").alias("_cell"), F.col("_v").alias("_cv"))
    )
    q = key_unique(
        searchable(queries, vec_col).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        ),
        "query_id",
        ["_qv"],
    )
    try:
        import numpy  # noqa: F401

        # centroid table is the bounded 'model' side (n_cells rows) —
        # collecting it is the same data movement as broadcasting it.
        # Pass `centroids` (e.g. from `train_centroids`) to swap the
        # lowest-id seeds for a trained codebook without a plan change.
        if centroids:
            crows = centroids
        else:
            # over-collect, anchor the model dim on the lowest-id seed,
            # drop deviant-dim rows (ragged-encoder contract — a bad
            # seed must not crash the centroid stack), keep n_cells
            seed = [
                (r["neighbor_id"], list(r["_v"]))
                for r in c.orderBy("neighbor_id").limit(4 * n_cells).collect()
            ]
            d0 = _dominant_dim(v for _, v in seed) if seed else 0
            crows = [(i, v) for i, v in seed if len(v) == d0][:n_cells]
        if not crows:
            # an IVF index over an empty corpus has no cells; searching
            # it finds nothing — return the contract schema empty
            # instead of crashing the cell-assignment GEMM. Id types
            # derive from the inputs (empty path == normal path schema).
            return corpus.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(
                            "query_id", queries.schema[id_col].dataType
                        ),
                        T.StructField(
                            "neighbor_id", corpus.schema[id_col].dataType
                        ),
                        T.StructField("cosine_sim", T.DoubleType()),
                        T.StructField("rank", T.IntegerType()),
                    ]
                ),
            )
        cells = ivf_assign_numpy(c, crows, id_col="neighbor_id", n_probe=1)
        probes = ivf_assign_numpy(
            q, crows, id_col="query_id", vec_col="_qv", n_probe=n_probe
        )
    except ImportError:  # pragma: no cover - numpy is in the container
        bcast = F.broadcast(centroid_df)
        cells = ivf_assign(c, bcast, id_col="neighbor_id", n_probe=1)
        probes = ivf_assign(
            q, bcast, id_col="query_id", vec_col="_qv", n_probe=n_probe
        )
    cand = (
        cells.join(probes, "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_v")), 6).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    k: int = 10,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with ``n_tables``
    independent sign-signatures; candidates = corpus vectors sharing a
    (table, signature) bucket with the query, then exact cosine rerank
    within candidates. The candidate join is an equi-join on the bucket —
    no cross product, which is the 100 TB survival property."""
    corpus = searchable(corpus, vec_col)
    queries = searchable(queries, vec_col)

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        # independent tables = disjoint plane index ranges
        cols = []
        for tbl in range(n_tables):
            sig = F.lit(0).cast("long")
            for p in range(n_planes):
                plane = tbl * n_planes + p
                coeffs = [_det_plane_component(plane, d) for d in range(dim)]
                proj = F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(c)) for c in coeffs]),
                        lambda x, w: x * w,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                sig = sig.bitwiseOR(
                    F.when(
                        proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)
                    ).otherwise(F.lit(0).cast("long"))
                )
            cols.append(sig)
        # norm once per input row, carried through the bucket explode
        return df.select(
            F.col(id_col).alias(idc),
            F.col(vec_col).alias(f"_{idc}_v"),
            l2_norm(F.col(vec_col)).alias(f"_{idc}_n"),
            F.posexplode(F.array(*cols)).alias("_tbl", "_sig"),
        )

    def with_buckets_numpy(df: DataFrame, idc: str) -> DataFrame:
        # all n_tables*n_planes projections as ONE matrix multiply per
        # Arrow batch — replaces 32 interpreted per-element folds/row
        import numpy as np

        P = np.array(
            [
                [_det_plane_component(tbl * n_planes + p, d) for d in range(dim)]
                for tbl in range(n_tables)
                for p in range(n_planes)
            ],
            dtype=np.float64,
        )
        powers = np.array([1 << p for p in range(n_planes)], dtype=np.int64)
        schema = T.StructType(
            [
                T.StructField(idc, T.LongType()),
                T.StructField(f"_{idc}_v", T.ArrayType(T.DoubleType())),
                T.StructField(f"_{idc}_n", T.DoubleType()),
                T.StructField("_tbl", T.IntegerType()),
                T.StructField("_sig", T.LongType()),
            ]
        )

        def fn(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf):
                    # plane dim rules: deviant-dim vectors can't hash
                    pdf = rows_of_dim(pdf, vec_col, P.shape[1])
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                bits = (V @ P.T >= 0).astype(np.int64)  # (b, T*p)
                sigs = (
                    bits.reshape(len(pdf), n_tables, n_planes) * powers
                ).sum(axis=2)  # (b, T)
                norms = np.linalg.norm(V, axis=1)
                yield pd.DataFrame(
                    {
                        idc: np.repeat(pdf[id_col].to_numpy(), n_tables),
                        f"_{idc}_v": np.repeat(pdf[vec_col].to_numpy(), n_tables),
                        f"_{idc}_n": np.repeat(norms, n_tables),
                        "_tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(pdf)),
                        "_sig": sigs.ravel(),
                    }
                )

        return df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        ).mapInPandas(fn, schema=schema)

    try:
        import numpy  # noqa: F401

        bucketize = with_buckets_numpy
    except ImportError:  # pragma: no cover - numpy is in the container
        bucketize = with_buckets

    cb = bucketize(corpus, "neighbor_id")
    qb = bucketize(queries, "query_id")
    cand = (
        cb.join(qb, ["_tbl", "_sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_query_id_v"), F.col("_neighbor_id_v"))
                / (F.col("_query_id_n") * F.col("_neighbor_id_n")),
                6,
            ).alias("cosine_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def int8_quantize_stats(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization audit: q_i =
    round(v_i * 127 / max|v|) ∈ [-127, 127] (the storage format that
    cuts an embedding corpus 4× vs float32 / 8× vs float64), reported as
    driver-hashable scalars — the exact integer norm of the code vector,
    the saturation count, and the reconstruction cosine between the raw
    vector and its codes (scale cancels in cosine, so no division by the
    per-vector scale enters the comparison).

    Engine-portable by construction: the codes are integers from one
    round() (half-away-from-zero in both Spark and DuckDB), q_norm2 and
    n_sat are exact integer folds, and recon_cos is rounded to the 1e-6
    grid. Pure column algebra over the array — scan-speed, no shuffle,
    no Python.

    Expression-shape note (measured 40×): a column expression referenced
    inside a higher-order-function lambda is INLINED per element — a
    naive ``transform(v, x -> round(x*127/array_max(...)))`` re-derives
    the O(d) max for every element and every output column (O(d²) × 4
    interpreted evals per row, ~1.9 s for 5k×64d). Binding the max as a
    ``zip_with`` ARGUMENT via array_repeat evaluates it once per row,
    and a single struct-accumulator fold derives all four statistics in
    one pass over (value, code) pairs.
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30)
    )
    # codes: amax enters as a zip_with argument (array_repeat evaluates
    # it ONCE), never as a lambda-captured expression
    q = F.zip_with(
        v,
        F.array_repeat(amax, F.size(v)),
        lambda x, m: F.round(x * F.lit(127.0) / m, 0),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("qn2"),
        F.lit(0).cast("long").alias("nsat"),
        F.lit(0.0).alias("dvq"),
        F.lit(0.0).alias("vn2"),
        F.lit(0.0).alias("qn2d"),
    )
    stats = F.aggregate(
        F.zip_with(v, q, lambda x, c: F.struct(x.alias("x"), c.alias("c"))),
        zero,
        lambda a, e: F.struct(
            (a["qn2"] + (e["c"] * e["c"]).cast("long")).alias("qn2"),
            (
                a["nsat"]
                + F.when(F.abs(e["c"]) >= 127.0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("nsat"),
            (a["dvq"] + e["x"] * e["c"]).alias("dvq"),
            (a["vn2"] + e["x"] * e["x"]).alias("vn2"),
            (a["qn2d"] + e["c"] * e["c"]).alias("qn2d"),
        ),
    )
    # audit contract, non-finite leg: a vector with a NaN/Inf component
    # has no int8 code (round(NaN*127/amax) ANSI-crashes the long cast)
    # — the row STAYS in the audit with NULL stats, flagging the broken
    # encoder instead of crashing the scan or silently dropping it. The
    # CASE gate is evaluated per-row BEFORE the fold, so the crashing
    # cast never runs (oracle twin gates each output the same way).
    finite = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    ) < F.lit(float("inf"))
    stats = F.when(finite, stats)
    return df.select(F.col(id_col), stats.alias("_s")).select(
        id_col,
        F.col("_s.qn2").alias("q_norm2"),
        F.col("_s.nsat").alias("n_saturated"),
        # audit contract: every vector keeps its row; a zero-norm
        # vector has no defined reconstruction cosine -> NULL (an
        # unguarded 0/0 ANSI-crashes; DuckDB's x/0 is NULL already)
        F.when(
            F.col("_s.vn2") * F.col("_s.qn2d") != 0.0,
            F.round(
                F.col("_s.dvq")
                / (F.sqrt(F.col("_s.vn2")) * F.sqrt(F.col("_s.qn2d"))),
                6,
            ),
        ).alias("recon_cos"),
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every query
    vector, the top-k most-similar corpus vectors carrying a DIFFERENT
    label — the closest non-matches, which are exactly the negatives a
    contrastive/embedding trainer wants in each batch.

    Same scale shape as ``brute_force_topk`` (broadcast query side,
    per-row norms, deterministic window cut); the label inequality is
    applied with the pair predicate so no same-label pair survives to
    the ranking. Output: (query_id, query_label, neighbor_id,
    neighbor_label, cosine_sim, rank).
    """
    corpus = searchable(corpus, vec_col)
    queries = searchable(queries, vec_col)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        ).withColumn("_qn", l2_norm(F.col("_qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    scored = (
        c.crossJoin(q)
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("query_label") != F.col("neighbor_label"))
        )
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.round(
                dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_label_vote(
    labeled: DataFrame,
    unlabeled: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    searcher=None,
) -> DataFrame:
    """kNN label propagation: classify each unlabeled vector by the
    majority label of its k nearest labeled neighbors (cosine), ties
    broken toward the smallest label — the cheap semi-supervised
    labeling pass (auto-tagging an unlabeled corpus slice from a
    labeled seed set).

    ``searcher`` is any (corpus, queries, id_col=, vec_col=, k=) ->
    (query_id, neighbor_id, cosine_sim, rank) callable — defaults to
    ``brute_force_topk`` (the exact JVM primitive); pass ``gemm_topk``
    when the query set is large (hundreds+ — one BLAS GEMM per Arrow
    batch beats the interpreted fold ~10× there) or the LSH/IVF
    searchers for the 100 TB path. The vote logic is identical: one
    neighbor→label join and a per-query majority window. Output:
    (vec_id, pred_label, n_votes, vote_frac).
    """
    # key_unique on BOTH inputs: the vote's label join-back fans out
    # under a replayed neighbor id (each top-k row would pick up every
    # copy's label — doubled votes, dirty-keys fuzz), and duplicate
    # QUERY ids would merge two observations' candidate lists into one
    # top-k window. Applied after the searchable boundary so the
    # payload order never compares non-finite components.
    labeled = key_unique(
        searchable(labeled, vec_col).select(id_col, vec_col, label_col),
        id_col,
        [vec_col, label_col],
    )
    unlabeled = key_unique(
        searchable(unlabeled, vec_col).select(id_col, vec_col),
        id_col,
        [vec_col],
    )
    nn = (searcher or brute_force_topk)(
        labeled,
        unlabeled,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
    )
    votes = (
        nn.join(
            labeled.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(label_col).alias("_lbl"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "_lbl")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("_lbl")
    )
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            F.col("query_id").alias(id_col),
            F.col("_lbl").alias("pred_label"),
            "n_votes",
            F.round(F.col("n_votes") / F.lit(float(k)), 6).alias("vote_frac"),
        )
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
) -> DataFrame:
    """ANN quality evaluation: per-query recall of an approximate top-k
    result against the exact top-k ground truth (both frames carry
    (query_id, neighbor_id) rows). The eval harness every ANN rollout
    gates on — run it on a sampled query set, not the full corpus.

    Scale shape: both inputs are query-set-sized (k rows per sampled
    query), so the hit join and per-query counts are trivially small;
    the expensive parts are the searchers that PRODUCE the inputs.
    """
    pair = ["query_id", "neighbor_id"]
    hits = (
        exact.select(*pair)
        .join(approx.select(*pair), pair)
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    totals = exact.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (
        totals.join(hits, "query_id", "left")
        .na.fill(0, ["n_hits"])
        .select(
            "query_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round(F.col("n_hits") / F.col("n_exact"), 6).alias("recall"),
        )
    )


def pseudo_embedding(fingerprint: Column, *, dim: int = 8) -> Column:
    """Deterministic pseudo-embedding from an integer fingerprint: the
    j-th component is the multiplicative-mix hash of (fingerprint,
    2j+1), scaled to [-0.5, 0.5). A stand-in for a real encoder with
    the same Spark-side contract (array<double> column, scan-side, no
    Python) and fully portable 64-bit integer arithmetic, so any SQL
    engine replays the identical vectors — the text twin of the
    multimodal fake-feature kernel.

    Overflow discipline: each step pre-reduces mod 2^31 before the
    Knuth multiply, keeping every product under 2^63 (ANSI-safe).
    """
    comps = []
    for j in range(dim):
        a = fingerprint.cast("long") % 2147483648
        b = (a * F.lit(2 * j + 1)) % 2147483648
        c = (b * F.lit(2654435761)) % 4294967296
        comps.append(c.cast("double") / F.lit(4294967296.0) - F.lit(0.5))
    return F.array(*comps)


def mmr_diversify(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    mu: float = 0.3,
    state_partitions: int | None = None,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified rerank (Carbonell &
    Goldstein 1998): from each query's top-``pool`` exact-cosine
    candidates, greedily select ``k`` results maximizing
    ``lam * rel(q, c) - mu * max_{s in selected} sim(c, s)`` — the
    standard serving-side answer to "my top-10 are ten near-duplicates".

    Scale shape: the EXPENSIVE step is producing the candidate pool
    (brute force here; LSH/IVF/PQ at corpus scale — any searcher that
    emits (query_id, neighbor_id, cosine_sim) slots in). Everything
    after is bounded by pool × pool per query: one pairwise-sim join on
    the pool (pool² rows/query), then k-1 bounded selection rounds,
    each a hash join + per-query row_number window on ≤pool rows.
    Nothing iterates over the corpus; the loop is driver-side plan
    construction only (no collect).

    Portability: rel and pairwise sims are rounded to 6 decimals before
    the score arithmetic, and ``lam``/``mu`` are passed as independent
    literals (``1 - 0.7`` is not ``0.3`` in binary floating point) —
    both engines then evaluate bit-identical doubles, so the greedy
    argmax (ties broken by neighbor id) is engine-exact and the DuckDB
    twin replays the identical selection sequence.

    SIDE EFFECT: unlike the rest of the operator surface this call
    EXECUTES jobs eagerly (the candidate pool and pairwise sims are
    localCheckpoint-ed — see the inline rationale); localCheckpoint
    state does not survive executor loss, so a long-lived production
    run should swap in reliable checkpointing. ``state_partitions``
    sizes the checkpointed state (default: ~1 task per 64 queries,
    min 1) — the per-round frames are queries x pool(^2) rows, so one
    task per few thousand rows keeps rounds single-stage without
    serializing a large query set through one task.
    """
    corpus = searchable(corpus, vec_col)
    queries = searchable(queries, vec_col)
    # localCheckpoint the pool: the k-1 selection rounds each reference
    # rel (directly and through pw), and Spark re-evaluates shared
    # subtrees per reference — without the cut the corpus-scale first
    # pass re-runs O(k) times (measured 11.5 s -> ~1 s at sf0.1). The
    # checkpointed frame is model-sized (queries x pool rows), so this
    # is the same bounded-state discipline as the sugar-chain cache.
    if state_partitions is None:
        # model-sized state: ~64 queries' pool rows per task; the
        # count() runs on the (small by contract) query frame only
        state_partitions = max(1, queries.count() // 64)
    rel = (
        brute_force_topk(corpus, queries, id_col=id_col, vec_col=vec_col, k=pool)
        .select("query_id", "neighbor_id", "cosine_sim")
        # repartition, NOT coalesce: coalesce(1) would collapse the
        # corpus-scale first pass itself into one task (measured 4.2 s
        # vs 0.4 s); the exchange is queries x pool rows
        .repartition(state_partitions)
        .localCheckpoint(eager=True)
    )

    vecs = corpus.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_n", l2_norm(F.col("_v")))
    pv = rel.join(vecs, rel.neighbor_id == vecs._vid).select(
        "query_id", "neighbor_id", "cosine_sim", "_v", "_n"
    )
    a = pv.select(
        "query_id",
        F.col("neighbor_id").alias("a_id"),
        F.col("_v").alias("_av"),
        F.col("_n").alias("_an"),
    )
    b = pv.select(
        "query_id",
        F.col("neighbor_id").alias("b_id"),
        F.col("_v").alias("_bv"),
        F.col("_n").alias("_bn"),
    )
    pw = (
        a.join(b, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "query_id",
            "a_id",
            "b_id",
            F.round(
                dot(F.col("_av"), F.col("_bv")) / (F.col("_an") * F.col("_bn")),
                6,
            ).alias("sim"),
        )
        # same cut as rel: pw is referenced by every selection round and
        # its build joins back to the corpus — bounded queries x pool^2
        # rows once checkpointed; few-partition (state_partitions) so
        # downstream rounds run a handful of tasks instead of 32
        # near-empty partitions
        .repartition(state_partitions)
        .localCheckpoint(eager=True)
    )

    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    selected = (
        rel.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select("query_id", "neighbor_id", "cosine_sim", F.lit(1).alias("pick"))
    )
    for step in range(2, k + 1):
        remaining = rel.join(
            selected.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
        msim = (
            pw.join(
                selected.select(
                    F.col("query_id").alias("_sq"),
                    F.col("neighbor_id").alias("_sid"),
                ),
                (pw.query_id == F.col("_sq")) & (pw.b_id == F.col("_sid")),
            )
            .groupBy("query_id", "a_id")
            .agg(F.max("sim").alias("_msim"))
            # break lineage-shared attribute ids before joining back to a
            # frame derived from the same pool: without the rename Spark
            # resolves remaining.query_id == msim.query_id to the SAME
            # attribute (trivially-true predicate) and the join degrades
            # to neighbor-id-only, leaking msim rows across queries
            .select(
                F.col("query_id").alias("_mq"),
                F.col("a_id").alias("_mid"),
                "_msim",
            )
        )
        scored = remaining.join(
            msim,
            (F.col("query_id") == F.col("_mq"))
            & (F.col("neighbor_id") == F.col("_mid")),
        ).select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            (
                F.lit(lam) * F.col("cosine_sim") - F.lit(mu) * F.col("_msim")
            ).alias("_score"),
        )
        ws = Window.partitionBy("query_id").orderBy(
            F.desc("_score"), F.asc("neighbor_id")
        )
        nxt = (
            scored.withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id", "neighbor_id", "cosine_sim",
                F.lit(step).alias("pick"),
            )
        )
        selected = selected.unionByName(nxt)
        if step < k:
            # each round references the previous selected THREE times
            # (anti-join, msim join, union) — without a cut the plan
            # re-evaluates 3^k subtrees (measured 3.9 s of re-run tiny
            # windows at k=5). selected is <= queries x k rows.
            selected = selected.repartition(1).localCheckpoint(eager=True)
    return selected


def rocchio_expand_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    feedback: int = 5,
    beta: float = 0.5,
    quant: int = 1_000_000,
) -> DataFrame:
    """Rocchio pseudo-relevance feedback: expand each query vector with
    the centroid of its top-``feedback`` first-pass neighbors
    (q' = q + beta * centroid), then re-search — the classic
    recall-boosting second pass when the corpus phrases a concept
    differently than the query.

    Determinism discipline: centroid components come from EXACT integer
    sums of quantized components (round(x * quant)), so the per-dim
    mean is a pure function of the feedback set — no float summation
    order across engines or partitions; q' is then one fixed-shape
    double expression both engines evaluate bit-identically, and the
    re-search reuses the rounded-cosine / id tie-break contract.

    Scale shape: the first pass is any searcher (brute force here;
    LSH/IVF/PQ at corpus scale). The feedback join explodes only the
    feedback rows (feedback × dim per query), the centroid agg runs on
    the bounded (query, dim) grain, and the expanded queries broadcast
    back over the corpus for the second pass.
    """
    # shared boundary: the second-pass scan divides by corpus norms
    # inline, so zero-norm/NULL vectors must not reach it. The exact-
    # centroid discipline additionally REQUIRES integer quantization,
    # so a vector with a component beyond 9e18/quant (fp32-max garbage
    # is finite and searchable but round(x*quant) overflows the long)
    # is outside this operator's domain — excluded on both engines.
    comp_bound = 9.0e18 / quant

    def quantizable(df: DataFrame) -> DataFrame:
        return df.filter(
            F.array_max(
                F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
            )
            <= F.lit(comp_bound)
        )

    corpus = quantizable(searchable(corpus, vec_col))
    queries = quantizable(searchable(queries, vec_col))
    first = brute_force_topk(
        corpus, queries, id_col=id_col, vec_col=vec_col, k=feedback
    ).select("query_id", "neighbor_id")

    # join FIRST, explode AFTER (guide §3.3): the feedback set is
    # queries × feedback rows, so broadcasting it onto the corpus scan
    # picks out just the feedback vectors map-side, and only those
    # explode into (query, dim) components. The previous form exploded
    # the FULL corpus (|corpus| × dim rows) and joined that to the
    # tiny feedback set — at sf0.1 the planner even chose to broadcast
    # the exploded corpus, a shape that cannot survive corpus scale.
    # Row-identical: join-then-explode == explode-then-join on the
    # same equi-key, including under replayed corpus ids.
    fbv = F.broadcast(first).join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_fv"),
        ),
        "neighbor_id",
    )
    cent = (
        fbv.select(
            "query_id",
            F.posexplode(
                F.transform(
                    F.col("_fv"),
                    lambda x: F.round(x.cast("double") * quant).cast("long"),
                )
            ).alias("_dim", "_q"),
        )
        .groupBy("query_id", "_dim")
        .agg(F.sum("_q").alias("_s"))
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_dim", "_s"))),
                lambda s: s["_s"],
            ).alias("_cent")
        )
    )
    qd = float(quant)
    fb = float(feedback)
    expanded = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * quant).cast("long"),
            ).alias("_qq"),
        )
        .join(cent, "query_id")
        .select(
            "query_id",
            F.zip_with(
                F.col("_qq"),
                F.col("_cent"),
                lambda a, b: a.cast("double") / qd
                + F.lit(beta) * (b.cast("double") / fb / qd),
            ).alias("_ev"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    scored = (
        c.crossJoin(F.broadcast(expanded.withColumn("_en", l2_norm(F.col("_ev")))))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_ev"), F.col("_cv")) / (F.col("_en") * F.col("_cn")),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
