"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:

- Exact dedup is a hash-groupBy (one shuffle on the hash key; map-side
  combine makes it bandwidth-bound, not memory-bound).
- Near-dup never materializes the O(n²) pair space: candidate pairs come
  from equi-joins on shingles (Jaccard) or LSH band buckets (MinHash),
  i.e. only pairs that share a key ever meet in a shuffle.
- All hashing is Spark-side (`xxhash64`/`hash`) — JVM, codegen'd,
  deterministic across runs and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, *, key_cols: list[str], id_col: str, canonical: str = "min"
) -> DataFrame:
    """Exact dedup: group rows by ``key_cols``, keep the canonical id per
    group plus the duplicate count. groupBy(hash) not dropDuplicates so
    the dup-count survives (dropDuplicates discards it)."""
    agg = F.min(id_col) if canonical == "min" else F.max(id_col)
    return df.groupBy(*key_cols).agg(
        agg.alias(f"canonical_{id_col}"), F.count("*").alias("n_copies")
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Word n-gram shingles as an array column (distinct not applied).
    Empty array for texts shorter than n words.

    Built with ``zip_with`` over row-level slices rather than a
    ``transform`` whose lambda references the token array: a captured
    outer expression is re-evaluated PER ELEMENT by higher-order
    functions, which turns the tokenize into O(tokens^2) regex splits
    per row (same fix as ``text.repeated_ngram_ratio``; measured ~15x
    on the shingle explode at sf0.1). ``slice`` evaluates the token
    array once per row; the zip lambda binds only element arguments.

    Tokenization is the shared filtered form (whitespace runs, no empty
    tokens): ``F.trim`` strips only SPACES, so a tab/newline-only
    document would otherwise tokenize to ['',''] and emit a phantom
    bigram — the round-8 fuzz audit caught exactly that in the bigram
    LM and every shingle family built on this function."""
    from procoggraph_spark.operators.text import tokens

    ws = tokens(text)
    k = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    grams = F.slice(ws, 1, k)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(ws, 1 + j, k), lambda a, b: F.concat_ws(" ", a, b)
        )
    return grams


def char_shingles(text: Column, k: int = 5) -> Column:
    """Character k-shingles as an array column."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - k + 1, F.lit(1))),
        lambda i: F.substring(text, 1, 1 << 30).substr(i, F.lit(k)),
    )


def _exploded_shingles(
    df: DataFrame, *, id_col: str, text_col: str, n: int, sets: bool = False
) -> DataFrame:
    """One (_id, _sh) row per shingle of each document.

    ``sets=False`` (the cheap path): distinct WITHIN each row only
    (``array_distinct`` before the explode — map-only, no shuffle).
    Correct whenever the consumer is multiplicity-insensitive (minhash
    takes MIN over the hashes: min over a multiset equals min over the
    set) OR ids are unique.

    ``sets=True``: globally distinct on (_id, _sh) — the shingle SET of
    a doc_id is the union over all its rows, so replayed doc_ids
    (dirty-keys fuzz) contribute each shingle once. Required by every
    COUNT-consumer (set sizes, intersections, document frequencies):
    the within-row shortcut over-counts exactly at duplicate ids, and
    |A∩B| with multiplicity can exceed min(|A|,|B|). Costs one exchange
    on (_id, _sh); the partial aggregate dedups map-side."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("_sh"),
    )
    return sh.distinct() if sets else sh


def _guarded_shingles(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """Distinct-shingle explode with the hot-shingle df guard applied:
    shingles above the document-frequency cap are dropped via a
    broadcast anti-join (the hot set is tiny by construction) before
    any pair generation. Shared by the symmetric (Jaccard) and
    asymmetric (containment) pair generators so the retained-universe
    semantics — and the plan shape — stay identical."""
    sh = _exploded_shingles(df, id_col=id_col, text_col=text_col, n=n, sets=True)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("_sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("_sh")
        )
        sh = sh.join(F.broadcast(hot), "_sh", "left_anti")
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity ≥ threshold.

    Plan: explode distinct shingles → self equi-join on shingle (only
    co-shingled pairs shuffle) → per-pair intersection count → join the
    per-doc distinct-shingle counts → |A∩B| / (|A|+|B|-|A∩B|).
    Output: (id_a, id_b, jaccard) with id_a < id_b.

    ``max_shingle_df``: the hot-shingle guard (the Jaccard analog of
    minhash_lsh_pairs' max_bucket_size). The self-join is quadratic in
    per-shingle document frequency — at corpus scale one boilerplate
    bigram ("of the") co-shingles millions of docs and a single join key
    explodes O(df²). Shingles with document frequency above the cap are
    dropped BEFORE the join and excluded from the per-doc sizes, so the
    similarity is exact Jaccard over the retained (informative) shingle
    universe — the standard stopword-shingle treatment; such shingles
    carry ~zero IDF signal anyway. None = no cap (exact full-universe
    Jaccard; only safe when df is known to be bounded).
    """
    sh = _guarded_shingles(
        df, id_col=id_col, text_col=text_col, n=n, max_shingle_df=max_shingle_df
    )
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))

    a = sh.select(F.col("_id").alias("id_a"), "_sh")
    b = sh.select(F.col("_id").alias("id_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 64,
    portable: bool = False,
) -> DataFrame:
    """MinHash signatures: for hash function i, min over shingles of
    xxhash64(shingle, seed=i). One explode + one groupBy — the standard
    shuffle-light formulation (signature never holds the shingle set).

    ``portable=True`` swaps xxhash64 for the repo's portable-arithmetic
    discipline (positional shingle fingerprint + the CMS affine mixers
    as the i-th permutation, all plain int64 ops), so a DuckDB oracle
    rebuilds the identical signatures — the same trick the portable
    SimHash twin uses. Default stays xxhash64 (better mixing,
    JVM-hashed).

    Output: (id, sig: array<long> of length num_hashes).
    """
    sh = _exploded_shingles(df, id_col=id_col, text_col=text_col, n=n)
    if portable:
        from procoggraph_spark.operators.sketches import (
            _ADD_STEP,
            _MOD,
            _MULT_BASE,
            _MULT_STEP,
        )
        from procoggraph_spark.operators.text import positional_fingerprint

        fp = positional_fingerprint(F.col("_sh"))
        mins = [
            F.min(
                (fp * F.lit(_MULT_BASE + i * _MULT_STEP) + F.lit(i * _ADD_STEP))
                % F.lit(_MOD)
            ).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    sig = sh.groupBy("_id").agg(*mins)
    return sig.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``rows_per_band`` values, bucket-join on (band, band-hash). A pair is
    a candidate iff it collides in ≥1 band. Output: (id_a, id_b,
    n_bands_matched). Estimated Jaccard can then be computed by comparing
    full signatures (`minhash_estimate`)."""
    b = signatures.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("sig")[i * rows_per_band + r] for r in range(rows_per_band)]
                    )
                    for i in range(bands)
                ]
            )
        ).alias("_band", "_bh"),
    )
    left = b.select(F.col("_id").alias("id_a"), "_band", "_bh")
    right = b.select(F.col("_id").alias("id_b"), "_band", "_bh")
    return (
        left.join(right, ["_band", "_bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands_matched"))
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
    portable_bands: bool = False,
) -> DataFrame:
    """Fused LSH banding + Jaccard estimate in a single pass: the band
    explode carries the full signature, so the band equi-join yields both
    ids AND both signatures and the estimate needs no join back to the
    signature table. One shuffle on (band, band-hash) + one pair groupBy —
    the same shape MLlib's MinHashLSH approxSimilarityJoin uses (hash
    tables exploded with the feature vector alongside).

    Trade-off vs `minhash_lsh_candidates` + `minhash_estimate`: shuffle
    rows are ``bands``× wider (they carry the sig array), but three
    recomputations/joins of the signature subplan disappear. With 64-hash
    sigs (512 B) the carried payload stays far below the text it
    summarizes, so this is also the scale-preferred plan.

    ``max_bucket_size``: suppress band buckets holding more than this
    many documents before the self-join. A bucket with thousands of
    members is boilerplate/template text, not near-dup signal, and its
    self-join contributes O(bucket²) pairs — the standard hot-bucket
    guard every at-scale LSH dedup ships. Pairs that are genuine
    near-dups still collide in their other, selective bands.

    ``portable_bands=True`` keys band buckets on the exact concatenated
    band values (a string) instead of xxhash64 of them: collision-free,
    so two docs share a bucket IFF the band slices are value-equal —
    what a SQL twin computes by slice comparison. Shuffle keys are a
    few bytes wider; semantics otherwise identical (xxhash64 equality
    already implies value equality up to negligible hash collisions).

    Output: (id_a, id_b, n_bands_matched, est_jaccard).
    """
    if portable_bands:
        band_keys = [
            F.concat_ws(
                "|",
                *[
                    F.col("sig")[i * rows_per_band + r].cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for i in range(bands)
        ]
    else:
        band_keys = [
            F.xxhash64(
                *[F.col("sig")[i * rows_per_band + r] for r in range(rows_per_band)]
            )
            for i in range(bands)
        ]
    b = signatures.select(
        F.col(id_col).alias("_id"),
        F.col("sig"),
        F.posexplode(F.array(*band_keys)).alias("_band", "_bh"),
    )
    if max_bucket_size is not None:
        hot = (
            b.groupBy("_band", "_bh")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > max_bucket_size)
            .select("_band", "_bh")
        )
        b = b.join(hot, ["_band", "_bh"], "left_anti")
    left = b.select(F.col("_id").alias("id_a"), F.col("sig").alias("_sa"), "_band", "_bh")
    right = b.select(F.col("_id").alias("id_b"), F.col("sig").alias("_sb"), "_band", "_bh")
    agree = F.size(
        F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda m: m)
    )
    return (
        left.join(right, ["_band", "_bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_bands_matched"),
            F.first(agree).alias("_agree"),
            F.first(F.size("_sa")).alias("_nsig"),
        )
        .withColumn("est_jaccard", F.round(F.col("_agree") / F.col("_nsig"), 6))
        .drop("_agree", "_nsig")
    )


def minhash_estimate(
    candidates: DataFrame, signatures: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Attach the signature-agreement Jaccard estimate to candidate pairs."""
    sa = signatures.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa"))
    sb = signatures.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb"))
    agree = F.size(
        F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda m: m)
    )
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(agree / F.size(F.col("_sa")), 6))
        .drop("_sa", "_sb")
    )


def simhash(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash: sign-sum of per-token hash bits → one 64-bit fingerprint
    per document. Near-dups are pairs within small Hamming distance.

    Pure column algebra, explode-free: each row folds its OWN token
    array into a ``bits``-long vote-sum vector at scan speed (token
    hash let-bound so the per-token fingerprint evaluates once, not
    ``bits`` times — higher-order lambdas are interpreted, outside
    codegen subexpression elimination), and the id-level aggregation
    merges the per-row vectors. Integer vote sums are associative and
    order-free, so fingerprints are bit-identical to the exploded
    (token-grain) formulation — which shuffled a ``bits``-element vote
    array PER TOKEN to the id key; this shape shuffles one vector per
    row.

    ``portable=True`` swaps xxhash64 for the repo's portable-arithmetic
    discipline (positional token fingerprint + the CMS affine mixers,
    all plain int64 ops), so a DuckDB oracle can rebuild the identical
    fingerprints — the same trick operators/sketches uses. Default stays
    xxhash64 (better mixing, JVM-hashed).
    """
    # shared filtered tokenization (whitespace runs, no empty tokens):
    # an unfiltered split hashes a phantom '' token for tab/newline-only
    # documents and gives them a well-defined fingerprint the SQL twin
    # (which filters) never builds — plain explode, so a document with
    # NO tokens drops out of the fingerprint table on both engines
    from procoggraph_spark.operators.text import let as _let
    from procoggraph_spark.operators.text import tokens as _tokens

    if portable:
        from procoggraph_spark.operators.sketches import (
            _ADD_STEP,
            _MOD,
            _MULT_BASE,
            _MULT_STEP,
        )
        from procoggraph_spark.operators.text import positional_fingerprint

        def vote_arr(tok: Column) -> Column:
            return _let(
                positional_fingerprint(tok),
                lambda h: F.array(
                    *[
                        F.when(
                            (
                                h * F.lit(_MULT_BASE + i * _MULT_STEP)
                                + F.lit(i * _ADD_STEP)
                            )
                            % F.lit(_MOD)
                            < F.lit(_MOD // 2),
                            1,
                        ).otherwise(-1)
                        for i in range(bits)
                    ]
                ),
            )

    else:

        def vote_arr(tok: Column) -> Column:
            return _let(
                F.xxhash64(tok),
                lambda h: F.array(
                    *[
                        F.when(
                            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
                        ).otherwise(-1)
                        for i in range(bits)
                    ]
                ),
            )

    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    # ONE tokenize per row: the token count and the vote fold ride the
    # same let-bound array inside a single struct expression. A
    # pre-group `filter(size(tokens) > 0)` would tokenize twice — the
    # filter condition is deterministic, so Catalyst pushes it below
    # any Project that aliases the array, re-inlining the split — so
    # the token-less-row guard moves AFTER the per-doc aggregation:
    # an empty token array folds to the zero vector (the sum identity)
    # and a NULL array (NULL text) yields a NULL vote vector that
    # collect_list drops, so per-doc sums are bit-identical to the
    # filtered form; a doc appears iff it has >= 1 token on any row,
    # exactly the exploded formulation's domain.
    row_struct = _let(
        _tokens(F.col(text_col)),
        lambda tk: F.struct(
            F.greatest(F.size(tk), F.lit(0)).alias("n"),
            F.aggregate(
                tk,
                zeros,
                lambda acc, tok: F.zip_with(acc, vote_arr(tok), lambda a, b: a + b),
            ).alias("v"),
        ),
    )
    summed = (
        df.select(F.col(id_col).alias("_id"), row_struct.alias("_r"))
        .groupBy("_id")
        .agg(
            F.sum("_r.n").alias("_ntok"),
            F.aggregate(
                F.collect_list("_r.v"),
                zeros,
                lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
            ).alias("_sums"),
        )
        .filter(F.col("_ntok") > 0)
    )
    # bit i of the fingerprint = sign of sums[i]; powers precomputed as
    # literals (shiftleft needs a static shift; bit 63 is the sign bit)
    powers = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(bits)
        ]
    )
    fingerprint = F.aggregate(
        F.zip_with(
            F.col("_sums"),
            powers,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a.bitwiseOR(x),
    )
    return summed.select(F.col("_id").alias(id_col), fingerprint.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (popcount of XOR
    via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    fingerprints: DataFrame, *, id_col: str = "doc_id", max_hamming: int = 8
) -> DataFrame:
    """Candidate pairs within ``max_hamming`` bits, using the pigeonhole
    block trick: split 64 bits into (max_hamming+1) blocks — near pairs
    must agree exactly on ≥1 block, so an equi-join on (block idx, block
    value) finds all of them without O(n²)."""
    # Partition ALL 64 bits into (max_hamming+1) blocks (uneven widths ok):
    # if ≤ max_hamming bits differ, pigeonhole forces ≥1 identical block.
    nblocks = max_hamming + 1
    base, extra = divmod(64, nblocks)
    widths = [base + (1 if i < extra else 0) for i in range(nblocks)]
    offsets = [sum(widths[:i]) for i in range(nblocks)]
    blocks = F.array(
        *[
            F.shiftright(F.col("simhash"), offsets[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1).cast("long")
            )
            for i in range(nblocks)
        ]
    )
    e = fingerprints.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.posexplode(blocks).alias("_blk", "_bv"),
    )
    left = e.select(F.col("_id").alias("id_a"), F.col("simhash").alias("_fa"), "_blk", "_bv")
    right = e.select(F.col("_id").alias("id_b"), F.col("simhash").alias("_fb"), "_blk", "_bv")
    return (
        left.join(right, ["_blk", "_bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("_fa"), F.col("_fb")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Near-dup pipeline's final step: pair list → connected components
    → one canonical survivor per duplicate cluster (the min id — the
    same keep-first rule as exact dedup). Docs in no pair are their own
    canonical. Output: (id_col, canonical_id, cluster_size).

    This is how near-dup removal actually ships at scale: candidate
    pairs from LSH, then a component pass so A~B, B~C collapse to one
    cluster even when A~C was never emitted as a candidate.

    Per-cluster canonical/size come from a groupBy + join-back, NOT a
    window over the component id: a mega duplicate cluster (the thing
    this operator exists to find) would land its entire membership in
    one window partition, while the groupBy partially aggregates
    map-side and the join-back is AQE-skew-splittable. As in
    ``strip_boilerplate``, the self-join means Spark evaluates the
    assignment subplan twice (no plan-level CSE) — cheap here because
    ``connected_components`` returns an eagerly checkpointed frame, so
    only the docs-side join re-runs, not the component iteration."""
    from procoggraph_spark.graph.algorithms import connected_components

    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    comp = connected_components(edges)
    assign = docs.select(id_col).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    )
    assign = assign.withColumn(
        "component", F.coalesce("component", F.col(id_col))
    )
    stats = assign.groupBy("component").agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("cluster_size"),
    )
    return assign.join(stats, "component").select(
        id_col, "canonical_id", "cluster_size"
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Eval-set decontamination: for every corpus document, the fraction
    of its distinct word n-grams that also occur anywhere in the
    benchmark (held-out / test) corpus — the contamination check a
    training-data pipeline runs before a benchmark score means anything.

    Scale shape: the corpus side explodes once and aggregates per doc;
    the benchmark side collapses to its distinct-shingle set and is
    broadcast (eval sets are small by construction — thousands of
    documents against a 100 TB corpus), so the overlap probe is a
    map-side broadcast join on the corpus scan with no corpus-sized
    shuffle beyond the per-doc count. Documents shorter than ``n`` words
    have no shingles and drop out (nothing to contaminate).
    """
    c_sh = _exploded_shingles(corpus, id_col=id_col, text_col=text_col, n=n, sets=True)
    b_sh = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("_sh")
        )
        .distinct()
    )
    # ONE corpus pass: a LEFT broadcast probe tags each shingle with a
    # hit marker and a single per-doc aggregation counts both totals
    # and hits (count of the non-NULL marker). The former two-consumer
    # form (totals agg + inner-join agg, joined back) re-ran the
    # corpus tokenize+shingle explode twice per execution and paid an
    # extra doc-keyed join. Shingles are distinct per doc and the
    # benchmark set is distinct, so the left probe never duplicates a
    # row and count(_hit) == the inner-join count exactly.
    probe = c_sh.join(
        F.broadcast(b_sh.withColumn("_hit", F.lit(1))), "_sh", "left"
    )
    return (
        probe.groupBy("_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination_ratio"
            ),
        )
    )


def repeated_passages(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Passage-level exact-substring dedup: every ``window``-word
    passage that recurs across >= ``min_docs`` documents, with its
    cross-document count and the first document carrying it — the
    substring-granular complement to document-level dedup (catches
    shared boilerplate, licence blocks, and templated spans that
    whole-document hashing never sees; the ExactSubstr setting of
    Lee et al. 2022, re-expressed as shingle aggregation).

    Scale shape: one explode of O(tokens) passage rows (~tens of bytes
    each, the same bandwidth class as the MinHash shingle explode),
    then a single groupBy on the passage. ``array_distinct`` runs
    per-document BEFORE the explode, so each (doc, passage) pair is
    emitted once and the cross-document count is a plain
    ``count(*)`` — partial aggregation absorbs hot boilerplate
    passages map-side, with no count-distinct state and no skewed
    reduce-side set."""
    wins = _exploded_shingles(df, id_col=id_col, text_col=text_col, n=window, sets=True)
    return (
        wins.groupBy(F.col("_sh").alias("passage"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("_id").alias(f"first_{id_col}"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def semantic_cluster_dedup(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iterations: int = 2,
    threshold: float = 0.95,
    max_cell_rows: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means the
    embedding space, then compare pairs ONLY within a cluster and
    collapse groups above the cosine ``threshold`` to one canonical
    survivor per connected component (min id, the engine-wide
    keep-first rule). Output: (id_col, canonical_id, cluster_size).

    Scale shape: clustering bounds the candidate space — the pairwise
    stage groups by cell id, so work is sum over cells of |cell|^2,
    not corpus^2; ``n_cells`` is the knob that keeps cells
    executor-sized as the corpus grows (SemDeDup's own deployment used
    ~100k clusters for web scale). The per-cell comparison is a
    blocked GEMM (one BLAS call per 1024-row block against the cell
    matrix — measured 20x over the per-pair JVM dot fold at 100k x 64,
    120 s -> 6 s). The GEMM path must hold one whole cell in a Python
    worker (the cell matrix plus its Arrow/pandas copies), so cells
    above ``max_cell_rows`` — the skew case clustering cannot prevent,
    e.g. a mass of near-identical vectors collapsing into one cell —
    fall back to the spillable JVM equi-join formulation (norms
    precomputed per row, one O(dim) fold per pair): slower per pair but
    it degrades by spilling instead of OOM-killing the worker.
    Centroid training moves only the n_cells x dim model through the
    driver (`train_centroids`); the component pass is the same
    hash-min iteration every near-dup family here ends with."""
    import numpy as np
    from pyspark.sql import types as T

    from procoggraph_spark.operators.similarity import (
        ivf_assign_numpy,
        train_centroids,
    )

    # NULL embeddings carry no semantics to compare — dropped at the
    # boundary (they pass through as their own canonical upstream)
    v = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    crows = train_centroids(
        v, id_col="_id", vec_col="_v", n_cells=n_cells, iterations=iterations
    )
    assigned = ivf_assign_numpy(v, crows, id_col="_id", n_probe=1)

    pair_schema = T.StructType(
        [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
    )

    def cell_pairs(pdf):
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        pdf = pdf.sort_values("_id")  # id-asc rows -> upper triangle = id_a < id_b
        ids = pdf["_id"].to_numpy()
        V = np.stack(pdf["_v"].to_numpy())
        n = np.linalg.norm(V, axis=1)
        n[n == 0.0] = 1.0
        out_a, out_b = [], []
        for lo in range(0, len(ids), 1024):
            hi = min(lo + 1024, len(ids))
            S = (V[lo:hi] @ V.T) / np.outer(n[lo:hi], n)
            # strictly-later columns only: global upper triangle
            for r in range(hi - lo):
                cols = np.nonzero(S[r, lo + r + 1 :] >= threshold)[0]
                if len(cols):
                    out_a.append(np.full(len(cols), ids[lo + r]))
                    out_b.append(ids[lo + r + 1 + cols])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    # route by cell size: the size table is n_cells rows — broadcast
    from procoggraph_spark.operators.similarity import dot, l2_norm

    sizes = assigned.groupBy("_cell").agg(F.count("*").alias("_csz"))
    tagged = assigned.join(F.broadcast(sizes), "_cell")
    small = tagged.filter(F.col("_csz") <= max_cell_rows).drop("_csz")
    big = tagged.filter(F.col("_csz") > max_cell_rows).drop("_csz")

    pairs_small = small.groupBy("_cell").applyInPandas(
        cell_pairs, schema=pair_schema
    )
    bn = big.withColumn("_n", l2_norm(F.col("_v")))
    bl = bn.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "_cell",
    )
    br = bn.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "_cell",
    )
    pairs_big = (
        bl.join(br, "_cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
            >= threshold
        )
        .select("id_a", "id_b")
    )
    pairs = pairs_small.unionByName(pairs_big)
    docs = v.select(F.col("_id").alias(id_col))
    return dedup_clusters(pairs, docs, id_col=id_col)


def strip_boilerplate(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_docs: int = 10,
    out_col: str = "clean_text",
) -> DataFrame:
    """The remediation step `repeated_passages` feeds: remove every
    hot passage (a ``window``-word span appearing in >= ``min_docs``
    documents — licence blocks, templates, navigation chrome) from the
    documents that carry it. Output: (id_col, out_col).

    Removal is a per-row left fold over the doc's OWN sorted hot-passage
    list (`aggregate(ps, text, replace)`), so the work is
    O(|doc passages| x |text|) per row and fully engine-portable: the
    fold order is the sorted list in both Spark and the SQL oracle, so
    overlapping-passage interactions resolve identically. Each match is
    replaced by a SINGLE SPACE, not the empty string, so the words on
    either side never fuse into a new token. The match itself is
    substring-level (both engines' `replace`): a passage's exact
    character run occurring inside longer words is also excised — for
    the boilerplate use-case (long multi-word spans) such collisions
    are vanishingly rare, and token-exact removal would require the
    tokenize-mask-rejoin formulation.

    Scale shape: one LOGICAL shingle explode feeds both the hot-set
    aggregation and the per-doc tagging join. The document frequency is
    a groupBy (map-side partial combine, skew-safe: a viral passage in
    millions of docs partially aggregates on every mapper) — NOT a
    count window over the passage key, which would materialize that
    passage's entire posting list in one window partition. Tagging
    joins only the rows whose shingle survived the frequency cut; the
    fold itself is map-side column algebra after an id-keyed join back
    to the docs.

    The distinct shingle table has TWO sibling consumers (the hot-set
    aggregation and the tagging join side) and Spark does no plan-level
    CSE across them, so without intervention the corpus scan + explode
    + (_id, _sh) distinct executes twice per run. A lazy localCheckpoint
    materializes it once — the `containment_pairs` trade: one
    shingle-table materialization to executor-local storage against a
    second full-corpus explode + distinct exchange.
    """
    sh = _exploded_shingles(
        df, id_col=id_col, text_col=text_col, n=window, sets=True
    ).localCheckpoint(eager=False)
    hot = (
        sh.groupBy("_sh")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_sh")
    )
    # deliberately NOT broadcast-hinted (unlike the hot-set anti-join in
    # ngram_jaccard_pairs, whose ABOVE-cap set is tiny by construction):
    # this hot set is everything at-or-above min_docs and scales with
    # the corpus, so the planner/AQE picks broadcast only when runtime
    # stats allow; a skewed _sh key in the shuffle join is
    # AQE-skew-splittable either way.
    per_doc = sh.join(hot, "_sh").select("_id", F.col("_sh").alias("passage"))
    lists = per_doc.groupBy("_id").agg(
        F.sort_array(F.collect_list("passage")).alias("_ps")
    )
    joined = df.join(lists, df[id_col] == lists["_id"], "left")
    cleaned = F.when(F.col("_ps").isNull(), F.col(text_col)).otherwise(
        F.aggregate(
            F.col("_ps"),
            F.col(text_col),
            lambda acc, p: F.replace(acc, p, F.lit(" ")),
        )
    )
    return joined.select(df[id_col], cleaned.alias(out_col))


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Two-phase decontamination for eval sets too large to broadcast
    raw (the scale path of `benchmark_contamination`): phase 1 probes
    every corpus shingle against a broadcast Bloom bitmap of the
    benchmark's shingle set — a shingle that fails the probe is
    PROVABLY clean (no false negatives) and never reaches the join;
    phase 2 exact-joins only the surviving candidates against the true
    benchmark shingles to discard Bloom false positives.

    Per-doc output: total distinct shingles, Bloom candidate count (the
    pruning diagnostic — candidates ≥ contaminated, the gap is the
    false-positive cost), exact contaminated count, and the
    contamination ratio — the final ratio is IDENTICAL to
    `benchmark_contamination`'s, reached with the shuffle volume of the
    candidates instead of the whole corpus shingle stream.

    Scale shape: the bitmap is ≤ ``n_bits`` entries however large the
    benchmark is, so the probe stays a map-only broadcast over the
    corpus scan; the exact-verify join shuffles only Bloom survivors.
    This is the DataFrame spelling of runtime bloom-filter join pruning,
    under the repo's portable-arithmetic discipline so a SQL oracle
    rebuilds the identical sketch and candidate set.
    """
    from procoggraph_spark.operators.sketches import bloom_build, bloom_probe

    c_sh = _exploded_shingles(corpus, id_col=id_col, text_col=text_col, n=n, sets=True)
    b_sh = benchmark.select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("_sh")
    ).distinct()
    bits = bloom_build(b_sh, "_sh", n_bits=n_bits, n_hashes=n_hashes)
    probed = bloom_probe(
        c_sh, "_sh", bits, n_bits=n_bits, n_hashes=n_hashes, flag_col="_hit"
    )
    # Fan-out discipline (no plan-level CSE, same hazard fixed in
    # bigram_logprob): the corpus shingle explode + distinct + probe —
    # the expensive chain — evaluates exactly ONCE, into a single
    # doc-grain aggregation that carries the per-doc totals, the
    # candidate count AND the (Bloom-pruned small, the operator's
    # whole premise) candidate shingle lists. The exact-verify leg
    # re-expands only those lists, so the corpus is never re-scanned:
    # one pass where the previous totals-leg/candidate-leg split paid
    # two. The lazy localCheckpoint covers the frame's two consumers
    # (exact leg + final join). collect_list skips the NULLs the
    # non-hit branch produces, so _cands is exactly the hit shingles;
    # per-doc shingles are distinct by construction, so exploding the
    # lists replays the candidate multiset bit-for-bit.
    stats = (
        probed.groupBy("_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("_hit"), True)).alias("n_candidates"),
            F.collect_list(F.when(F.col("_hit"), F.col("_sh"))).alias("_cands"),
        )
        .localCheckpoint(eager=False)
    )
    exact = (
        stats.select("_id", F.explode("_cands").alias("_sh"))
        .join(b_sh, "_sh")
        .groupBy("_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        stats.join(exact, "_id", "left")
        .na.fill(0, ["n_contaminated"])
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            "n_candidates",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination_ratio"
            ),
        )
    )


def containment_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric shingle-containment pairs: |A∩B| / min(|A|, |B|).

    Jaccard misses the quote/subset duplication case — a short document
    wholly embedded in a long one scores low symmetric similarity but
    containment 1.0 (Broder's containment measure; the reference's
    near-dup family covers only the symmetric case, ref
    ``snakemake_pipeline`` dedup discussion). Output names the
    direction: ``contained_id`` is the smaller shingle set (id-asc on
    ties), ``container_id`` the larger, ``containment`` =
    intersection / |contained| rounded to 6.

    Plan shape is ``ngram_jaccard_pairs``'s: distinct-shingle explode →
    self equi-join on shingle (only co-shingled pairs shuffle) →
    per-pair intersection count → per-doc sizes joined back. The same
    ``max_shingle_df`` hot-shingle guard caps the quadratic df² edge,
    and the retained-universe semantics are identical, so containment
    stays exact over the informative shingles. Scale posture: one
    shingle-keyed shuffle + one pair-keyed aggregation; no windows, no
    broadcast of corpus-sized state.

    The post-guard shingle table has THREE sibling consumers (sizes,
    join-left, join-right) and Spark does no plan-level CSE, so without
    intervention the corpus scan + explode + anti-join executes three
    times. A lazy localCheckpoint materializes it once (interleaved
    best-of-4 at the 10× probe: 1.66 vs 2.14 s, −22%); the trade is
    one shingle-table materialization to executor-local storage against
    two extra full-corpus explodes — the right side of the trade
    whenever the corpus is large enough for this operator to matter.
    (The checkpoint swallows the guard subplan from the final explain;
    tests/test_plans.py asserts the guard shape on ``_guarded_shingles``
    directly.)
    """
    sh = _guarded_shingles(
        df, id_col=id_col, text_col=text_col, n=n, max_shingle_df=max_shingle_df
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))

    a = sh.select(F.col("_id").alias("id_a"), "_sh")
    b = sh.select(F.col("_id").alias("id_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    a_contained = (F.col("_na") < F.col("_nb")) | (
        (F.col("_na") == F.col("_nb")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.when(a_contained, F.col("id_a")).otherwise(F.col("id_b")).alias(
                "contained_id"
            ),
            F.when(a_contained, F.col("id_b")).otherwise(F.col("id_a")).alias(
                "container_id"
            ),
            F.round(
                F.col("_inter") / F.least(F.col("_na"), F.col("_nb")), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def incremental_ingest_dedup(
    history: DataFrame,
    batch: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify an incoming batch against an already-ingested corpus:
    ``new`` (first occurrence of its content anywhere), ``dup_batch``
    (another batch row with the same content has a smaller id), or
    ``dup_history`` (content already ingested) — the continual-ingestion
    shape a production corpus runs every crawl cycle, where re-hashing
    the full history per batch would be quadratic over time.

    Content key = md5(text), with NULL text coalesced to a sentinel key
    (md5 output is hex, so the sentinel cannot collide) — md5(NULL) is
    NULL and a NULL join key would silently drop the row from the inner
    first-occurrence join, violating the classify-every-row contract on
    dirty corpora. Portable across engines (the oracle replays the same
    COALESCE). History is reduced to its DISTINCT key set before the join — the only state
    the incremental path ever touches, amenable to an incrementally
    maintained key table (S16 cache discipline). Within-batch firsts
    use groupBy(min id) + join-back, not a window over the unbounded
    hash-key space. Both joins are hash-keyed shuffles; nothing is
    broadcast (history is corpus-scale) and AQE may still choose a
    broadcast when the key set is small.
    """
    key = F.coalesce(F.md5(F.col(text_col)), F.lit("__NULL_TEXT__")).alias("_k")
    hkeys = history.select(key).distinct()
    bk = batch.select(F.col(id_col), key)
    first = bk.groupBy("_k").agg(F.min(id_col).alias("_first_id"))
    return (
        bk.join(first, "_k")
        .join(hkeys.withColumn("_in_hist", F.lit(True)), "_k", "left")
        .select(
            id_col,
            F.when(F.col("_in_hist").isNotNull(), F.lit("dup_history"))
            .when(F.col(id_col) != F.col("_first_id"), F.lit("dup_batch"))
            .otherwise(F.lit("new"))
            .alias("decision"),
        )
    )


def crawl_novelty(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cycle_size: int = 50,
) -> DataFrame:
    """Per-crawl-cycle novelty curve: bucket documents into ingestion
    cycles (id-ordered windows of ``cycle_size``), and for each cycle
    report how many of its documents carry content never seen in ANY
    earlier cycle — the curation signal that tells a continual-crawl
    operator when a source has gone stale (novelty_rate decaying toward
    0 means the crawler is re-fetching what the corpus already holds).

    Content key = md5 with the NULL-text sentinel (same contract as
    incremental_ingest_dedup); first-seen cycle per key is one hash agg
    (map-side combine over the bounded key space per partition), and the
    cycle join is on the bounded cycle grain — no window over the
    unbounded key space, portable across engines.
    """
    # integer DIV, not floor(double division): a double is exact only
    # to 2^53, so snowflake-scale ids (2^61 — huge-keys fuzz) bucket
    # into the WRONG cycle under float division while the SQL twin's
    # `//` divides exactly
    _id = str(id_col).replace("`", "``")
    cyc = F.expr(f"CAST(`{_id}` AS BIGINT) DIV {int(cycle_size)}")
    key = F.coalesce(F.md5(F.col(text_col)), F.lit("__NULL_TEXT__"))
    d = df.select(cyc.alias("cycle"), key.alias("_k"))
    per_cycle = d.groupBy("cycle").agg(F.count("*").alias("n_docs"))
    first = d.groupBy("_k").agg(F.min("cycle").alias("cycle"))
    fresh = first.groupBy("cycle").agg(F.count("*").alias("n_new_keys"))
    return (
        per_cycle.join(fresh, "cycle", "left")
        .select(
            "cycle",
            "n_docs",
            F.coalesce(F.col("n_new_keys"), F.lit(0)).cast("long").alias(
                "n_new_keys"
            ),
            F.round(
                F.coalesce(F.col("n_new_keys"), F.lit(0)).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
    )


def substring_ngram_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 40,
    max_df: int = 20,
) -> DataFrame:
    """Character-level substring dedup (the Lee et al. "Deduplicating
    Training Data" signal): two documents are near-duplicates when they
    share ANY k-character substring — catches copied passages that
    word-shingle Jaccard dilutes away in long documents. Emits candidate
    pairs with the count of shared distinct k-grams.

    Scale shape: per-document DISTINCT k-gram explode (stride 1 — L-k+1
    grams per doc, deduped inside the row before the shuffle), then ONE
    gram-keyed aggregation collecting the gram's doc-id SET — the
    collect_set absorbs the cross-row dedup (a replayed doc_id's gram
    set is the union over its rows — dirty-keys fuzz) AND the
    document-frequency guard (grams in > ``max_df`` docs are
    boilerplate/hot-gram quadratic blow-up, absorbed at the gram grain,
    same discipline as the word-shingle operators). Ordered pairs then
    expand IN-ROW from each surviving gram's sorted id set (≤
    max_df·(max_df-1)/2 per gram, bounded) — no gram-keyed self-join at
    all. Two shuffles total where the join form took five passes over
    the gram table (distinct, df-guard agg, guard join, self-join,
    pair agg) plus a checkpoint materialization.
    """
    t_ = F.col(text_col)
    n = t_.isNotNull().cast("int") * (F.length(t_) - F.lit(k - 1))
    grams = F.when(
        n >= 1,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: t_.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
    # size >= 2: single-doc grams produce no pairs (the old guard kept
    # them through the join where they died anyway)
    sets = (
        g.groupBy("_g")
        .agg(F.collect_set("_id").alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_df))
    )
    ids = F.sort_array(F.col("_ids"))
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs).alias("_p"))
        .groupBy(
            F.col("_p.a").alias("id_a"), F.col("_p.b").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
