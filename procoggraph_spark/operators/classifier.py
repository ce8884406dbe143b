"""Linear text classifier over hashed bag-of-words features — the
fasttext-style fast quality/curation scorer a training-data pipeline
uses when the heuristic gate needs to become a LEARNED, tunable model
(same feature hashing idea as Weinberger et al. 2009).

Training is batch gradient descent expressed as DataFrame aggregations:
each iteration computes the full-corpus gradient with one elementwise
aggregation (posexplode → per-dimension sum) and moves only the
``n_features + 1`` model floats through the driver — the identical
model-only-driver-traffic discipline as `similarity.train_centroids`'s
Lloyd iterations. Scoring is pure column algebra (a dot product fold),
so inference runs at scan speed over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from procoggraph_spark.operators.sketches import _bucket
from procoggraph_spark.operators.text import positional_fingerprint, tokens


def _token_bucket(tok: Column, n_features: int) -> Column:
    # reuse the sketch family's portable affine mixer (r=0) — one
    # definition of the hash constants repo-wide, so the portable-hash
    # discipline can never silently diverge between modules
    return _bucket(positional_fingerprint(tok), 0, n_features)


def featurize(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_features: int = 64,
    feat_col: str = "features",
) -> DataFrame:
    """Attach the hashed bag-of-words feature column (array<double>,
    length-normalized): every token hashes to one of ``n_features``
    buckets (portable positional fingerprint + affine mix), the vector
    is the per-bucket token share.

    The per-token bucket array is materialized into a real column
    (`_bks`) BEFORE the per-bucket counting: counting with a lambda
    that captured the tokenize expression would re-evaluate it per
    element (the higher-order-function capture blowup fixed in the
    round-5 shingle family); a column reference capture is a cheap
    attribute read.
    """
    with_buckets = df.withColumn(
        "_bks", F.transform(tokens(F.col(text_col)), lambda t: _token_bucket(t, n_features))
    )
    n_tok = F.greatest(F.size(F.col("_bks")), F.lit(1))
    feats = F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda b: F.size(F.filter(F.col("_bks"), lambda x: x == b)) / n_tok,
    )
    return with_buckets.withColumn(feat_col, feats).drop("_bks")


def _dot(weights: list[float], feat_col: str) -> Column:
    w = F.array(*[F.lit(float(x)) for x in weights])
    return F.aggregate(
        F.zip_with(w, F.col(feat_col), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def score(
    df: DataFrame,
    weights: list[float],
    bias: float,
    *,
    feat_col: str = "features",
    prob_col: str = "prob",
) -> DataFrame:
    """Attach sigmoid(w·x + b) — pure column algebra, no Python."""
    z = _dot(weights, feat_col) + F.lit(float(bias))
    return df.withColumn(prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def train_logreg(
    df: DataFrame,
    *,
    feat_col: str = "features",
    label_col: str = "label",
    n_features: int = 64,
    iters: int = 30,
    lr: float = 2.0,
) -> tuple[list[float], float]:
    """Batch-gradient-descent logistic regression. Per iteration: one
    aggregation job computes sum((p - y) * x) per feature dimension
    (posexplode → groupBy(dim) → sum, map-side combinable) plus the
    bias gradient; only the model crosses to the driver. ``df`` should
    be cached by the caller when iterating more than a few times.
    """
    w = [0.0] * n_features
    b = 0.0
    n = df.count()
    if n == 0:
        raise ValueError(
            "train_logreg: training frame is empty (0 rows) — check the "
            "upstream label/feature filters"
        )
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(_dot(w, feat_col) + F.lit(b))))
        err = (p - F.col(label_col).cast("double")).alias("_err")
        # bias folded in as a constant-1.0 feature at index n_features,
        # so the whole gradient (weights + bias) is ONE aggregation job
        # per iteration instead of two
        ex = df.select(
            err,
            F.posexplode(
                F.concat(F.col(feat_col), F.array(F.lit(1.0)))
            ).alias("_dim", "_x"),
        )
        grad_rows = (
            ex.groupBy("_dim")
            .agg(F.sum(F.col("_err") * F.col("_x")).alias("_g"))
            .collect()
        )
        grad = [0.0] * (n_features + 1)
        for r in grad_rows:
            grad[r["_dim"]] = r["_g"]
        w = [wi - lr * gi / n for wi, gi in zip(w, grad[:n_features])]
        b -= lr * grad[n_features] / n
    return w, b
