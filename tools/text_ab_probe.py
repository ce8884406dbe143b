"""Interleaved A/B: inline (old) vs let-bound (new) text expressions on
the two headline queries that evaluate them — text_quality_score and
training_data_pipeline — in ONE session (host-noise discipline per
BENCH.md), best-of-N per variant, noop sink.

The old variants are reconstructed by monkeypatching the text module's
public composites with the verbatim pre-round-12 inline forms; the
queries are rebuilt per variant so the plans embed the right expression
shape. Values are asserted equal before timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from procoggraph_spark.operators import text as X
from procoggraph_spark.session import apply_adaptive_policy, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))

# ---- verbatim pre-rewrite (inline) forms ----
tokens = X.tokens
punct_ratio = X.punct_ratio
STOPWORDS_EN = X.STOPWORDS_EN
LANG_MARKERS = X.LANG_MARKERS


def old_stopword_ratio(text, stopwords=STOPWORDS_EN):
    ws = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    return n_stop / F.greatest(F.size(ws), F.lit(1))


def old_mean_token_len(text):
    ws = tokens(text)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return total / F.greatest(F.size(ws), F.lit(1))


def old_quality_score(text):
    len_ok = F.when(F.length(text) >= 100, 1.0).otherwise(F.length(text) / 100.0)
    punct_ok = 1.0 - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_ok = F.least(old_stopword_ratio(text) * 5.0, F.lit(1.0))
    mtl = old_mean_token_len(text)
    mtl_ok = F.when((mtl >= 3.0) & (mtl <= 12.0), 1.0).otherwise(0.5)
    return F.round((len_ok + punct_ok + stop_ok + mtl_ok) / 4.0, 6)


def old_predict_lang(text):
    ws = tokens(text)
    langs = sorted(LANG_MARKERS)
    zero = F.struct(*[F.lit(0).alias(lg) for lg in langs])

    def step(acc, w):
        return F.struct(
            *[
                (acc[lg] + F.when(w.isin(*LANG_MARKERS[lg]), 1).otherwise(0)).alias(lg)
                for lg in langs
            ]
        )

    counts = F.aggregate(ws, zero, step)
    best = counts[langs[0]]
    for lg in langs[1:]:
        best = F.greatest(best, counts[lg])
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when(counts[lg] == best, lg).otherwise(pred)
    return F.when(best > 0, pred).otherwise("und")


def old_repeated_ngram_ratio(text, n=2):
    ws = tokens(text)
    k = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    grams = F.slice(ws, 1, k)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(ws, 1 + j, k), lambda a, b: F.concat_ws(" ", a, b)
        )
    n_total = F.size(grams)
    n_unique = F.size(F.array_distinct(grams))
    return F.when(n_total <= 0, 0.0).otherwise(
        F.round((n_total - n_unique) / n_total, 6)
    )


def old_corpus_keep_decision(text, *, min_quality=0.5, max_repetition=0.2, langs=("en",)):
    lang_ok = old_predict_lang(text).isin(*langs)
    return (
        (old_quality_score(text) >= min_quality)
        & (old_repeated_ngram_ratio(text) <= max_repetition)
        & lang_ok
    )


OLD = {
    "quality_score": old_quality_score,
    "predict_lang": old_predict_lang,
    "repeated_ngram_ratio": old_repeated_ngram_ratio,
    "corpus_keep_decision": old_corpus_keep_decision,
    "stopword_ratio": old_stopword_ratio,
    "mean_token_len": old_mean_token_len,
}
NEW = {k: getattr(X, k) for k in OLD}


def with_variant(variant: str, build):
    src = OLD if variant == "old" else NEW
    saved = {k: getattr(X, k) for k in src}
    for k, fn in src.items():
        setattr(X, k, fn)
    try:
        return build()
    finally:
        for k, fn in saved.items():
            setattr(X, k, fn)


def main() -> None:
    spark = get_spark("text_ab_probe")
    apply_adaptive_policy(spark, SF_DIR)
    from procoggraph_spark.queries import registry

    qs, _ = registry()

    builders = {
        "text_quality_score": lambda: qs["text_quality_score"](spark, SF_DIR),
        "training_data_pipeline": lambda: qs["training_data_pipeline"](spark, SF_DIR),
    }

    # warmup
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    best: dict[tuple[str, str], float] = {}
    for rnd in range(N_ROUNDS):
        for qname, build in builders.items():
            for variant in ("old", "new"):
                df = with_variant(variant, build)
                spark.sparkContext.setJobDescription(f"{qname}:{variant}:r{rnd}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                key = (qname, variant)
                best[key] = min(best.get(key, float("inf")), dt)
    for qname in builders:
        o, n = best[(qname, "old")], best[(qname, "new")]
        print(f"{qname}: old {o:.3f}s new {n:.3f}s ({o / n:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
