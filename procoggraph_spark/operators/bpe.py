"""Byte-pair-encoding merge training as DataFrame algebra — the
tokenizer-building step of a training-data pipeline (Sennrich et al.
2016), expressed the way a distributed BPE trainer actually runs: the
corpus collapses ONCE to a (word, freq) vocabulary table, and every
merge iteration operates on that vocab-sized table, never on the corpus
again.

Per iteration: adjacent-pair counts via a zip_with explode + one hash
aggregation (map-side combinable), the argmax pair via orderBy+limit 1
(TakeOrderedAndProject — one row to the driver, the same model-only
traffic discipline as the k-means and logistic-regression trainers),
then the merge applied to every word's symbol array with a pure-column
fold. The vocab table is eagerly localCheckpoint-ed each iteration:
without it the nested merge expressions grow the plan exponentially
with merge count (lineage truncation, not caching, is the point).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from procoggraph_spark.operators.text import tokens

END = "</w>"  # end-of-word marker, kept as its own terminal symbol


def word_vocab(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq, syms) vocabulary table: each word split
    into single-character symbols plus the end-of-word marker. The only
    corpus-scale pass in BPE training."""
    w = df.select(F.explode(tokens(F.col(text_col))).alias("word")).filter(
        F.col("word") != ""
    )
    vocab = w.groupBy("word").agg(F.count("*").alias("freq"))
    syms = F.concat(
        F.split(F.col("word"), ""),  # single characters
        F.array(F.lit(END)),
    )
    return vocab.withColumn("syms", syms)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word frequency."""
    k = F.greatest(F.size("syms") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("syms", 1, k),
        F.slice("syms", 2, k),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    ex = vocab.select("freq", F.explode(pairs).alias("p"))
    return ex.groupBy("p.a", "p.b").agg(F.sum("freq").alias("cnt"))


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Replace every adjacent (a, b) with the merged symbol a+b —
    left-to-right, non-overlapping (after merging positions i,i+1 the
    next candidate starts at i+2), matching the reference BPE
    semantics. A fold with (out, carry) state: ``carry`` holds the
    symbol that may still start a merge."""
    merged = F.lit(a + b)
    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(st: Column, x: Column) -> Column:
        is_merge = st["carry"].eqNullSafe(F.lit(a)) & (x == F.lit(b))
        out_on_merge = F.concat(st["out"], F.array(merged))
        out_on_flush = F.when(
            st["carry"].isNull(), st["out"]
        ).otherwise(F.concat(st["out"], F.array(st["carry"])))
        return F.when(
            is_merge,
            F.struct(out_on_merge.alias("out"),
                     F.lit(None).cast("string").alias("carry")),
        ).otherwise(
            F.struct(out_on_flush.alias("out"), x.alias("carry"))
        )

    def finish(st: Column) -> Column:
        return F.when(st["carry"].isNull(), st["out"]).otherwise(
            F.concat(st["out"], F.array(st["carry"]))
        )

    return F.aggregate(syms, zero, step, finish)


def train_bpe(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 20,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list [(a, b, count)] in learned order plus the final vocab table
    with merged symbol arrays. Deterministic tie-break: highest count,
    then (a, b) ascending — so reruns and engines agree on the exact
    merge sequence.

    Driver traffic is one (a, b, count) row per merge; per-iteration
    compute is vocab-sized. Stops early when no pair occurs twice.
    """
    vocab = word_vocab(df, text_col=text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, cnt))
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE model: per document, the subword token count
    and mean subword length under the learned segmentation. Words are
    joined (broadcast — the vocab is model-sized) to their trained
    symbol arrays; words never seen in training fall back to
    character-level symbols plus the end-of-word marker, exactly what
    an OOV word degenerates to under BPE.

    Scale shape: explode words → broadcast join → per-doc aggregation;
    the merge loop never reruns at encode time — encoding is one
    map-side join at scan speed, which is why trainers ship the vocab,
    not the merge list, to the data plane.
    """
    words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    fallback = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    joined = words.join(
        F.broadcast(vocab.select("word", "syms")), "word", "left"
    ).withColumn("_syms", F.coalesce(F.col("syms"), fallback))
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.sum(F.size("_syms")).alias("n_subword_tokens"),
        F.round(
            F.sum(
                F.aggregate(
                    "_syms", F.lit(0), lambda acc, s: acc + F.length(s)
                ).cast("double")
            )
            / F.sum(F.size("_syms")),
            6,
        ).alias("mean_subword_len"),
    )
