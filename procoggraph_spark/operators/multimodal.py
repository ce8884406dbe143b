"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is a stub
(NotImplementedError) / deterministic fake — but everything Spark-side
is real and tested: binary column schemas, Arrow batch shapes through
mapInPandas, feature-vector column types, and partition sizing.

At 100 TB the pattern is: assets in Parquet binary columns (or
pointers into object storage), decode/feature-extract as `mapInPandas`
over batches sized by `spark.sql.files.maxPartitionBytes`, features as
`array<float>` feeding operators.similarity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8


def decode_stub_schema() -> T.StructType:
    """Schema of the real decoder's output (what a PIL/libav-backed
    decode stage would yield per asset)."""
    return T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )


def decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
    """STUB: real image decode requires a codec library not present in
    this container. The Spark-side contract (mapInPandas over binary
    batches → decode_stub_schema rows) is what's real here."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this container; "
        "plug the real decoder into this batch signature"
    )


# portable shingle-hash constants: 5-byte polynomial fold then one
# multiplicative mix, all in plain 31-bit integer arithmetic — the
# same portable-hash discipline as the MinHash/CMS twins, so a SQL
# oracle replays every bucket and sign exactly (crc32, the previous
# mixer, has no DuckDB equivalent)
_FEAT_K = 1000003
_FEAT_MIX = 2654435761
_FEAT_M = 1 << 31


def _shingle_hash(b: bytes, i: int) -> int:
    """Hash of the zero-padded 5-byte shingle at offset ``i``."""
    h = 0
    for k in range(5):
        byte = b[i + k] if i + k < len(b) else 0
        h = (h * _FEAT_K + byte) % _FEAT_M
    return (h * _FEAT_MIX) % _FEAT_M


def _fake_feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC FAKE feature extractor: a signed count-sketch of
    5-byte shingles (portable polynomial-fold + multiplicative-mix
    bucketing, ±1 signed) — stands in for an embedding model with the
    same schema/batching. Unlike a byte-average (which collapses all
    natural-language payloads to near-identical vectors), unrelated
    payloads sketch to near-orthogonal vectors while shared shingles
    preserve similarity — so downstream cosine thresholds behave like
    they would on real embeddings. The portable arithmetic makes the
    whole kernel SQL-replayable (mm_feature_extract's oracle rebuilds
    buckets, signs, and normalization from the base table)."""

    def feats(payload: bytes | bytearray | None) -> list[float]:
        if payload is None:
            return [0.0] * FEATURE_DIM
        b = bytes(payload)
        acc = [0] * FEATURE_DIM
        for i in range(max(len(b) - 4, 1)):
            h = _shingle_hash(b, i)
            acc[h % FEATURE_DIM] += 1 if (h >> 3) & 1 else -1
        norm = sum(v * v for v in acc) ** 0.5 or 1.0
        return [round(v / norm, 6) for v in acc]

    return pd.DataFrame(
        {
            "asset_id": pdf["asset_id"],
            "mime": pdf["mime"],
            "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
            "features": pdf["payload"].map(feats),
        }
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow
    batches; the real model slots into `_fake_feature_batch`)."""
    return assets.mapInPandas(
        lambda it: (_fake_feature_batch(pdf) for pdf in it), schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("target_width", T.IntegerType()),
        T.StructField("target_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    assets: DataFrame, *, max_side: int = 256
) -> DataFrame:
    """Image resize PLUMBING: aspect-preserving fit of (width, height)
    to ``max_side`` computed JVM-side, payload transformed per batch in
    mapInPandas. The pixel work is a DETERMINISTIC FAKE (byte-stride
    decimation by the area ratio — a stand-in with the same contract:
    output bytes shrink with the target area); a PIL/opencv resize
    slots into the same batch signature. Assets already within bounds
    pass through untouched.
    """
    scaled = assets.withColumn(
        "_scale",
        F.when(
            F.greatest("width", "height") <= max_side, F.lit(1.0)
        ).otherwise(max_side / F.greatest("width", "height")),
    ).select(
        "asset_id",
        "mime",
        "width",
        "height",
        F.ceil(F.col("width") * F.col("_scale")).cast("int").alias("target_width"),
        F.ceil(F.col("height") * F.col("_scale")).cast("int").alias("target_height"),
        "payload",
    )

    def resize_batch(batches):
        for pdf in batches:
            def shrink(row):
                p = row["payload"]
                if p is None:
                    return None
                area = row["width"] * row["height"]
                tarea = row["target_width"] * row["target_height"]
                if tarea >= area or len(p) == 0:
                    return bytes(p)
                # floor-div stride (not round): integer-exact, so the
                # byte count is reproducible in any engine's SQL
                stride = max(area // tarea, 1)
                return bytes(p)[::stride]

            out = pdf.copy()
            out["payload"] = pdf.apply(shrink, axis=1)
            yield out

    return scaled.mapInPandas(resize_batch, schema=RESIZE_SCHEMA)


def frame_sample_plan(assets: DataFrame, *, every_n: int = 30) -> DataFrame:
    """Video frame-sampling PLUMBING: emits (asset_id, frame_idx) rows
    for a stubbed decoder via sequence+explode — the shuffle-free Spark
    side of frame extraction."""
    return assets.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
