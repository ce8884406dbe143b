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


def _fake_feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC FAKE feature extractor: FEATURE_DIM doubles derived
    from byte sums over equal slices of the payload — stands in for an
    embedding model with the same schema/batching."""

    def feats(payload: bytes | bytearray | None) -> list[float]:
        if payload is None:
            return [0.0] * FEATURE_DIM
        b = bytes(payload)
        n = max(len(b), 1)
        step = max(n // FEATURE_DIM, 1)
        out = []
        for i in range(FEATURE_DIM):
            chunk = b[i * step : (i + 1) * step] or b"\x00"
            out.append(round(sum(chunk) / (255.0 * len(chunk)), 6))
        return out

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
