"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media next to text; the Spark-side contract is:
binary payload column + struct metadata column, processed by Arrow-batched
``mapInPandas`` so each Python roundtrip moves a record batch, never a row.

The actual codecs (PIL/torchaudio/ffmpeg) are NOT in this container, so the
decode kernels are stubbed: ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (header
parse + hash-derived pixels) exercises the full Spark plumbing — schema,
batching, partitioning — which is the part that has to be right at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real image decode: derive a pseudo-pixel
    array from the payload bytes (stable across runs/retries)."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    # fold bytes into `dim` buckets
    pad = (-len(arr)) % dim
    arr = np.pad(arr, (0, pad))
    return arr.reshape(-1, dim).mean(axis=0).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Real decode path — stubbed (no image libs in this container)."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this "
        "environment; pass fake=True for the deterministic test decoder"
    )


def extract_image_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Batch feature extraction over a binary media column via mapInPandas.

    Real deployments swap ``_fake_decode`` for the codec; the Spark side
    (Arrow batches, schema, partition-parallel) is identical.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, means, sizes = [], [], []
            for b in pdf[payload_col]:
                payload = bytes(b) if b is not None else b""
                vec = decode_image(payload, fake=fake)
                feats.append([float(x) for x in vec])
                means.append(float(vec.mean()) if len(vec) else 0.0)
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "n_bytes": sizes,
                    "mean_intensity": means,
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Explode a video row into (media_id, frame_ts_ms) sampling points —
    pure JVM sequence/explode; the decode of each frame is the stubbed
    kernel above. This is the partition-blowup-aware shape: frames are
    generated lazily per row, so a 2-hour video fans out inside its task."""
    return media.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
