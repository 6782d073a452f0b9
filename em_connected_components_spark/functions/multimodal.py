"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media next to text; the Spark-side contract is:
binary payload column + struct metadata column, processed by Arrow-batched
``mapInPandas`` so each Python roundtrip moves a record batch, never a row.

Decode support (round 4): uncompressed raster formats are decoded for real
with pure numpy — PPM/P6 (binary netpbm) and BMP (24-bit uncompressed
BI_RGB) need no codec library at all. Compressed formats (PNG/JPEG/…)
require codecs that are NOT in this container and raise ``ValueError``
with the detected magic; the deterministic fake decoder remains as a test
twin (``fake=True``) exercising the same Spark plumbing — schema, batching,
partitioning — which is the part that has to be right at 100 TB.

Matching encoders (``encode_ppm``/``encode_bmp``) exist so fixtures and
driver queries can synthesize deterministic payloads without external data.
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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


# ---------------------------------------------------------------------------
# real decoders — pure numpy, zero codec dependencies
# ---------------------------------------------------------------------------

def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (netpbm P6, maxval <= 255) to (h, w, 3) uint8.

    Header grammar: ``P6`` then whitespace-separated width/height/maxval
    tokens (``#`` comments allowed between tokens), then EXACTLY one
    whitespace byte, then the raw RGB raster row-major top-down.
    """
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields[0], fields[1], fields[2]
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    need = w * h * 3
    raster = data[pos : pos + need]
    if len(raster) != need:
        raise ValueError(
            f"truncated PPM raster: need {need} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes (deterministic fixture twin)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP (BI_RGB) to (h, w, 3) uint8 RGB.

    Handles the standard layout: BITMAPFILEHEADER (14 bytes) +
    BITMAPINFOHEADER (>=40 bytes), bottom-up rows (positive height) or
    top-down (negative height), 4-byte row stride padding, BGR byte order.
    """
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    if len(data) < 54:
        raise ValueError("truncated BMP header")

    def _u32(off: int) -> int:
        return int.from_bytes(data[off : off + 4], "little", signed=False)

    def _i32(off: int) -> int:
        return int.from_bytes(data[off : off + 4], "little", signed=True)

    pixel_off = _u32(10)
    w = _i32(18)
    h_raw = _i32(22)
    bpp = int.from_bytes(data[28:30], "little")
    compression = _u32(30)
    if bpp != 24:
        raise ValueError(f"unsupported BMP bit depth {bpp} (need 24)")
    if compression != 0:
        raise ValueError(
            f"unsupported BMP compression {compression} (need BI_RGB=0)"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raster = data[pixel_off : pixel_off + need]
    if len(raster) != need:
        raise ValueError(
            f"truncated BMP raster: need {need} bytes, have {len(raster)}"
        )
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1, :, :]  # stored bottom-up -> flip to top-down
    return rgb.copy()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up rows)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape[0], arr.shape[1]
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    raster = rows[::-1, :].tobytes()  # bottom-up
    size = 54 + len(raster)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")           # pixel data offset
        + (40).to_bytes(4, "little")            # BITMAPINFOHEADER size
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive => bottom-up
        + (1).to_bytes(2, "little")             # planes
        + (24).to_bytes(2, "little")            # bpp
        + (0).to_bytes(4, "little")             # BI_RGB
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2      # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + raster


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
    """Decode an image payload.

    Real path (default): dispatch on the magic bytes — ``P6`` -> PPM,
    ``BM`` -> BMP — returning (h, w, 3) uint8 pixels. Formats that need a
    codec library (PNG/JPEG/GIF/WEBP/...) raise ``ValueError`` naming the
    detected format (the container ships no codecs; a deployment with
    PIL/opencv would extend the dispatch here).

    ``fake=True``: the deterministic byte-fold test twin (dim-8 float32
    vector), kept so plumbing tests run on arbitrary bytes.
    """
    if fake:
        return _fake_decode(payload)
    if payload is None or len(payload) < 2:
        raise ValueError("empty or truncated image payload")
    magic = bytes(payload[:2])
    if magic == b"P6":
        return decode_ppm(payload)
    if magic == b"BM":
        return decode_bmp(payload)
    known = {
        b"\x89P": "png", b"\xff\xd8": "jpeg", b"GI": "gif", b"RI": "webp/riff"
    }
    name = known.get(magic, f"unknown magic {magic!r}")
    raise ValueError(
        f"unsupported image format ({name}): only uncompressed PPM/P6 and "
        "24-bit BMP decode without codec libraries in this environment"
    )


def extract_image_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Batch feature extraction over a binary media column via mapInPandas.

    ``fake=False`` (real path): decode PPM/BMP pixels, emit width/height,
    mean intensity over all channels, and a fixed-dim feature vector
    (per-channel mean, per-channel std, height, width). ``fake=True``:
    the byte-fold twin (width/height 0). Arrow batches, schema, and
    partition-parallel shape are identical either way.
    """

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, means, sizes, ws, hs = [], [], [], [], []
            for b in pdf[payload_col]:
                payload = bytes(b) if b is not None else b""
                if fake or len(payload) == 0:
                    vec = _fake_decode(payload, dim=feature_dim)
                    feats.append([float(x) for x in vec])
                    means.append(float(vec.mean()) if len(vec) else 0.0)
                    ws.append(0)
                    hs.append(0)
                else:
                    px = decode_image(payload)
                    flat = px.astype(np.float64)
                    ch_mean = flat.mean(axis=(0, 1))
                    ch_std = flat.std(axis=(0, 1))
                    feats.append(
                        [float(x) for x in ch_mean]
                        + [float(x) for x in ch_std]
                        + [float(px.shape[0]), float(px.shape[1])]
                    )
                    means.append(float(flat.mean()))
                    ws.append(int(px.shape[1]))
                    hs.append(int(px.shape[0]))
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "n_bytes": sizes,
                    "width": ws,
                    "height": hs,
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
    pure JVM sequence/explode; the decode of each frame is the kernel
    above. This is the partition-blowup-aware shape: frames are
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
