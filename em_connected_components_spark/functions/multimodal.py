"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media next to text; the Spark-side contract is:
binary payload column + struct metadata column, processed by Arrow-batched
``mapInPandas`` so each Python roundtrip moves a record batch, never a row.

Decode support (round 4): uncompressed formats are decoded for real with
pure numpy — PPM/P6 (binary netpbm) and BMP (24-bit uncompressed BI_RGB)
for images, PCM RIFF/WAVE (8/16/32-bit) for audio — no codec library at
all. Compressed formats (PNG/JPEG/MP3/…) require codecs that are NOT in
this container and raise ``ValueError`` with the detected format; the
deterministic fake decoder remains as a test twin (``fake=True``)
exercising the same Spark plumbing — schema, batching, partitioning —
which is the part that has to be right at 100 TB.

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


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("rms6", T.DoubleType()),
    ]
)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed PCM RIFF/WAVE payload to
    ``(samples (n_frames, n_channels) int32, sample_rate)`` — pure numpy,
    no codec libraries (8-bit unsigned is re-centered to signed per the WAV
    convention; 16/32-bit are signed little-endian).

    Chunk-walks the RIFF container, so extra chunks (LIST/INFO/fact) before
    or between fmt and data are skipped, as the format requires.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csize = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "n_channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            if len(body) != csize:
                raise ValueError(
                    f"truncated WAV data chunk: need {csize}, have {len(body)}"
                )
            raw = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    if fmt["audio_format"] != 1:
        raise ValueError(
            f"unsupported WAV audio format {fmt['audio_format']} (need "
            "PCM=1; compressed WAV needs codec libraries)"
        )
    bits, ch = fmt["bits"], max(fmt["n_channels"], 1)
    if bits == 8:
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
        )
    elif bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bits == 32:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (need 8/16/32)")
    n_frames = len(samples) // ch
    return samples[: n_frames * ch].reshape(n_frames, ch), fmt["sample_rate"]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, n_channels) ints -> 16-bit PCM WAV bytes
    (deterministic fixture twin of decode_wav)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n_channels = arr.shape[1]
    raw = arr.tobytes()
    byte_rate = sample_rate * n_channels * 2
    return (
        b"RIFF"
        + (36 + len(raw)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")           # bits
        + b"data"
        + len(raw).to_bytes(4, "little")
        + raw
    )


def extract_audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch audio feature extraction over binary WAV payloads via
    mapInPandas: rate/channels/duration plus amplitude stats (mean, RMS
    rounded to 6 dp) — the audio twin of extract_image_features, same Arrow
    batch shape. Rows with empty payloads yield zeroed features."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(b) if b is not None else b""
                out["media_id"].append(mid)
                out["n_bytes"].append(len(payload))
                if len(payload) == 0:
                    for k in ("sample_rate", "n_channels", "n_samples",
                              "duration_ms"):
                        out[k].append(0)
                    out["mean_amp"].append(0.0)
                    out["rms6"].append(0.0)
                    continue
                samples, rate = decode_wav(payload)
                flat = samples.astype(np.float64)
                n = samples.shape[0]
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(int(samples.shape[1]))
                out["n_samples"].append(int(n))
                out["duration_ms"].append(
                    int(n * 1000 // rate) if rate else 0
                )
                out["mean_amp"].append(float(flat.mean()))
                out["rms6"].append(
                    round(float(np.sqrt((flat ** 2).mean())), 6)
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


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
