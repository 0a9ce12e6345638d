"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature steps run as Arrow-batched ``mapInPandas`` UDFs.

Decode kernels: uncompressed **BMP (24bpp)** and **WAV (16-bit PCM)** are
decoded for real, in pure numpy (``decode_bmp`` / ``decode_wav``; format
specs are public and header-based, no codec libraries needed), so
``deterministic=False`` exercises a true bytes->pixels/samples->features
path end-to-end.  Compressed formats (JPEG/MP4/...) still raise
NotImplementedError at the same seam — that is where libjpeg/ffmpeg plugs
in on a real cluster — and ``deterministic=True`` substitutes a seeded
fake decode for payloads of any format (reproducible tests).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),     # opaque encoded bytes
        StructField("width", IntegerType()),      # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel: features are
    a seeded hash expansion of the payload, so tests are reproducible."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((4 * dim) // len(digest) + 1))[: 4 * dim], dtype="<u4")
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


# --- real decode kernels (pure numpy; public header-based formats) ---------

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24bpp BMP -> (H, W, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = int(np.frombuffer(payload, "<u4", 1, 10)[0])
    width = int(np.frombuffer(payload, "<i4", 1, 18)[0])
    height = int(np.frombuffer(payload, "<i4", 1, 22)[0])
    bpp = int(np.frombuffer(payload, "<u2", 1, 28)[0])
    compression = int(np.frombuffer(payload, "<u4", 1, 30)[0])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24bpp BMP (got bpp={bpp})")
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(payload, np.uint8, stride * height, pix_off).reshape(
        height, stride
    )[:, : width * 3].reshape(height, width, 3)
    rows = rows[::-1] if flip else rows
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24bpp BMP bytes (test synth)."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = body.tobytes()
    header = (
        b"BM"
        + np.uint32(54 + len(pix)).tobytes()
        + b"\x00\x00\x00\x00"
        + np.uint32(54).tobytes()
        + np.uint32(40).tobytes()
        + np.int32(w).tobytes()
        + np.int32(h).tobytes()
        + np.uint16(1).tobytes()
        + np.uint16(24).tobytes()
        + np.uint32(0).tobytes()
        + np.uint32(len(pix)).tobytes()
        + b"\x00" * 16
    )
    return header + pix


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV -> (samples int16 [n, channels], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int(np.frombuffer(payload, "<u4", 1, pos + 4)[0])
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int(np.frombuffer(fmt, "<u2", 1, 0)[0])
    channels = int(np.frombuffer(fmt, "<u2", 1, 2)[0])
    rate = int(np.frombuffer(fmt, "<u4", 1, 4)[0])
    bits = int(np.frombuffer(fmt, "<u2", 1, 14)[0])
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(f"only 16-bit PCM WAV (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(data, "<i2")
    return samples.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 -> 16-bit PCM WAV bytes (test synth)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = (
        np.uint16(1).tobytes()
        + np.uint16(channels).tobytes()
        + np.uint32(rate).tobytes()
        + np.uint32(rate * channels * 2).tobytes()
        + np.uint16(channels * 2).tobytes()
        + np.uint16(16).tobytes()
    )
    return (
        b"RIFF"
        + np.uint32(4 + 8 + len(fmt) + 8 + len(data)).tobytes()
        + b"WAVE"
        + b"fmt "
        + np.uint32(len(fmt)).tobytes()
        + fmt
        + b"data"
        + np.uint32(len(data)).tobytes()
        + data
    )


def _image_features(rgb: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    f = np.zeros(dim, dtype=np.float32)
    h, w, _ = rgb.shape
    x = rgb.astype(np.float32) / 255.0
    lum = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    f[0] = 1.0  # modality tag: image
    f[1], f[2] = np.log1p(w), np.log1p(h)
    f[3:6] = x.reshape(-1, 3).mean(0)
    f[6:9] = x.reshape(-1, 3).std(0)
    f[9:13] = np.quantile(lum, [0.25, 0.5, 0.75, 1.0])
    f[13] = float(np.abs(np.diff(lum, axis=1)).mean()) if w > 1 else 0.0
    f[14] = float(np.abs(np.diff(lum, axis=0)).mean()) if h > 1 else 0.0
    return f


def _audio_features(samples: np.ndarray, rate: int, dim: int = FEATURE_DIM) -> np.ndarray:
    f = np.zeros(dim, dtype=np.float32)
    mono = samples.astype(np.float32).mean(axis=1) / 32768.0
    f[0] = 2.0  # modality tag: audio
    f[1] = np.log1p(rate)
    f[2] = np.log1p(mono.size)
    if mono.size:
        f[3] = mono.mean()
        f[4] = mono.std()
        f[5] = float(np.sqrt(np.mean(mono**2)))  # rms
        f[6] = float(np.abs(mono).max())
        if mono.size > 1:
            f[7] = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean())  # zcr
        # coarse 8-band spectrum of (up to) the first 4096 samples
        seg = mono[:4096]
        spec = np.abs(np.fft.rfft(seg))
        bands = np.array_split(spec, 8)
        f[8:16] = [np.log1p(b.sum()) for b in bands]
    return f


def real_decode(payload: bytes, mime: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """Dispatch a REAL decode by mime; the NotImplementedError branch is
    the documented seam where compressed-format codecs plug in."""
    if mime == "image/bmp":
        return _image_features(decode_bmp(payload), dim)
    if mime == "audio/wav":
        return _audio_features(*decode_wav(payload), dim=dim)
    raise NotImplementedError(
        f"no pure-python decoder for {mime!r}; compressed formats need "
        "codec libraries (libjpeg/ffmpeg) — plug a kernel in here"
    )


def extract_features(media: DataFrame, deterministic: bool = True) -> DataFrame:
    """binary payload -> fixed-dim feature vector, Arrow-batched.

    ``deterministic=True``: seeded fake decode (any payload, reproducible).
    ``deterministic=False``: real decode via :func:`real_decode` — BMP and
    WAV run for real; compressed formats raise at the kernel seam."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                buf = bytes(payload)
                if deterministic:
                    feats.append(_fake_decode(buf).tolist())
                else:
                    feats.append(real_decode(buf, mime).tolist())
                sizes.append(len(buf))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "n_bytes": sizes}
            )

    return media.select("media_id", "mime", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows -> (media_id, frame_ts_ms) sampling plan (pure SQL; the
    actual frame grab is the stubbed decode above)."""
    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * (1 + i % 7)
        rows.append(
            (
                i,
                kind,
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + i % 512 if kind != "audio" else None,
                48 + i % 256 if kind != "audio" else None,
                (i % 30 + 1) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
