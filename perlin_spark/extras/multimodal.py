"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature steps run as Arrow-batched ``mapInPandas`` UDFs.

Decode kernels: uncompressed **BMP (24bpp)**, **WAV (16-bit PCM)**, and
compressed **PNG (8-bit, via stdlib zlib)** are decoded for real
(``decode_bmp`` / ``decode_wav`` / ``decode_png``; public format specs,
no codec libraries needed), so ``deterministic=False`` exercises a true
bytes->pixels/samples->features path end-to-end including a real inflate
+ per-row unfilter.  Remaining compressed formats (JPEG/MP4/...) raise
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


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Compressed PNG -> (H, W, 3) uint8 RGB, pure stdlib zlib + numpy.

    Covers the common web subset: 8-bit depth, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five row
    filters (None/Sub/Up/Average/Paeth).  Alpha is dropped.  Palette and
    interlaced images raise NotImplementedError at the same seam as the
    other codecs.  Reference decoder for correctness — per-row filter
    recurrences run in python, so production plugs a native codec here."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(payload):
        size = int(np.frombuffer(payload, ">u4", 1, pos)[0])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w = int(np.frombuffer(ihdr, ">u4", 1, 0)[0])
    h = int(np.frombuffer(ihdr, ">u4", 1, 4)[0])
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced gray/RGB/GA/RGBA PNG "
            f"(depth={depth}, color={color}, interlace={interlace})"
        )
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: left-pixel recurrence
            cur = row.copy()
            for x in range(channels, stride):
                cur[x] = (cur[x] + cur[x - channels]) & 0xFF
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                ul = prev[x - channels] if x >= channels else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = cur
    img = out.astype(np.uint8).reshape(h, w, channels)
    if color == 0:
        return np.repeat(img, 3, axis=2)
    if color == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3].copy()  # RGB / RGBA minus alpha


def encode_png(rgb: np.ndarray, filters: str = "none") -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes (test synth).  ``filters="mixed"``
    cycles Sub/Up/Average/Paeth per row so roundtrip tests exercise every
    unfilter branch of :func:`decode_png`."""
    import zlib

    h, w, _ = rgb.shape
    stride = w * 3
    rows = rgb.reshape(h, stride).astype(np.int64)
    scan = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = rows[y]
        ft = 0 if filters == "none" else 1 + (y % 4)
        left = np.concatenate([np.zeros(3, np.int64), cur[:-3]])
        ul = np.concatenate([np.zeros(3, np.int64), prev[:-3]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, ul)],
                dtype=np.int64,
            )
            enc = (cur - pred) & 0xFF
        scan.append(ft)
        scan += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, deflate, adaptive, no interlace
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


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
    if mime == "image/png":
        return _image_features(decode_png(payload), dim)
    if mime == "audio/wav":
        return _audio_features(*decode_wav(payload), dim=dim)
    raise NotImplementedError(
        f"no pure-python decoder for {mime!r}; remaining compressed "
        "formats need codec libraries (libjpeg/ffmpeg) — plug a kernel in here"
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
