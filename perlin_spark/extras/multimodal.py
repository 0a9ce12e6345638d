"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature steps run as Arrow-batched ``mapInPandas`` UDFs.

Decode kernels: uncompressed **BMP (24bpp)**, **WAV (16-bit PCM)**,
compressed **PNG (8-bit, stdlib zlib)**, and **baseline JPEG (T.81
sequential DCT, 4:4:4)** are decoded for real (``decode_bmp`` /
``decode_wav`` / ``decode_png`` / ``decode_jpeg``; public format specs,
no codec libraries needed), so ``deterministic=False`` exercises a true
bytes->pixels/samples->features path end-to-end including a real inflate
+ unfilter and a real Huffman + dequantize + IDCT.  Video containers
(MP4/...) raise NotImplementedError at the same seam — that is where
ffmpeg plugs in on a real cluster — and ``deterministic=True``
substitutes a seeded fake decode for payloads of any format
(reproducible tests).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
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


# --- baseline JPEG (ITU-T T.81 public spec; pure python/numpy) -------------
#
# Scope: baseline sequential DCT, 8-bit, YCbCr (or grayscale), NO chroma
# subsampling (4:4:4), no restart intervals, no progressive — the encoder
# below emits exactly this subset and the decoder reads quantization and
# Huffman tables FROM the stream (DQT/DHT segments), so any conformant
# baseline 4:4:4 JPEG decodes, not just our own.  Reference decoder for
# correctness (python per-block loops); production plugs libjpeg here.

# zigzag scan: anti-diagonals, alternating direction (T.81 figure A.6)
_ZIGZAG: list[int] = []
for _s in range(15):
    _rows = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rows if _s % 2 else reversed(list(_rows))):
        _ZIGZAG.append(_r * 8 + (_s - _r))

# Annex K example tables (used by the ENCODER only; the decoder reads
# whatever tables the stream carries)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32, dtype=np.int64).reshape(8, 8)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II basis: F = M B Mt, B = Mt F M
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): val -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= length
        val = (self.acc >> self.n) & ((1 << length) - 1)
        return val

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JPEG bytes (4:4:4, Annex K
    tables).  Lossy: roundtrip error is bounded by the quantization
    tables (smooth images land within a few levels per channel)."""
    h, w, _ = rgb.shape
    x = rgb.astype(np.float64)
    y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    cb = -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2] + 128.0
    cr = 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2] + 128.0
    planes = [y, cb, cr]
    qts = [_QT_LUMA, _QT_CHROMA, _QT_CHROMA]
    dc_tabs = [_huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
               _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
               _huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_tabs = [_huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
               _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
               _huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    bh, bw = (h + 7) // 8, (w + 7) // 8
    # edge-replicate pad to full blocks
    planes = [
        np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge") for p in planes
    ]
    bw_writer = _BitWriter()
    pred = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for c in range(3):
                blk = planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT_M @ blk @ _DCT_M.T
                q = np.round(coef / qts[c]).astype(np.int64)
                zz = q.flatten()[_ZIGZAG]
                diff = int(zz[0]) - pred[c]
                pred[c] = int(zz[0])
                s = _category(diff)
                code, length = dc_tabs[c][s]
                bw_writer.write(code, length)
                if s:
                    v = diff if diff >= 0 else diff + (1 << s) - 1
                    bw_writer.write(v, s)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_tabs[c][0xF0]
                        bw_writer.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_tabs[c][(run << 4) | s]
                    bw_writer.write(code, length)
                    bw_writer.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, length = ac_tabs[c][0x00]  # EOB
                    bw_writer.write(code, length)
    entropy = bw_writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(v) for v in qt.flatten()[_ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + dqt(0, _QT_LUMA) + dqt(1, _QT_CHROMA)
        + sof
        + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        + sos
        + entropy
        + b"\xff\xd9"
    )


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (H, W, 3) uint8 RGB, pure python/numpy.

    Reads quantization and Huffman tables from the stream (DQT/DHT), so
    any conformant baseline sequential 4:4:4 (or grayscale) JPEG
    decodes.  Progressive (SOF2), subsampled chroma, arithmetic coding,
    and restart intervals raise NotImplementedError at the same seam as
    the other codecs."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab)
    scan_comps: list[tuple[int, int, int]] = []  # (id, dc_tid, ac_tid)
    entropy = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise NotImplementedError("only 8-bit quantization tables")
                zz = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                qt = np.zeros(64, np.int64)
                qt[_ZIGZAG] = zz
                qtabs[tid] = qt.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                codes = _huff_codes(bits, vals)
                htabs[(cls, tid)] = {(ln, c): v for v, (c, ln) in codes.items()}
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
            sof = body
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (got SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            if int.from_bytes(body[:2], "big"):
                raise NotImplementedError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS: header then entropy-coded data
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * j], body[2 + 2 * j] >> 4, body[2 + 2 * j] & 0xF)
                for j in range(ns)
            ]
            # strip byte stuffing; stop at the next real marker
            raw = bytearray()
            while pos < len(payload) - 1:
                b = payload[pos]
                if b == 0xFF:
                    nxt = payload[pos + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        pos += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        raise NotImplementedError("JPEG restart markers not supported")
                    break
                raw.append(b)
                pos += 1
            entropy = bytes(raw)
    if sof is None or entropy is None:
        raise ValueError("missing SOF/SOS segment")
    if sof[0] != 8:
        raise NotImplementedError("only 8-bit JPEG samples")
    h = int.from_bytes(sof[1:3], "big")
    w = int.from_bytes(sof[3:5], "big")
    nc = sof[5]
    if nc not in (1, 3):
        raise NotImplementedError(f"only 1- or 3-component JPEG (got {nc})")
    for j in range(nc):
        cid, samp, qtid = sof[6 + 3 * j : 9 + 3 * j]
        if samp != 0x11:
            raise NotImplementedError("only 4:4:4 (no chroma subsampling)")
        comps.append((cid, samp, qtid))
    dc_for = {cid: dcid for cid, dcid, _ in scan_comps}
    ac_for = {cid: acid for cid, _, acid in scan_comps}
    br = _BitReader(entropy)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8), np.float64) for _ in range(nc)]
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            for c, (cid, _samp, qtid) in enumerate(comps):
                dct = htabs[(0, dc_for[cid])]
                act = htabs[(1, ac_for[cid])]
                zz = np.zeros(64, np.int64)
                s = br.read_huff(dct)
                diff = _extend(br.read(s), s) if s else 0
                pred[c] += diff
                zz[0] = pred[c]
                i = 1
                while i < 64:
                    sym = br.read_huff(act)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad JPEG AC symbol")
                        i += 16  # ZRL
                        continue
                    i += run
                    if i > 63:
                        raise ValueError("JPEG AC run overflow")
                    zz[i] = _extend(br.read(size), size)
                    i += 1
                # de-zigzag: zz[k] belongs at flat position _ZIGZAG[k]
                q = np.zeros(64, np.int64)
                q[_ZIGZAG] = zz
                coef = q.reshape(8, 8) * qtabs[qtid]
                blk = _DCT_M.T @ coef @ _DCT_M + 128.0
                planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


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


def _fourcc(b: bytes) -> bytes:
    return b.ljust(4)[:4]


def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """RGB frames -> a minimal MJPEG-in-AVI container (test synth).

    Motion-JPEG is the one mainstream video codec that is just a RIFF
    wrapper around per-frame baseline JPEGs, so the r4 JPEG codec gives a
    REAL end-to-end video decode with no new entropy coding.  Layout:
    RIFF('AVI ') / LIST('hdrl': 'avih' + LIST('strl': 'strh','strf')) /
    LIST('movi': one '00dc' chunk per frame)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    jpegs = [encode_jpeg(f) for f in frames]
    usec = int(round(1_000_000 / fps))

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return _fourcc(cid) + np.uint32(len(body)).tobytes() + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", _fourcc(kind) + body)

    avih = np.zeros(14, dtype="<u4")
    avih[0] = usec                      # dwMicroSecPerFrame
    avih[4] = len(frames)               # dwTotalFrames
    avih[6] = 1                         # dwStreams
    avih[8], avih[9] = w, h
    strh = (
        b"vids" + b"MJPG" + np.zeros(2, "<u4").tobytes()  # flags, prio/lang
        + np.uint32(0).tobytes()        # initial frames
        + np.uint32(1).tobytes()        # scale
        + np.uint32(fps).tobytes()      # rate (rate/scale = fps)
        + np.uint32(0).tobytes()        # start
        + np.uint32(len(frames)).tobytes()
        + np.uint32(max(len(j) for j in jpegs)).tobytes()
        + np.uint32(0xFFFFFFFF).tobytes()  # quality
        + np.uint32(0).tobytes()        # samplesize
        + np.array([0, 0, w, h], "<u2").tobytes()  # rcFrame
    )
    strf = (
        np.array([40, w, h], "<u4").tobytes()
        + np.array([1, 24], "<u2").tobytes()
        + b"MJPG"
        + np.array([w * h * 3, 0, 0, 0, 0], "<u4").tobytes()
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih.tobytes())
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + np.uint32(len(body)).tobytes() + body


def decode_avi_mjpeg(payload: bytes) -> tuple[list, float]:
    """MJPEG-in-AVI -> (list of RGB frame arrays, fps).

    Tolerant RIFF walk: frames are every '00dc'/'00db' chunk inside the
    'movi' LIST, each a baseline JPEG (decoded by :func:`decode_jpeg`);
    fps comes from the 'avih' dwMicroSecPerFrame.  Non-MJPEG AVIs hit
    decode_jpeg's marker check and raise there — the codec seam."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    usec = 0
    frames: list = []

    def walk(lo: int, hi: int) -> None:
        nonlocal usec
        pos = lo
        while pos + 8 <= hi:
            cid = payload[pos : pos + 4]
            size = int(np.frombuffer(payload, "<u4", 1, pos + 4)[0])
            body_lo = pos + 8
            if cid == b"LIST":
                walk(body_lo + 4, body_lo + size)  # skip the list-kind fourcc
            elif cid == b"avih":
                usec = int(np.frombuffer(payload, "<u4", 1, body_lo)[0])
            elif cid[2:4] in (b"dc", b"db") and size:
                frames.append(decode_jpeg(payload[body_lo : body_lo + size]))
            pos = body_lo + size + (size & 1)

    walk(12, 8 + int(np.frombuffer(payload, "<u4", 1, 4)[0]))
    if not frames:
        raise ValueError("no video frames ('00dc'/'00db') in AVI")
    fps = 1_000_000 / usec if usec else 0.0
    return frames, fps


def _video_features(frames: list, fps: float, dim: int = FEATURE_DIM) -> np.ndarray:
    """Aggregate per-frame image features + temporal motion energy."""
    f = np.zeros(dim, dtype=np.float32)
    f[0] = 3.0  # modality tag: video
    f[1] = np.log1p(fps)
    f[2] = np.log1p(len(frames))
    per = np.stack([_image_features(fr, dim) for fr in frames])
    f[3:13] = per[:, 3:13].mean(axis=0)
    if len(frames) > 1:
        lum = [
            (fr.astype(np.float32) / 255.0)
            @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
            for fr in frames
        ]
        f[13] = float(
            np.mean([np.abs(a - b).mean() for a, b in zip(lum[1:], lum[:-1])])
        )
    return f


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
    if mime == "image/jpeg":
        return _image_features(decode_jpeg(payload), dim)
    if mime == "audio/wav":
        return _audio_features(*decode_wav(payload), dim=dim)
    if mime in ("video/x-msvideo", "video/avi"):
        frames, fps = decode_avi_mjpeg(payload)
        return _video_features(frames, fps, dim)
    raise NotImplementedError(
        f"no pure-python decoder for {mime!r}; inter-frame codecs "
        "(h264/vp9/av1 in mp4/webm) need ffmpeg-class libraries — plug a "
        "kernel in here (MJPEG-in-AVI is decoded natively above)"
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


# --------------------------------------------------------------------------
# Perceptual image hashing (pHash) -> near-duplicate detection
# --------------------------------------------------------------------------
#
# The classic DCT perceptual hash (public algorithm: grayscale, area-average
# to 32x32, 2D DCT-II, threshold the low-frequency block at its median).
# 60 bits instead of the textbook 64 so the hash is a non-negative BIGINT
# and feeds ``dedup.simhash_near_pairs`` -- the exact pigeonhole-blocked
# Hamming join -- unchanged.  Image near-dup detection at 100 TB is then:
# one Arrow decode pass -> (media_id, 60-bit hash) -> d+1 equi-joins.

PHASH_BITS = 60
_PHASH_GRID = 32  # resize target; 8x8 low-frequency DCT block is hashed


def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho')."""
    k = np.arange(n, dtype=np.float64)
    d = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    d *= np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_DCT32 = _dct_mat(_PHASH_GRID)


def _resize_axis(a: np.ndarray, out: int, axis: int) -> np.ndarray:
    """Exact area-average downsample (integral via reduceat) when the axis
    is >= ``out`` px; nearest-neighbor upsample otherwise.  Deterministic,
    interpolation-library-free."""
    n = a.shape[axis]
    if n >= out:
        bounds = (np.arange(out) * n) // out
        sums = np.add.reduceat(a, bounds, axis=axis)
        counts = np.diff(np.append(bounds, n)).astype(np.float64)
        shape = [1, 1]
        shape[axis] = out
        return sums / counts.reshape(shape)
    idx = (np.arange(out) * n) // out
    return np.take(a, idx, axis=axis)


def phash(rgb: np.ndarray, bits: int = PHASH_BITS) -> int:
    """60-bit perceptual hash of an (h, w, 3) uint8 image.

    Row-major low-frequency 8x8 DCT coefficients, DC dropped, first
    ``bits`` thresholded at their median -> stable under small pixel
    noise, re-encoding, and resize; far in Hamming space for distinct
    images."""
    lum = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_axis(_resize_axis(lum, _PHASH_GRID, 0), _PHASH_GRID, 1)
    coef = _DCT32 @ small @ _DCT32.T
    low = coef[:8, :8].ravel()[1:bits + 1]  # drop DC, keep `bits` coeffs
    med = np.median(low)
    h = 0
    for i, c in enumerate(low):
        if c > med:
            h |= 1 << i
    return h


def image_phash(
    media: DataFrame, deterministic: bool = True, bits: int = PHASH_BITS
) -> DataFrame:
    """image rows -> (media_id, phash) via one Arrow decode pass.

    ``deterministic=True`` hashes seeded fake pixels derived from the
    payload bytes (any format, reproducible -- the same contract as
    :func:`extract_features`); ``deterministic=False`` decodes BMP/PNG/
    JPEG payloads for real."""

    def fake_pixels(payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                if not str(mime).startswith("image/"):
                    continue
                buf = bytes(payload)
                if deterministic:
                    rgb = fake_pixels(buf)
                elif mime == "image/bmp":
                    rgb = decode_bmp(buf)
                elif mime == "image/png":
                    rgb = decode_png(buf)
                elif mime == "image/jpeg":
                    rgb = decode_jpeg(buf)
                else:
                    raise NotImplementedError(f"no image decoder for {mime!r}")
                ids.append(mid)
                hashes.append(phash(rgb, bits))
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return media.select("media_id", "mime", "payload").mapInPandas(
        run, "media_id long, phash long"
    )


def phash_near_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    hashes: DataFrame | None = None,
    deterministic: bool = True,
) -> DataFrame:
    """EXACT image near-duplicate pairs: (media_a, media_b, hamming) with
    Hamming(phash) <= ``max_hamming``.  Candidate generation reuses the
    text-dedup pigeonhole machinery (guaranteed recall; every candidate
    verified with the true ``bit_count(xor)``), so the result equals the
    brute-force self-join without ever materializing it."""
    from perlin_spark.extras import dedup

    sigs = hashes if hashes is not None else image_phash(media, deterministic)
    sigs = sigs.select(
        F.col("media_id").alias("doc_id"), F.col("phash").alias("simhash")
    )
    pairs = dedup.simhash_near_pairs(None, max_hamming=max_hamming, sigs=sigs)
    return pairs.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )


# --------------------------------------------------------------------------
# Audio fingerprinting -> near-duplicate detection
# --------------------------------------------------------------------------
#
# Haitsma & Kalker's robust audio fingerprint (public literature: "A
# Highly Robust Audio Fingerprinting System", ISMIR 2002), collapsed to a
# single 60-bit clip hash: sign of the time-and-band double difference of
# log band energies over a 13-frame x 6-band grid.  Log + double-diff
# cancels global gain, so the hash is amplitude-invariant by
# construction; the same pigeonhole Hamming join serves audio near-dup.

AHASH_BITS = 60
_AHASH_FRAMES = 13   # -> 12 time derivatives
_AHASH_BANDS = 6     # -> 5 band derivatives; 12 * 5 = 60 bits


def audio_fingerprint(samples: np.ndarray, rate: int) -> int:
    """60-bit fingerprint of (n, channels) int16 PCM.

    Frames the clip into 13 equal segments, takes log energy in 6
    log-spaced bands (2%..45% of the sample rate), and emits the sign of
    the (time, band) double difference -- gain-invariant, stable under
    small additive noise, far in Hamming space for distinct clips."""
    mono = samples.astype(np.float64).reshape(samples.shape[0], -1).mean(axis=1)
    n = mono.size
    if n < _AHASH_FRAMES * 2:  # degenerate clip: hash the length only
        return n % (1 << AHASH_BITS)
    edges_hz = np.geomspace(0.02 * rate, 0.45 * rate, _AHASH_BANDS + 1)
    frames = np.array_split(mono, _AHASH_FRAMES)
    e = np.zeros((_AHASH_FRAMES, _AHASH_BANDS))
    for fi, fr in enumerate(frames):
        spec = np.abs(np.fft.rfft(fr)) ** 2
        freqs = np.fft.rfftfreq(fr.size, d=1.0 / rate)
        for bi in range(_AHASH_BANDS):
            m = (freqs >= edges_hz[bi]) & (freqs < edges_hz[bi + 1])
            e[fi, bi] = np.log1p(spec[m].sum())
    band_diff = e[:, :-1] - e[:, 1:]            # 13 x 5
    dd = band_diff[1:] - band_diff[:-1]          # 12 x 5
    h = 0
    for i, v in enumerate(dd.ravel()):
        if v > 0:
            h |= 1 << i
    return h


def audio_hash(media: DataFrame, deterministic: bool = True) -> DataFrame:
    """audio rows -> (media_id, ahash) via one Arrow decode pass.  The
    ``deterministic`` contract mirrors :func:`image_phash`: True hashes
    seeded fake samples derived from the payload; False decodes WAV."""

    def fake_samples(payload: bytes) -> tuple:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(-2000, 2000, size=(2048, 1)).astype(np.int16), 8000

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                if not str(mime).startswith("audio/"):
                    continue
                buf = bytes(payload)
                if deterministic:
                    samples, rate = fake_samples(buf)
                elif mime == "audio/wav":
                    samples, rate = decode_wav(buf)
                else:
                    raise NotImplementedError(f"no audio decoder for {mime!r}")
                ids.append(mid)
                hashes.append(audio_fingerprint(samples, rate))
            yield pd.DataFrame({"media_id": ids, "ahash": hashes})

    return media.select("media_id", "mime", "payload").mapInPandas(
        run, "media_id long, ahash long"
    )


def ahash_near_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    hashes: DataFrame | None = None,
    deterministic: bool = True,
) -> DataFrame:
    """EXACT audio near-duplicate pairs (media_a, media_b, hamming) --
    the audio twin of :func:`phash_near_pairs`, over the same
    pigeonhole-blocked Hamming join."""
    from perlin_spark.extras import dedup

    sigs = hashes if hashes is not None else audio_hash(media, deterministic)
    sigs = sigs.select(
        F.col("media_id").alias("doc_id"), F.col("ahash").alias("simhash")
    )
    pairs = dedup.simhash_near_pairs(None, max_hamming=max_hamming, sigs=sigs)
    return pairs.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        "hamming",
    )
