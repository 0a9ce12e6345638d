"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature steps run as Arrow-batched ``mapInPandas`` UDFs.
The decode kernels themselves are STUBBED (codec libraries are not in this
container): ``deterministic=True`` substitutes a seeded fake decode so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is
real and testable; ``deterministic=False`` raises NotImplementedError at
the decode site, marking exactly where a real libjpeg/ffmpeg kernel plugs
in.
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


def extract_features(media: DataFrame, deterministic: bool = True) -> DataFrame:
    """binary payload -> fixed-dim feature vector, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for payload in pdf["payload"]:
                buf = bytes(payload)
                if deterministic:
                    feats.append(_fake_decode(buf).tolist())
                else:
                    raise NotImplementedError(
                        "real image/audio decode requires codec libraries "
                        "not present in this container; plug a kernel in here"
                    )
                sizes.append(len(buf))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "n_bytes": sizes}
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


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
