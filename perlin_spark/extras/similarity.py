"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, fully JVM-side via higher-order
functions (``aggregate``/``zip_with``) — one narrow pass over the
embeddings table, then a k-row ordered take.  Scale path: LSH bucketing
with deterministic hyperplanes so the candidate set shrinks to the query's
bucket (+ optional hamming-1 probes) before exact rescoring; at 100 TB the
bucket table would be written partitioned by ``bucket`` for partition
pruning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

LSH_PLANES = 4  # 16 buckets; scale by log2(n_vectors / target_bucket_size)
LSH_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, exclude_id: int | None = None
) -> DataFrame:
    """Brute-force cosine top-k: (vec_id, cos_x1e4), best first."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn))
    out = embeddings.select("vec_id", cos.alias("cos"))
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return (
        out.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select(
            "vec_id",
            F.floor(F.col("cos") * 10000 + F.lit(0.5)).cast("long").alias("cos_x1e4"),
        )
    )


def _hyperplanes(dim: int, n_planes: int = LSH_PLANES, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(dim: int, n_planes: int = LSH_PLANES, seed: int = LSH_SEED):
    """Column: sign-of-hyperplane bucket id for the `embedding` column."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col("embedding"), plane) > 0).cast("long")
        bucket = bucket + bit * (1 << i)
    return bucket


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    n_planes: int = LSH_PLANES,
    seed: int = LSH_SEED,
) -> DataFrame:
    """ANN via random-hyperplane LSH: exact rescoring inside the query's
    bucket only.  Approximate (bucket may truncate recall); deterministic
    given the seed."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qarr = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(sum((1 << i) for i in range(n_planes) if planes[i] @ qarr > 0))
    bucketed = embeddings.withColumn("bucket", lsh_bucket_expr(dim, n_planes, seed))
    cands = bucketed.filter(F.col("bucket") == qbucket)
    return cosine_topk(cands, query_vec, k=k, exclude_id=exclude_id)
