"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, fully JVM-side via higher-order
functions (``aggregate``/``zip_with``) — one narrow pass over the
embeddings table, then a k-row ordered take.  Scale paths: (a) LSH
bucketing with deterministic hyperplanes, (b) an IVF index (coarse
nearest-centroid cells + nprobe search); both shrink the candidate set
before exact rescoring and both have a ``partitionBy`` at-rest layout so
queries against the written table scan only probed partitions.  Also
here: embedding-cosine near-duplicate PAIR detection (exact baseline +
LSH-blocked candidate join) for dedup pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _cos_col(query_vec: list[float], vectorized: bool):
    """Cosine-vs-query column for an ``embedding`` array column.

    ``vectorized=True`` evaluates whole Arrow batches in numpy with the
    SAME left-fold accumulation order per dimension as the SQL
    ``aggregate`` fold, so every double is bit-identical to the
    higher-order-function form (pinned by
    ``tests/test_similarity.py::test_cosine_vectorized_equals_hof``) —
    use it for full-table scans (guide §4.2); the interpreted HOF form
    stays for tiny shortlist reranks where a Python stage would cost
    more than it saves."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(np.sum(q * q)))
    if not vectorized:
        qcol = F.array(*[F.lit(float(x)) for x in query_vec])
        return _dot(F.col("embedding"), qcol) / (
            _norm(F.col("embedding")) * F.lit(qn)
        )
    from pyspark.sql.functions import pandas_udf

    dim = len(query_vec)

    @pandas_udf("double")
    def cosf(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="float64")
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in col])
        n = X.shape[0]
        dot = np.zeros(n)
        nrm = np.zeros(n)
        for j in range(dim):  # exact left-fold order, vectorized over rows
            xj = X[:, j]
            dot += xj * q[j]
            nrm += xj * xj
        return pd.Series(dot / (np.sqrt(nrm) * qn))

    return cosf(F.col("embedding"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k: (vec_id, cos_x1e4), best first."""
    cos = _cos_col(query_vec, vectorized)
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


def auto_n_planes(n_vectors: int, target_bucket: int = 128, minimum: int = 4) -> int:
    """Planes sized so the EXPECTED bucket holds ~target_bucket vectors:
    n_planes = log2(n / target).  Grows with the corpus — fixed 16 buckets
    (r1) meant per-bucket scans grew linearly with n."""
    import math

    if n_vectors <= target_bucket:
        return minimum
    return max(minimum, math.ceil(math.log2(n_vectors / target_bucket)))


def probe_buckets(query_vec: list[float], n_planes: int, seed: int = LSH_SEED,
                  probe_hamming: int = 1) -> list[int]:
    """Multiprobe set: the query's bucket plus all buckets within
    ``probe_hamming`` sign flips — the standard recall fix for
    hyperplane LSH (a vector near a plane lands on either side)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qarr = np.asarray(query_vec, dtype=np.float64)
    q = int(sum((1 << i) for i in range(n_planes) if planes[i] @ qarr > 0))
    return sorted({q ^ m for m in probe_masks(n_planes, probe_hamming)})


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    n_planes: int | None = None,
    seed: int = LSH_SEED,
    probe_hamming: int = 1,
    target_bucket: int = 128,
) -> DataFrame:
    """ANN via random-hyperplane LSH with multiprobe: exact cosine
    rescoring inside the query's bucket and its hamming<=``probe_hamming``
    neighbor buckets.  ``n_planes=None`` sizes the table from the corpus
    (one count job at build time).  Deterministic given the seed.

    At rest, write the table once with :func:`write_lsh_buckets` and scan
    with partition pruning instead of recomputing the bucket expression."""
    if n_planes is None:
        n_planes = auto_n_planes(embeddings.count(), target_bucket)
    dim = len(query_vec)
    probes = probe_buckets(query_vec, n_planes, seed, probe_hamming)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_expr(dim, n_planes, seed))
    cands = bucketed.filter(F.col("bucket").isin(probes))
    # pruned candidate scan: interpreted fold (a Python-stage round trip
    # costs more than it saves at probe-set sizes; see _cos_col)
    return cosine_topk(cands, query_vec, k=k, exclude_id=exclude_id,
                       vectorized=False)


def write_lsh_buckets(
    embeddings: DataFrame, path: str, n_planes: int, dim: int, seed: int = LSH_SEED
) -> None:
    """Materialize the LSH table partitioned by bucket — queries against
    the written table read only the probed bucket directories (partition
    pruning), the 100-TB layout for :func:`lsh_topk_from_buckets`."""
    (
        embeddings.withColumn("bucket", lsh_bucket_expr(dim, n_planes, seed))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def lsh_topk_from_buckets(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    n_planes: int = LSH_PLANES,
    seed: int = LSH_SEED,
    probe_hamming: int = 1,
) -> DataFrame:
    """Query a :func:`write_lsh_buckets` table: the bucket filter prunes
    the parquet scan to the probed partitions."""
    probes = probe_buckets(query_vec, n_planes, seed, probe_hamming)
    table = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    return cosine_topk(table, query_vec, k=k, exclude_id=exclude_id,
                       vectorized=False)

# --- embedding-cosine near-duplicate pairs (dedup over an embedding col) --


def _pair_cos(ea, eb):
    # norms ride in as precomputed columns (na/nb): one norm per VECTOR,
    # not one per candidate pair
    return _dot(ea, eb) / (F.col("na") * F.col("nb"))


def embedding_near_pairs_exact(embeddings: DataFrame, threshold: float) -> DataFrame:
    """ALL pairs (vec_a < vec_b) with cosine >= threshold, by brute-force
    self-join — O(n^2), the oracle-able exact baseline (same role as
    ``dedup.ngram_jaccard_pairs``); use :func:`embedding_near_pairs` at
    scale.  Output: (vec_a, vec_b, cos_x1e4), best first."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        _norm(F.col("embedding")).alias("na"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        _norm(F.col("embedding")).alias("nb"),
    )
    cos = _pair_cos(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.floor(F.col("cos") * 10000 + F.lit(0.5)).cast("long").alias("cos_x1e4"),
        )
        .orderBy(F.desc("cos_x1e4"), "vec_a", "vec_b")
    )


def probe_masks(n_planes: int, probe_hamming: int) -> list[int]:
    """All XOR masks with popcount <= probe_hamming over n_planes bits.
    A candidate pair is emitted exactly once (mask = bucket_a ^ bucket_b
    is unique), so the blocked join needs no distinct."""
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(n_planes)]
    if probe_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    if probe_hamming >= 3:
        raise ValueError("probe_hamming > 2 unsupported (mask set explodes)")
    return masks


def embedding_near_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int | None = None,
    seed: int = LSH_SEED,
    probe_hamming: int = 1,
    target_bucket: int = 128,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-blocked: vectors are
    hyperplane-bucketed (seeded constants — deterministic), the a-side is
    expanded to every bucket within ``probe_hamming`` bit flips, pairs
    meet on an equi-join key, and ONLY candidates pay the exact cosine.
    No cross join: cost is sum over buckets of |a-expanded| x |b|.

    Recall is probabilistic (a pair collides iff its buckets differ in
    <= probe_hamming planes); raise ``probe_hamming`` or lower
    ``n_planes`` to trade cost for recall, or use
    :func:`embedding_near_pairs_exact` when the corpus allows O(n^2).
    ``bucket_cap`` bounds the per-bucket join against mega-clusters of
    near-identical vectors (dropped buckets are counted and logged, same
    policy as ``dedup.minhash_lsh_pairs``).  At 100 TB the bucketed table
    would be written ``partitionBy(bucket)`` (see
    :func:`write_lsh_buckets`) so each bucket's join is partition-local.
    Mirrors the reference's duplicate-detection role over an embedding
    column (no reference counterpart — LLM-pipeline extra)."""
    dim = len(embeddings.select("embedding").first()["embedding"])
    if n_planes is None:
        n_planes = auto_n_planes(embeddings.count(), target_bucket)
    bucketed = embeddings.select(
        "vec_id", "embedding", lsh_bucket_expr(dim, n_planes, seed).alias("bucket")
    )
    if bucket_cap is not None:
        import logging

        sizes = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz"))
        dropped = sizes.filter(F.col("_bsz") > bucket_cap).count()
        if dropped:
            logging.getLogger(__name__).warning(
                "embedding_near_pairs: dropping %d buckets over cap=%d "
                "(recall loss on mega near-dup clusters)", dropped, bucket_cap
            )
        bucketed = bucketed.join(
            sizes.filter(F.col("_bsz") <= bucket_cap).select("bucket"), "bucket"
        )
    masks = probe_masks(n_planes, probe_hamming)
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        _norm(F.col("embedding")).alias("na"),
        F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask"),
        F.col("bucket").alias("bucket_a"),
    ).select(
        "vec_a", "ea", "na",
        F.col("bucket_a").bitwiseXOR(F.col("mask")).alias("key"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        _norm(F.col("embedding")).alias("nb"),
        F.col("bucket").alias("key"),
    )
    cos = _pair_cos(F.col("ea"), F.col("eb"))
    return (
        a.join(b, "key")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.floor(F.col("cos") * 10000 + F.lit(0.5)).cast("long").alias("cos_x1e4"),
        )
        .orderBy(F.desc("cos_x1e4"), "vec_a", "vec_b")
    )

# --- IVF (inverted-file) ANN: coarse quantize -> probe cells -> rescore ---


def ivf_centroids(embeddings: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic coarse centroids: the ``n_centroids`` lowest vec_ids.
    A seeded sample keeps the whole pipeline (and its oracle) reproducible,
    but DEGENERATES when low ids are correlated (ingest order often
    clusters similar documents) — off the oracle path the recommended
    default is :func:`build_ann_index`, which refines these with
    :func:`ivf_kmeans_centroids`; the assignment/probe/rescore machinery
    below is unchanged by how centroids are chosen."""
    return embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )


def ivf_cell_expr(centroids: list[tuple[int, list[float]]]):
    """Column: nearest-centroid id (max cosine, ties to the LOWEST
    centroid_id) for the ``embedding`` column.  The centroid table is tiny
    (K rows, collected driver-side), so the argmax is inlined as a pure
    map-side expression — assignment is a narrow pass, NO shuffle and no
    join, exactly like :func:`lsh_bucket_expr`."""
    en = _norm(F.col("embedding"))
    scored = []
    for cid, vec in centroids:
        c = F.array(*[F.lit(float(x)) for x in vec])
        cn = float(np.sqrt(np.sum(np.asarray(vec, dtype=np.float64) ** 2)))
        cos = _dot(F.col("embedding"), c) / (en * F.lit(cn))
        scored.append(
            F.struct(
                cos.alias("cos"),
                F.lit(-cid).cast("long").alias("neg_cid"),
                F.lit(cid).cast("long").alias("cid"),
            )
        )
    # struct comparison is field-order lexicographic: cos, then -cid
    return F.array_max(F.array(*scored))["cid"]


def _collect_centroids(embeddings: DataFrame, n_centroids: int) -> list[tuple[int, list[float]]]:
    rows = ivf_centroids(embeddings, n_centroids).collect()
    return sorted((r["centroid_id"], list(r["centroid"])) for r in rows)


def ivf_cell_udf(centroids: list[tuple[int, list[float]]]):
    """Arrow-batched nearest-centroid assignment: one normalized matmul
    per batch against the K x dim centroid matrix riding the closure.
    Same semantics as :func:`ivf_cell_expr` (max cosine, ties to lowest
    centroid_id — numpy argmax returns the first maximum), but the plan
    stays tiny: the inlined-literal expression costs Catalyst ~K x dim
    literals of analysis PER QUERY, which dominates latency beyond a
    handful of centroids."""
    from pyspark.sql.functions import pandas_udf

    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    C = np.array([vec for _, vec in centroids], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("long")
    def assign(emb: pd.Series) -> pd.Series:
        if not len(emb):
            return pd.Series([], dtype="int64")
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        best = np.argmax(Xn @ Cn.T, axis=1)  # first max = lowest cid on tie
        return pd.Series(cids[best])

    return assign


def ivf_probe_cells(
    query_vec: list[float], centroids: list[tuple[int, list[float]]], nprobe: int
) -> list[int]:
    """The ``nprobe`` centroid cells nearest the query (cosine desc, id
    asc) — computed driver-side on the K-row centroid list."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())
    scored = []
    for cid, vec in centroids:
        c = np.asarray(vec, dtype=np.float64)
        scored.append((-(c @ q) / (np.sqrt((c * c).sum()) * qn), cid))
    scored.sort()
    return sorted(cid for _, cid in scored[:nprobe])


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    exclude_id: int | None = None,
) -> DataFrame:
    """ANN via an inverted-file (IVF) index: coarse-quantize every vector
    to its nearest centroid cell (map-only expression), probe the
    ``nprobe`` cells nearest the query, and pay exact cosine only inside
    probed cells.  Expected scan fraction ~ nprobe / n_centroids.

    At rest, materialize cells once with :func:`write_ivf_cells` and
    query with :func:`ivf_topk_from_cells` (partition-pruned scans)."""
    cents = _collect_centroids(embeddings, n_centroids)
    probes = ivf_probe_cells(query_vec, cents, nprobe)
    assign = ivf_cell_udf(cents)
    cands = embeddings.withColumn("cell", assign(F.col("embedding"))).filter(
        F.col("cell").isin(probes)
    )
    return cosine_topk(cands, query_vec, k=k, exclude_id=exclude_id,
                       vectorized=False)


def write_ivf_cells(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF table partitioned by cell; returns the centroid
    list and ALSO persists it as a ``_centroids`` parquet side table under
    ``path`` (the underscore prefix keeps it invisible to the cell scan's
    partition discovery).  The index is therefore self-describing: a
    restarted query service reopens it with :func:`ivf_topk_from_cells`
    alone — no in-memory centroid list to re-derive.  The 100-TB layout:
    each query reads only nprobe cell directories.  Pass ``centroids``
    (e.g. from :func:`ivf_kmeans_centroids`) to use refined cells instead
    of the seeded sample."""
    cents = centroids if centroids is not None else _collect_centroids(
        embeddings, n_centroids
    )
    assign = ivf_cell_udf(cents)
    (
        embeddings.withColumn("cell", assign(F.col("embedding")))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    write_centroids_table(embeddings.sparkSession, path, cents)
    return cents


def _read_side_table(spark, path: str) -> list[dict]:
    """Rows of a TINY index side table (_centroids/_codebooks/meta) —
    read driver-side with pyarrow when the path is plain-filesystem
    reachable, falling back to a Spark read otherwise.  These tables are
    index METADATA (a few KB by construction); a serving process should
    open them without scheduling a cluster job — each cold-reopen query
    was paying one ~100 ms Spark job per side table just to fetch them
    (r6 measurement)."""
    try:
        import pyarrow.parquet as _pq

        return _pq.read_table(path).to_pylist()
    except Exception:
        return [r.asDict() for r in spark.read.parquet(path).collect()]


def read_ivf_centroids(spark, path: str) -> list[tuple[int, list[float]]]:
    """Load the centroid side table written by :func:`write_ivf_cells`."""
    rows = _read_side_table(spark, path.rstrip("/") + "/_centroids")
    return sorted((int(r["centroid_id"]), list(r["centroid"])) for r in rows)


def ivf_topk_from_cells(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]] | None,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    exclude_id: int | None = None,
) -> DataFrame:
    """Query a :func:`write_ivf_cells` table: the cell filter prunes the
    parquet scan to the probed partitions.  ``centroids=None`` loads the
    persisted ``_centroids`` side table (fresh-process reopen)."""
    if centroids is None:
        centroids = read_ivf_centroids(spark, path)
    probes = ivf_probe_cells(query_vec, centroids, nprobe)
    table = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    # pruned-cell scan: interpreted fold (see _cos_col rationale)
    return cosine_topk(table, query_vec, k=k, exclude_id=exclude_id,
                       vectorized=False)


def ivf_kmeans_centroids(
    embeddings: DataFrame, n_centroids: int, iters: int = 5
) -> list[tuple[int, list[float]]]:
    """Refine the seeded sample centroids with Lloyd iterations, entirely
    as DataFrame ops: assign (Arrow-batched matmul, no shuffle) ->
    per-(cell, dimension) mean via posexplode (one shuffle per
    iteration).  Deterministic: init is :func:`ivf_centroids` (lowest
    vec_ids) and every step is a pure aggregation.  Returns the centroid
    list for :func:`ivf_topk`-style probing via
    :func:`write_ivf_cells`/:func:`ivf_topk_from_cells`.

    Dimensions are aggregation ROWS (``posexplode``), not plan columns —
    a 4k-dim embedding costs 4k x K aggregate rows, never 4k Catalyst
    expressions (the wide-agg plan stalls the optimizer beyond ~1k dims).
    Empty cells keep their previous centroid (standard Lloyd handling).
    Cost per iteration is one narrow pass + one (cell, pos)-keyed shuffle
    — at 100 TB you would sample the assignment input; the structure is
    unchanged."""
    cents = _collect_centroids(embeddings, n_centroids)
    dim = len(cents[0][1])
    for _ in range(iters):
        assigned = embeddings.select(
            "embedding", ivf_cell_udf(cents)(F.col("embedding")).alias("cell")
        )
        means = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        acc: dict[int, dict[int, float]] = {}
        for r in means:
            acc.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["m"])
        new = dict(cents)
        for cid, d in acc.items():
            new[cid] = [d[i] for i in range(dim)]
        cents = sorted(new.items())
    return [(cid, list(vec)) for cid, vec in cents]


# --- Product Quantization (PQ): compressed codes + ADC scoring -------------
#
# The ANN memory/IO story at 100 TB: unit-normalized vectors are split
# into M subspaces, each quantized to one of KS per-subspace centroids, so
# a vector becomes M small codes (M bytes at KS<=256) instead of dim
# floats — a 300 TB fp32 embedding corpus scans as ~2 TB of codes.  A
# query builds an M x KS inner-product lookup table driver-side and each
# row's approximate cosine is M table lookups (ADC) — pure JVM
# expressions here, no Python on the scoring path.  Compose with the IVF
# cells layout for probe-then-ADC-then-rerank serving.

PQ_M = 8    # subspaces
PQ_KS = 16  # centroids per subspace


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)


def pq_codebooks(
    embeddings: DataFrame, m: int = PQ_M, ks: int = PQ_KS
) -> np.ndarray:
    """(m, ks, dim//m) codebooks from the ``ks`` lowest vec_ids'
    unit-normalized sub-vectors — the same deterministic seeding as
    :func:`ivf_centroids`, so the whole PQ pipeline is oracle-derivable.
    Same caveat too: correlated low ids make poor codebooks, so off the
    oracle path the recommended default is :func:`build_ann_index`
    (k-means refinement via :func:`pq_kmeans_codebooks`)."""
    rows = sorted(
        (int(r["vec_id"]), list(r["embedding"]))
        for r in embeddings.filter(F.col("vec_id") < ks).collect()
    )
    X = _normalize_rows(np.array([v for _, v in rows], dtype=np.float64))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack([X[:, i * dsub : (i + 1) * dsub] for i in range(m)])


def pq_encode_udf(codebooks: np.ndarray):
    """Arrow-batched encoder: embedding -> array<int> of ``m`` codes
    (nearest sub-centroid by L2 on the unit-normalized vector; ties to
    the lowest code, numpy argmin first-match)."""
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(codebooks)  # (m, ks, dsub)
    m, ks, dsub = C.shape

    @pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        if not len(emb):
            return pd.Series([], dtype="object")
        X = _normalize_rows(
            np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
        )
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for i in range(m):
            sub = X[:, i * dsub : (i + 1) * dsub]          # (B, dsub)
            d2 = (
                (sub * sub).sum(1, keepdims=True)
                - 2.0 * (sub @ C[i].T)
                + (C[i] * C[i]).sum(1)
            )                                              # (B, ks)
            codes[:, i] = np.argmin(d2, axis=1)
        return pd.Series([c.tolist() for c in codes])

    return encode


#: above this many LUT entries the inlined-literal expression is replaced
#: by an Arrow UDF — m*ks literals cost Catalyst analysis PER QUERY and
#: stall the planner in the thousands (the same blowup the IVF cell
#: assignment hit with inlined centroids)
ADC_INLINE_MAX = 512


def pq_adc_score_col(codebooks: np.ndarray, query_vec: list[float]):
    """Column: ADC approximate cosine for a ``codes`` column.

    Small LUTs (m*ks <= ADC_INLINE_MAX, the 8x16 default) inline the
    query's per-subspace inner products as literals, so scoring is
    JVM-side ``aggregate`` over m lookups — no UDF, whole-stage codegen
    eligible.  Larger configurations (e.g. ks=256 production codebooks)
    ship the LUT in an Arrow UDF closure instead: one numpy take+sum per
    batch, and the plan stays tiny."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    m, ks, dsub = codebooks.shape
    lut = np.stack(
        [codebooks[i] @ qn[i * dsub : (i + 1) * dsub] for i in range(m)]
    )  # (m, ks)
    if m * ks <= ADC_INLINE_MAX:
        lut_col = F.array(
            *[F.array(*[F.lit(float(v)) for v in row]) for row in lut]
        )
        return F.aggregate(
            F.zip_with(
                lut_col,
                F.col("codes"),
                lambda row, code: F.element_at(row, code + F.lit(1)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        if not len(codes):
            return pd.Series([], dtype="float64")
        C = np.asarray([np.asarray(c, dtype=np.int64) for c in codes])  # (B, m)
        return pd.Series(lut[np.arange(m), C].sum(axis=1))

    return adc(F.col("codes"))


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = PQ_M,
    ks: int = PQ_KS,
    codebooks: np.ndarray | None = None,
    rerank: int | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """PQ ANN: encode -> ADC top-k (vec_id, cos_x1e4).  ``rerank=N``
    takes the top N by ADC and rescores them with exact cosine (the
    standard serving shape; ADC alone is an approximation of the
    normalized inner product)."""
    cb = codebooks if codebooks is not None else pq_codebooks(embeddings, m, ks)
    encode = pq_encode_udf(cb)
    coded = embeddings.withColumn("codes", encode(F.col("embedding")))
    return pq_topk_from_codes(
        coded, cb, query_vec, k=k, rerank=rerank, exclude_id=exclude_id
    )


def pq_topk_from_codes(
    coded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    rerank: int | None = None,
    exclude_id: int | None = None,
) -> DataFrame:
    """Query a (vec_id, codes[, embedding]) table: ADC scan over codes
    only; with ``rerank`` the shortlist joins back exact cosine (requires
    the ``embedding`` column)."""
    if rerank is not None and "embedding" not in coded.columns:
        raise ValueError(
            "rerank needs the 'embedding' column in the codes table "
            "(write_ivf_pq_cells keep_embeddings=True, or join a vector "
            "store onto the shortlist); pass rerank=None for ADC-only"
        )
    scored = coded.withColumn("adc", pq_adc_score_col(codebooks, query_vec))
    if exclude_id is not None:
        scored = scored.filter(F.col("vec_id") != exclude_id)
    if rerank is None:
        return (
            scored.orderBy(F.desc("adc"), F.asc("vec_id"))
            .limit(k)
            .select(
                "vec_id",
                F.floor(F.col("adc") * 10000 + F.lit(0.5)).cast("long").alias("cos_x1e4"),
            )
        )
    shortlist = scored.orderBy(F.desc("adc"), F.asc("vec_id")).limit(rerank)
    # rerank-sized input (tens of rows): the interpreted fold beats a
    # Python-stage round trip there, so vectorized=False
    return cosine_topk(
        shortlist.select("vec_id", "embedding"), query_vec, k=k,
        exclude_id=exclude_id, vectorized=False,
    )


def write_pq_codes(
    embeddings: DataFrame,
    path: str,
    m: int = PQ_M,
    ks: int = PQ_KS,
    codebooks: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the PQ table (vec_id, codes) + a ``_codebooks`` parquet
    side table (self-describing, like :func:`write_ivf_cells`).  The
    at-rest win IS the compression: the scan reads m ints per vector,
    never the embedding floats."""
    cb = codebooks if codebooks is not None else pq_codebooks(embeddings, m, ks)
    encode = pq_encode_udf(cb)
    (
        embeddings.select("vec_id", encode(F.col("embedding")).alias("codes"))
        .write.mode("overwrite")
        .parquet(path)
    )
    write_codebooks_table(embeddings.sparkSession, path, cb)
    return cb


def read_pq_codebooks(spark, path: str) -> np.ndarray:
    """Load the codebook side table written by :func:`write_pq_codes`."""
    rows = _read_side_table(spark, path.rstrip("/") + "/_codebooks")
    m = 1 + max(int(r["m"]) for r in rows)
    ks = 1 + max(int(r["code"]) for r in rows)
    dsub = len(rows[0]["centroid"])
    cb = np.zeros((m, ks, dsub), dtype=np.float64)
    for r in rows:
        cb[int(r["m"]), int(r["code"])] = np.asarray(r["centroid"], dtype=np.float64)
    return cb


def pq_kmeans_codebooks(
    embeddings: DataFrame, m: int = PQ_M, ks: int = PQ_KS, iters: int = 5
) -> np.ndarray:
    """Refine the seeded codebooks with per-subspace Lloyd iterations,
    driver-side over a collected SAMPLE of normalized vectors (PQ training
    is classically a sampled computation; the cluster-scale work is
    encode/scan, not training).  Deterministic: seeded init + argmin
    first-match assignment."""
    cb = pq_codebooks(embeddings, m, ks)
    # deterministic sample: an unordered limit() depends on partition
    # order and would contradict the determinism contract above
    sample = embeddings.orderBy("vec_id").limit(10000).collect()
    X = _normalize_rows(
        np.array([list(r["embedding"]) for r in sample], dtype=np.float64)
    )
    dsub = cb.shape[2]
    for i in range(m):
        sub = np.ascontiguousarray(X[:, i * dsub : (i + 1) * dsub])
        C = cb[i].copy()
        for _ in range(iters):
            d2 = (sub * sub).sum(1, keepdims=True) - 2.0 * (sub @ C.T) + (C * C).sum(1)
            a = np.argmin(d2, axis=1)
            for j in range(ks):
                pts = sub[a == j]
                if len(pts):
                    C[j] = pts.mean(0)
        cb[i] = C
    return cb


# --- IVF + PQ composition: the billion-scale serving shape -----------------

def write_centroids_table(spark, path: str, cents: list[tuple[int, list[float]]]) -> None:
    """Persist the ``_centroids`` side table (underscore dir: invisible
    to partition discovery) beside a cell layout."""
    (
        spark.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in cents],
            "centroid_id long, centroid array<double>",
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(path.rstrip("/") + "/_centroids")
    )


def write_codebooks_table(spark, path: str, cb: np.ndarray) -> None:
    """Persist the ``_codebooks`` side table beside a codes layout."""
    mm, kk, _ = cb.shape
    (
        spark.createDataFrame(
            [(i, j, [float(x) for x in cb[i, j]]) for i in range(mm) for j in range(kk)],
            "m int, code int, centroid array<double>",
        )
        .coalesce(1).write.mode("overwrite")
        .parquet(path.rstrip("/") + "/_codebooks")
    )


def write_ivf_pq_cells(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = PQ_M,
    ks: int = PQ_KS,
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: np.ndarray | None = None,
    keep_embeddings: bool = True,
):
    """Materialize cell-partitioned PQ codes: a query prunes to nprobe
    cell directories AND scans only m ints per vector there; the original
    embedding column is kept (``keep_embeddings``) for exact rerank of
    the shortlist — drop it when a separate vector store serves rerank.
    Both index artifacts (_centroids, _codebooks) persist alongside, so
    :func:`ivf_pq_topk_from_cells` reopens the index cold."""
    cents = centroids if centroids is not None else _collect_centroids(
        embeddings, n_centroids
    )
    cb = codebooks if codebooks is not None else pq_codebooks(embeddings, m, ks)
    cols = ["vec_id", "codes"] + (["embedding"] if keep_embeddings else [])
    (
        embeddings
        .withColumn("cell", ivf_cell_udf(cents)(F.col("embedding")))
        .withColumn("codes", pq_encode_udf(cb)(F.col("embedding")))
        .select(*cols, "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    spark = embeddings.sparkSession
    write_centroids_table(spark, path, cents)
    write_codebooks_table(spark, path, cb)
    return cents, cb


def build_ann_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = PQ_M,
    ks: int = PQ_KS,
    ivf_iters: int = 5,
    pq_iters: int = 5,
    keep_embeddings: bool = True,
):
    """The RECOMMENDED way to build the composed IVF+PQ serving index:
    k-means-refined centroids (:func:`ivf_kmeans_centroids`) and
    codebooks (:func:`pq_kmeans_codebooks`) instead of the raw
    lowest-vec_id seeds, then :func:`write_ivf_pq_cells`.  The seeded
    variants exist for ORACLE derivability (a SQL engine can reproduce
    them bit-for-bit); they degenerate when low ids are correlated
    (e.g. ingest order clusters similar documents), while Lloyd
    refinement spreads centroids over the actual data distribution —
    recall-tested against the seeded build in
    ``tests/test_extras.py::test_build_ann_index_refined_recall``.

    Training is deterministic (seeded init, argmin first-match) and
    sampled driver-side (classic ANN practice: training is small, the
    cluster-scale work is encode + scan).  Returns (centroids,
    codebooks); query with :func:`ivf_pq_topk_from_cells` (cold reopen
    supported via the persisted side tables)."""
    cents = ivf_kmeans_centroids(embeddings, n_centroids, iters=ivf_iters)
    cb = pq_kmeans_codebooks(embeddings, m=m, ks=ks, iters=pq_iters)
    return write_ivf_pq_cells(
        embeddings,
        path,
        n_centroids=n_centroids,
        m=m,
        ks=ks,
        centroids=cents,
        codebooks=cb,
        keep_embeddings=keep_embeddings,
    )


def ivf_pq_topk_from_cells(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    rerank: int | None = 50,
    exclude_id: int | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: np.ndarray | None = None,
    predicate=None,
) -> DataFrame:
    """Query a :func:`write_ivf_pq_cells` table: partition-pruned scan of
    nprobe cells -> JVM ADC over the codes column -> optional exact
    rerank.  With ``centroids``/``codebooks`` omitted the persisted side
    tables are loaded (fresh-process reopen).

    ``predicate`` (a Column over the stored table's columns) makes this
    FILTERED vector search — the serving shape behind "top-k similar
    WHERE <metadata>": the predicate is applied inside the pruned scan
    (Catalyst pushes simple comparisons into the parquet reader), so
    filtered-out rows are never ADC-scored and the shortlist is drawn
    from qualifying rows only — no post-filtering recall loss at the
    final k."""
    if centroids is None:
        centroids = read_ivf_centroids(spark, path)
    if codebooks is None:
        codebooks = read_pq_codebooks(spark, path)
    probes = ivf_probe_cells(query_vec, centroids, nprobe)
    table = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    if predicate is not None:
        table = table.filter(predicate)
    return pq_topk_from_codes(
        table, codebooks, query_vec, k=k, rerank=rerank, exclude_id=exclude_id
    )


# --- int8 scalar quantization (Lucene-style SQ with exact rerank) ----------
#
# The third ANN family next to LSH and IVF+PQ: every L2-normalized vector
# is quantized to int8 codes under ONE global scale, the candidate pass
# ranks by the integer dot product (4x less scan I/O than float32, and
# at rest the codes table is the compact serving layout), and the final
# top-k is an EXACT cosine rerank over k*rerank candidates — so
# quantization error can only cost recall inside the rerank window,
# never wrong scores in the output.  The quantizer is pinned for oracle
# parity: code_i = clamp(floor(x_i / (nrm * scale) + 0.5), -127, 127)
# with scale = max over rows of (max |x_i| / nrm) / 127.
#
# 100-TB shape: the scale is one aggregate (computed once at index
# build, stored with the codes); the candidate pass is a narrow scan of
# the codes column only; rerank joins the full vectors for k*rerank ids.

SQ_MAXQ = 127.0
SQ_RERANK = 4


def sq_scale(embeddings: DataFrame, col: str = "embedding") -> float:
    """The global quantization scale: max normalized component magnitude
    over the whole table, divided by 127.  One Spark aggregate.

    Zero-norm rows are guarded (``greatest(nrm, 1e-30)``): without it a
    single all-zero embedding makes its normalized component NaN, and
    because the scale is a global max aggregate, one bad row would poison
    the quantizer for the ENTIRE table (r5 ADVICE).  A zero row's
    guarded contribution is 0/1e-30 = 0 — it never sets the max — and
    any nonzero row's norm is far above the floor, so real inputs are
    bit-unchanged."""
    comp_max = F.aggregate(
        F.transform(F.col(col), lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    nrm = F.greatest(_norm(F.col(col)), F.lit(1e-30))
    row = embeddings.agg(F.max(comp_max / nrm).alias("m")).collect()[0]
    return float(row["m"]) / SQ_MAXQ


def sq_codes_col(scale: float, col: str = "embedding"):
    """int8 code array column under the pinned quantizer (codes kept as
    int — parquet stores them narrow; arithmetic back in double is exact
    for any |code| <= 127 and dim <= 2^38).  Zero-norm rows quantize to
    all-zero codes via the same ``greatest(nrm, 1e-30)`` guard as
    :func:`sq_scale` instead of NaN garbage (r5 ADVICE); nonzero rows
    are bit-unchanged."""
    nrm = F.greatest(_norm(F.col(col)), F.lit(1e-30))
    return F.transform(
        F.col(col),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x.cast("double") / (nrm * F.lit(float(scale))) + F.lit(0.5)),
            ),
        ).cast("int"),
    )


def sq_quantize_query(query_vec: list[float], scale: float) -> list[int]:
    """Driver-side twin of sq_codes_col for the query vector."""
    v = np.asarray(query_vec, dtype=np.float64)
    nrm = float(np.sqrt(np.sum(v * v)))
    q = np.floor(v / (nrm * scale) + 0.5)
    return [int(x) for x in np.clip(q, -127, 127)]


def sq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    rerank: int = SQ_RERANK,
    scale: float | None = None,
) -> DataFrame:
    """Scalar-quantized ANN: int8-dot candidate ranking (k*rerank wide,
    deterministic (dot desc, vec_id asc) cut) + exact cosine rerank ->
    (vec_id, cos_x1e4), best first."""
    if scale is None:
        scale = sq_scale(embeddings)
    qcodes = sq_quantize_query(query_vec, scale)
    qc = F.array(*[F.lit(c) for c in qcodes])
    approx = F.aggregate(
        F.zip_with(sq_codes_col(scale), qc,
                   lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    base = embeddings
    if exclude_id is not None:
        base = base.filter(F.col("vec_id") != exclude_id)
    cand = (
        base.select("vec_id", "embedding", approx.alias("adot"))
        .orderBy(F.desc("adot"), F.asc("vec_id"))
        .limit(k * rerank)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn))
    return (
        cand.select("vec_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select(
            "vec_id",
            F.floor(F.col("cos") * 10000 + F.lit(0.5)).cast("long").alias("cos_x1e4"),
        )
    )


def write_sq_codes(
    embeddings: DataFrame, path: str, scale: float | None = None
) -> float:
    """Persist the compact SQ serving layout: codes table (vec_id +
    int8 codes — the only thing the candidate pass scans) and a one-row
    meta table carrying the scale.  Returns the scale."""
    if scale is None:
        scale = sq_scale(embeddings)
    spark = embeddings.sparkSession
    embeddings.select(
        "vec_id", sq_codes_col(scale).alias("codes")
    ).write.mode("overwrite").parquet(path + "/codes")
    spark.createDataFrame([(float(scale),)], "scale double").write.mode(
        "overwrite"
    ).parquet(path + "/meta")
    return scale


def sq_topk_from_codes(
    spark,
    path: str,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
    rerank: int = SQ_RERANK,
) -> DataFrame:
    """Serve from the written layout: scan ONLY the codes table for the
    candidate pass (narrow int8 columns), then join the full vectors for
    the k*rerank survivors and rerank exactly."""
    scale = float(_read_side_table(spark, path + "/meta")[0]["scale"])
    codes = spark.read.parquet(path + "/codes")
    qcodes = sq_quantize_query(query_vec, scale)
    qc = F.array(*[F.lit(c) for c in qcodes])
    approx = F.aggregate(
        F.zip_with(F.col("codes"), qc,
                   lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    if exclude_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_id)
    cand = (
        codes.select("vec_id", approx.alias("adot"))
        .orderBy(F.desc("adot"), F.asc("vec_id"))
        .limit(k * rerank)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn))
    return (
        embeddings.join(F.broadcast(cand), "vec_id")
        .select("vec_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
        .select(
            "vec_id",
            F.floor(F.col("cos") * 10000 + F.lit(0.5)).cast("long").alias("cos_x1e4"),
        )
    )
