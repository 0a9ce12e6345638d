"""Pins for the r6 ANN-path optimizations: the vectorized cosine column
must be BIT-identical to the higher-order-function fold (same left-fold
accumulation order), and the driver-side side-table reader must return
exactly what the Spark read returns."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from perlin_spark.extras import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(42)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.cache().count()
    yield df
    df.unpersist()


def test_cosine_vectorized_equals_hof(spark, emb):
    q = [float(x) for x in np.random.default_rng(7).standard_normal(16)]
    # full double scores, every row — not just the x1e4 projection
    hof = emb.select("vec_id", S._cos_col(q, vectorized=False).alias("c")).collect()
    vec = emb.select("vec_id", S._cos_col(q, vectorized=True).alias("c")).collect()
    assert sorted((r["vec_id"], r["c"]) for r in hof) == sorted(
        (r["vec_id"], r["c"]) for r in vec
    )


def test_cosine_topk_vectorized_equals_hof(spark, emb):
    q = [float(x) for x in np.random.default_rng(9).standard_normal(16)]
    a = S.cosine_topk(emb, q, k=10, exclude_id=3, vectorized=False).collect()
    b = S.cosine_topk(emb, q, k=10, exclude_id=3, vectorized=True).collect()
    assert a == b


def test_side_table_reader_matches_spark(spark, emb, tmp_path):
    path = str(tmp_path / "ivf")
    cents = S.write_ivf_cells(emb, path, n_centroids=4)
    got = S.read_ivf_centroids(spark, path)
    assert got == sorted((int(c), [float(x) for x in v]) for c, v in cents)
    spark_rows = sorted(
        (int(r["centroid_id"]), list(r["centroid"]))
        for r in spark.read.parquet(path + "/_centroids").collect()
    )
    assert got == spark_rows


def test_sq_zero_norm_row_does_not_poison_scale(spark):
    rows = [(0, [0.0] * 8)] + [
        (i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    scale = S.sq_scale(df)
    assert np.isfinite(scale) and scale > 0
    clean = spark.createDataFrame(rows[1:], "vec_id long, embedding array<double>")
    assert scale == S.sq_scale(clean)  # the zero row contributes nothing
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in df.select(
            "vec_id", S.sq_codes_col(scale).alias("codes")
        ).collect()
    }
    assert codes[0] == [0] * 8  # zero row -> all-zero codes, not NaN clamp


def test_lmdir_scorer_requires_pc(spark):
    from perlin_spark.query import _ShardScorer

    ops = [{"field": "text", "term": "x", "df": 3, "idf": 1.0, "weight": 1.0,
            "role": "group", "group": 0, "comb": "any", "gsize": 1}]
    with pytest.raises(ValueError, match="_attach_pc"):
        _ShardScorer(1.2, 0.75, 10, True, ops, 1, 0, sim="lmdir")
