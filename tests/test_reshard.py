"""reshard_index: shard-count migration by posting-blob surgery — search
results, df/stats, and blob bytes must be invariants."""

import pytest
from pyspark.sql import functions as F

from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline
from perlin_spark.build import reshard_index

QUERIES = ["hash join", "scan", "vector stream", "dup"]


def _build(spark, n_shards=8):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spec = FieldSpec(field="text", source="text")
    return PerlinEngine.build(
        spark, docs, [spec],
        pipeline=QueryPipeline(text_spec=spec), n_shards=n_shards,
    )


def _results(eng, prune=True):
    out = {}
    for q in QUERIES:
        out[q] = [(r["doc_id"], r["score"])
                  for r in eng.search(q, k=20, prune=prune).collect()]
    return out


def test_reshard_search_identical(spark):
    """Resharding 8 -> 3 and 8 -> 16 leaves every ranking byte-identical
    (scores exact, both scorer paths), df totals and stats unchanged."""
    eng = _build(spark, n_shards=8)
    want = _results(eng)
    base_df = {(r["field"], r["term"]): r["df"]
               for r in eng.index.vocabulary.collect()}
    base_stats = eng.index.stats_map()

    for n_new in (3, 16):
        idx2 = reshard_index(eng.index, n_new)
        assert idx2.n_shards == n_new
        eng2 = PerlinEngine(index=idx2, pipeline=eng.pipeline)
        assert _results(eng2) == want, n_new
        assert _results(eng2, prune=False) == want, n_new
        got_df = {(r["field"], r["term"]): r["df"]
                  for r in idx2.vocabulary.collect()}
        assert got_df == base_df, n_new
        assert idx2.stats_map() == base_stats, n_new
        shards = [r["s"] for r in
                  idx2.postings.select(F.col("shard").alias("s")).distinct().collect()]
        assert all(0 <= s < n_new for s in shards), (n_new, shards)


def test_reshard_same_count_passthrough_and_errors(spark):
    """Same shard count -> every blob passes through byte-identical (the
    no-split fast path covers 100%); bad inputs refuse loudly."""
    eng = _build(spark, n_shards=4)
    idx2 = reshard_index(eng.index, 4)
    key = ["field", "term", "shard"]
    a = {tuple(r[c] for c in key): bytes(r["blob"])
         for r in eng.index.postings.collect()}
    b = {tuple(r[c] for c in key): bytes(r["blob"])
         for r in idx2.postings.collect()}
    assert a == b

    with pytest.raises(ValueError, match="n_shards"):
        reshard_index(eng.index, 0)


def test_reshard_carries_tombstones_and_refuses_positions(spark):
    eng = _build(spark, n_shards=4)
    hit0 = eng.search("scan", k=1).collect()[0]["doc_id"]
    eng.index.set_deleted(
        eng.index.spark.createDataFrame([(int(hit0),)], "doc_id long")
    )
    idx2 = reshard_index(eng.index, 9)
    eng2 = PerlinEngine(index=idx2, pipeline=eng.pipeline)
    got = [r["doc_id"] for r in eng2.search("scan", k=10).collect()]
    assert hit0 not in got and got

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spec = FieldSpec(field="text", source="text")
    engp = PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=4, positions=True,
    )
    with pytest.raises(ValueError, match="positional sidecar"):
        reshard_index(engp.index, 8)
