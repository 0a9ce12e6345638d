"""r6 pin: IndexData.stats_map's driver-side decode (over the
dl_broadcast blobs) must be value-identical to the stats-frame path it
replaced on the broadcastable-index fast path."""

from pyspark.sql import functions as F

from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline


def test_stats_map_driver_path_equals_frame_path(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=4
    ).cache()
    idx = eng.index
    fast = idx.stats_map()
    assert idx._dl_bc not in (None, False)  # took the driver-side path
    frame = {
        r["field"]: {
            "n_docs": int(r["n_docs"]),
            "avgdl": float(r["avgdl"]),
            "mindl": int(r["mindl"]),
            "total_terms": int(r["total_terms"]),
        }
        for r in idx.stats.collect()
    }
    assert fast == frame
    # and the search path still works end-to-end off the fast stats
    assert len(eng.search("hash join", k=5).collect()) == 5
    eng.index.unpersist()
