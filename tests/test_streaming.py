"""Streaming ingestion test: rate-limited file stream -> epochs -> query."""

import time

import pandas as pd
import pytest

from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline, list_epochs, load_index
from perlin_spark.streaming import epoch_sink

SPEC = FieldSpec(field="text", source="text")


def test_stream_to_epochs(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "idx")

    # two files -> (at least) two micro-batches with maxFilesPerTrigger=1
    pd.DataFrame({"doc_id": [0, 1], "text": ["alpha beta", "beta gamma"]}).to_parquet(
        src / "a.parquet"
    )
    pd.DataFrame({"doc_id": [2, 3], "text": ["gamma delta", "alpha delta"]}).to_parquet(
        src / "b.parquet"
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            epoch_sink([SPEC], root, content_col="text", n_shards=2, buckets=2)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    epochs = list_epochs(root)
    assert len(epochs) >= 1
    idx = load_index(spark, root)
    assert idx.n_docs == 4
    eng = PerlinEngine(idx, QueryPipeline(text_spec=SPEC))
    got = [r["doc_id"] for r in eng.search("alpha", k=10).collect()]
    assert got == [0, 3]
    got = [r["doc_id"] for r in eng.search("beta gamma", k=10).collect()]
    assert got == [1]


def test_dedup_stream_cross_batch(spark, tmp_path):
    """Keyed-state streaming dedup: first occurrence per content hash wins
    within AND across micro-batches; later duplicates never surface."""
    from perlin_spark.streaming import dedup_stream

    src = tmp_path / "dsrc"
    src.mkdir()
    # file a: doc 10 and 11 share content "same text"; 12 unique
    pd.DataFrame(
        {"doc_id": [11, 10, 12], "sha": ["s1", "s1", "s2"],
         "text": ["same text", "same text", "uniq one"]}
    ).to_parquet(src / "a.parquet")
    # file b (later batch): s1 again (doc 20), s3 new
    pd.DataFrame(
        {"doc_id": [20, 21], "sha": ["s1", "s3"], "text": ["same text", "uniq two"]}
    ).to_parquet(src / "b.parquet")

    stream = (
        spark.readStream.schema("doc_id long, sha string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream, ["sha"], order_col="doc_id")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = {r["sha"]: r["doc_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0]["n"]
    # NOTE: file-source batch order isn't guaranteed; whichever batch came
    # first, s1 must appear exactly once with the min doc_id of ITS batch
    assert n == 3
    assert rows["s2"] == 12 and rows["s3"] == 21
    assert rows["s1"] in (10, 20)


def test_windowed_doc_stats(spark, tmp_path):
    from perlin_spark.streaming import windowed_doc_stats

    src = tmp_path / "wsrc"
    src.mkdir()
    pd.DataFrame(
        {
            "event_time": pd.to_datetime(
                ["2026-01-01 00:00:10", "2026-01-01 00:00:40", "2026-01-01 00:01:10"]
            ).astype("datetime64[us]"),  # Spark reads micros, not pandas' nanos
            "text": ["a b c", "d e", "f"],
        }
    ).to_parquet(src / "a.parquet")

    stream = spark.readStream.schema("event_time timestamp, text string").parquet(str(src))
    q = (
        windowed_doc_stats(stream, window="1 minute", watermark="2 minutes")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        str(r["window_start"]): (r["n_docs"], r["n_tokens"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got == {
        "2026-01-01 00:00:00": (2, 5),
        "2026-01-01 00:01:00": (1, 1),
    }


def test_stream_compact_every(spark, tmp_path):
    """compact_every folds micro-batch epochs as the stream runs; results
    and replay markers survive compaction (a replayed batch id is still
    recognized as committed via the compacted manifest)."""
    from perlin_spark import compact_epochs, load_index
    from perlin_spark.epochs import _epoch_dir, _read_manifest

    src = tmp_path / "csrc"
    src.mkdir()
    root = str(tmp_path / "cidx")
    for i, texts in enumerate([["alpha beta"], ["beta gamma"], ["alpha delta"]]):
        pd.DataFrame(
            {"doc_id": [i], "text": texts}
        ).to_parquet(src / f"{chr(97 + i)}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            epoch_sink([SPEC], root, content_col="text", n_shards=2, buckets=2,
                       compact_every=2)
        )
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    epochs = list_epochs(root)
    assert len(epochs) <= 2  # compaction folded the stream's epochs
    idx = load_index(spark, root)
    assert idx.n_docs == 3
    eng = PerlinEngine(idx, QueryPipeline(text_spec=SPEC))
    assert [r["doc_id"] for r in eng.search("alpha", k=10).collect()] == [0, 2]
    # every committed batch id is still discoverable post-compaction
    seen: set[int] = set()
    for e in epochs:
        m = _read_manifest(_epoch_dir(root, e))
        if "stream_batch_id" in m:
            seen.add(int(m["stream_batch_id"]))
        seen.update(int(x) for x in m.get("stream_batch_ids", []))
    assert seen == {0, 1, 2}
