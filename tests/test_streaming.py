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
