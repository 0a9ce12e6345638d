"""Percolator (reverse search): registered queries matched against docs.

Matching semantics: conjunctive by default (every analyzed query term
present in the doc), ``min_match=m`` for at-least-m; both sides run the
SAME analyzer the index build uses (query-pipeline parity)."""

import pandas as pd
import pytest

from perlin_spark import FieldSpec, percolate
from perlin_spark.percolate import analyzed_term_pairs

SPEC = FieldSpec(field="text", source="text")


@pytest.fixture(scope="module")
def perc_frames(spark):
    docs = spark.createDataFrame(
        [(0, "Alpha beta gamma"), (1, "alpha beta"), (2, "alpha"),
         (3, "delta epsilon"), (4, "beta delta")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(10, "alpha beta"), (11, "delta"), (12, "alpha zzz"), (13, "")],
        "query_id long, query string",
    )
    return docs, qs


def test_percolate_conjunctive(perc_frames):
    docs, qs = perc_frames
    rows = [(r["doc_id"], r["query_id"])
            for r in percolate(qs, docs, SPEC).collect()]
    # q10 'alpha beta' -> docs 0 (case-normalized) and 1; q11 'delta' -> 3,4;
    # q12 has an unmatched term -> nothing; q13 empty -> nothing
    assert rows == [(0, 10), (1, 10), (3, 11), (4, 11)]


def test_percolate_min_match(perc_frames):
    docs, qs = perc_frames
    rows = percolate(qs, docs, SPEC, min_match=1).collect()
    got = {(r["doc_id"], r["query_id"]) for r in rows}
    # OR semantics: q12 'alpha zzz' now fires on every alpha doc
    assert {(0, 12), (1, 12), (2, 12)} <= got
    assert all(r["n_matched"] >= 1 for r in rows)
    # q13 (zero analyzed terms) still matches nothing
    assert not any(q == 13 for _, q in got)
    with pytest.raises(ValueError, match="min_match"):
        percolate(qs, docs, SPEC, min_match=0)


def test_percolate_shuffle_join_parity(perc_frames):
    """broadcast_queries=False must produce the identical match set."""
    docs, qs = perc_frames
    a = {(r["doc_id"], r["query_id"])
         for r in percolate(qs, docs, SPEC).collect()}
    b = {(r["doc_id"], r["query_id"])
         for r in percolate(qs, docs, SPEC, broadcast_queries=False).collect()}
    assert a == b


def test_analyzed_term_pairs_distinct(spark):
    """Repeated terms collapse to one (id, term) pair; analyzer parity
    with the build pipeline (lowercase + whitespace)."""
    df = spark.createDataFrame([(7, "Beta beta BETA gamma")],
                               "doc_id long, text string")
    rows = {(r["doc_id"], r["term"])
            for r in analyzed_term_pairs(df, SPEC).collect()}
    assert rows == {(7, "beta"), (7, "gamma")}


def test_percolate_stream(spark, tmp_path):
    """Alerting: percolate each micro-batch inside foreachBatch — cost
    linear in NEW docs only."""
    src = tmp_path / "src"
    src.mkdir()
    out_dir = str(tmp_path / "alerts")
    pd.DataFrame({"doc_id": [0, 1], "text": ["alpha beta", "delta"]}).to_parquet(
        src / "a.parquet"
    )
    pd.DataFrame({"doc_id": [2], "text": ["beta alpha gamma"]}).to_parquet(
        src / "b.parquet"
    )
    qs = spark.createDataFrame([(10, "alpha beta"), (11, "delta")],
                               "query_id long, query string")

    def fire(batch_df, batch_id):
        percolate(qs, batch_df, SPEC).write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(fire)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r["doc_id"], r["query_id"])
           for r in spark.read.parquet(out_dir).collect()}
    assert got == {(0, 10), (1, 11), (2, 10)}
