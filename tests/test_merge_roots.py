"""Multi-root federation (load_index over a list of roots) and physical
cross-root merging (merge_roots — the Lucene addIndexes shape):
shard-built indexes must serve and merge identically to one build."""

import pytest

from perlin_spark import (
    FieldSpec,
    PerlinEngine,
    QueryPipeline,
    build_epoch,
    delete_docs,
    list_epochs,
    load_index,
    merge_roots,
)
from perlin_spark.build import build_index
from perlin_spark.epochs import _epoch_dir, _read_manifest
from perlin_spark.fixtures import GOLDEN_EXTRA_DOCS, golden_corpus
from perlin_spark.analysis import reference_specs

from tests.test_epochs import _postings_set

PL = QueryPipeline(
    text_spec=FieldSpec(field="text", source="text", stem=True,
                        number_field="number")
)


def _two_roots(spark, tmp_path):
    root_a = str(tmp_path / "shard_a")
    root_b = str(tmp_path / "shard_b")
    build_epoch(spark, golden_corpus(spark), reference_specs(), root_a,
                n_shards=2, buckets=4)
    extra = spark.createDataFrame(
        GOLDEN_EXTRA_DOCS, "doc_id long, title string, text string"
    )
    build_epoch(spark, extra, reference_specs(), root_b, n_shards=2, buckets=4)
    return root_a, root_b


def test_multi_root_load_federates(spark, tmp_path):
    """load_index([A, B]) == one build over the union corpus — global
    df/idf/avgdl, no data movement."""
    root_a, root_b = _two_roots(spark, tmp_path)
    fed = load_index(spark, [root_a, root_b])
    single = build_index(
        spark, golden_corpus(spark, extra=True), reference_specs(), n_shards=2
    )
    assert fed.n_docs == single.n_docs
    assert _postings_set(fed) == _postings_set(single)
    eng_f = PerlinEngine(fed, PL)
    eng_s = PerlinEngine(single, PL)
    for q in ("10", "deimos phobos", "125"):
        got = [(r["doc_id"], pytest.approx(r["score"]))
               for r in eng_f.search(q, k=10).collect()]
        want = [(r["doc_id"], r["score"]) for r in eng_s.search(q, k=10).collect()]
        assert got == want


def test_multi_root_load_rejects_overlapping_ids(spark, tmp_path):
    root_a = str(tmp_path / "dup_a")
    root_b = str(tmp_path / "dup_b")
    for r in (root_a, root_b):   # both start at doc_id 0
        build_epoch(spark, golden_corpus(spark), reference_specs(), r,
                    n_shards=2, buckets=4)
    with pytest.raises(ValueError, match="overlap"):
        load_index(spark, [root_a, root_b])


def test_multi_root_load_rejects_layout_mismatch(spark, tmp_path):
    root_a = str(tmp_path / "lay_a")
    root_b = str(tmp_path / "lay_b")
    build_epoch(spark, golden_corpus(spark), reference_specs(), root_a,
                n_shards=2, buckets=4)
    extra = spark.createDataFrame(
        GOLDEN_EXTRA_DOCS, "doc_id long, title string, text string"
    )
    build_epoch(spark, extra, reference_specs(), root_b, n_shards=2, buckets=8)
    with pytest.raises(ValueError, match="uniform layout"):
        load_index(spark, [root_a, root_b])


def test_merge_roots_physical_merge(spark, tmp_path):
    """merge_roots == one build over the union corpus; sources untouched;
    lineage recorded."""
    root_a, root_b = _two_roots(spark, tmp_path)
    out = str(tmp_path / "merged")
    new_epoch = merge_roots(spark, [root_a, root_b], out)
    assert list_epochs(out) == [new_epoch]
    merged = load_index(spark, out)
    single = build_index(
        spark, golden_corpus(spark, extra=True), reference_specs(), n_shards=2
    )
    assert merged.n_docs == single.n_docs
    assert _postings_set(merged) == _postings_set(single)
    # compaction consumed the adopted epochs but the manifest keeps lineage
    m = _read_manifest(_epoch_dir(out, new_epoch))
    assert m.get("compacted_from") == [0, 1]
    # sources still serve independently
    assert list_epochs(root_a) == [0] and list_epochs(root_b) == [0]
    assert PerlinEngine(load_index(spark, root_a), PL).search("deimos", k=5).count() > 0


def test_merge_roots_carries_tombstones(spark, tmp_path):
    root_a, root_b = _two_roots(spark, tmp_path)
    delete_docs(spark, root_a, [2])
    out = str(tmp_path / "merged_del")
    merge_roots(spark, [root_a, root_b], out)
    eng = PerlinEngine(load_index(spark, out), PL)
    hits = {r["doc_id"] for r in eng.search("deimos", k=10).collect()}
    assert 2 not in hits


def test_merge_roots_guards(spark, tmp_path):
    root_a, root_b = _two_roots(spark, tmp_path)
    with pytest.raises(ValueError, match="at least two"):
        merge_roots(spark, [root_a], str(tmp_path / "x"))
    with pytest.raises(ValueError, match="source roots"):
        merge_roots(spark, [root_a, root_b], root_b)
    dup = str(tmp_path / "dup_src")
    build_epoch(spark, golden_corpus(spark), reference_specs(), dup,
                n_shards=2, buckets=4)
    with pytest.raises(ValueError, match="overlap"):
        merge_roots(spark, [root_a, dup], str(tmp_path / "y"))


def test_merge_indexes_job(spark, tmp_path, capsys):
    """The spark-submit merge job wires merge_roots end-to-end."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import merge_indexes as job

    root_a, root_b = _two_roots(spark, tmp_path)
    out = str(tmp_path / "job_merged")
    assert job.main(["--inputs", root_a, root_b, "--output", out]) == 0
    assert "merged 2 roots" in capsys.readouterr().out
    eng = PerlinEngine(load_index(spark, out), PL)
    assert eng.index.n_docs == 6
    assert eng.search("10", k=10).count() > 0
