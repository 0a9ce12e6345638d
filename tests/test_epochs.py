"""Epoch commit / resume / multi-epoch union tests (SURVEY.md §5 item 6)."""

import numpy as np
import pandas as pd
import pytest

from perlin_spark import (
    FieldSpec,
    PerlinEngine,
    QueryPipeline,
    build_epoch,
    build_index,
    compact_epochs,
    delete_docs,
    list_epochs,
    load_index,
)
from perlin_spark import codec
from perlin_spark.analysis import reference_specs
from perlin_spark.fixtures import (
    GOLDEN_DOCS,
    GOLDEN_EXTRA_DOCS,
    GOLDEN_FREQUENT_NUMBER,
    golden_corpus,
)

SPEC = FieldSpec(field="text", source="text")


def _postings_set(index) -> set:
    rows = index.postings.select("field", "term", "blob").collect()
    out = set()
    for r in rows:
        docs, tfs = codec.decode_postings(bytes(r["blob"]))
        for d, t in zip(docs.tolist(), tfs.tolist()):
            out.add((r["field"], r["term"], d, t))
    return out


def test_epoch_build_and_load(spark, tmp_path):
    root = str(tmp_path / "idx")
    corpus = golden_corpus(spark)
    e = build_epoch(spark, corpus, reference_specs(), root, n_shards=2, buckets=4)
    assert e == 0 and list_epochs(root) == [0]
    idx = load_index(spark, root)
    eng = PerlinEngine(idx, QueryPipeline(
        text_spec=FieldSpec(field="text", source="text", stem=True, number_field="number")))
    got = [r["doc_id"] for r in eng.search("deimos phobos", k=10).collect()]
    assert got == [2]


def test_two_epoch_union_matches_single_build(spark, tmp_path):
    """commit(); add_document(...); commit() — queries see the union
    (src/document_index.rs:179-188)."""
    root = str(tmp_path / "idx2")
    build_epoch(spark, golden_corpus(spark), reference_specs(), root,
                n_shards=2, buckets=4)
    extra = spark.createDataFrame(
        GOLDEN_EXTRA_DOCS, "doc_id long, title string, text string"
    )
    build_epoch(spark, extra, reference_specs(), root, n_shards=2, buckets=4)
    assert list_epochs(root) == [0, 1]

    union = load_index(spark, root)
    single = build_index(
        spark, golden_corpus(spark, extra=True), reference_specs(), n_shards=2
    )
    assert _postings_set(union) == _postings_set(single)

    # golden frequent_terms over the union
    got = [(r["df"], r["term"]) for r in union.frequent_terms("number", 3).collect()]
    assert got == GOLDEN_FREQUENT_NUMBER

    # cross-epoch conjunctive query still exact
    eng = PerlinEngine(union, QueryPipeline(
        text_spec=FieldSpec(field="text", source="text", stem=True, number_field="number")))
    assert [r["doc_id"] for r in eng.search("flew", k=10).collect()] == [0, 1, 2]


def test_resume_after_kill_is_identical(spark, tmp_path):
    """Kill mid-merge -> rerun -> same index as an uninterrupted build."""
    corpus = golden_corpus(spark)
    root_a = str(tmp_path / "killed")
    with pytest.raises(RuntimeError, match="simulated kill"):
        build_epoch(spark, corpus, reference_specs(), root_a,
                    n_shards=2, buckets=4, bucket_batches=4, fail_after_batches=1)
    assert list_epochs(root_a) == []  # not committed
    # resume: same call, no fail hook
    e = build_epoch(spark, corpus, reference_specs(), root_a,
                    n_shards=2, buckets=4, bucket_batches=4)
    assert e == 0 and list_epochs(root_a) == [0]

    root_b = str(tmp_path / "clean")
    build_epoch(spark, corpus, reference_specs(), root_b, n_shards=2, buckets=4)
    assert _postings_set(load_index(spark, root_a)) == _postings_set(load_index(spark, root_b))


def test_add_field_on_live_index(spark, tmp_path):
    """Runtime add_field (src/field/mod.rs:74-96): a new named field over
    existing docs, duplicate rejected, cross-field query shard-consistent."""
    from perlin_spark.epochs import add_field

    root = str(tmp_path / "af")
    build_epoch(spark, golden_corpus(spark), reference_specs(), root,
                n_shards=2, buckets=4)
    extra = spark.createDataFrame(
        GOLDEN_EXTRA_DOCS, "doc_id long, title string, text string"
    )
    build_epoch(spark, extra, reference_specs(), root, n_shards=2, buckets=4)

    # add an unstemmed "raw" view of text as a brand-new field
    e = add_field(spark, root, [FieldSpec(field="raw", source="text", stem=False)])
    assert e == 2 and list_epochs(root) == [0, 1, 2]

    idx = load_index(spark, root)
    assert {s.field for s in idx.specs} >= {"text", "title", "raw"}
    assert idx.n_docs == 6  # field epoch does not double-count docs
    eng = PerlinEngine(idx, QueryPipeline(text_spec=FieldSpec(field="raw", source="text")))
    got = [r["doc_id"] for r in eng.search("unicorns", k=10).collect()]
    assert got == [2]
    # cross-field conjunction old+new stays shard-local and exact
    from perlin_spark.analysis import QuerySpec

    q = QuerySpec(groups=(("raw", "all", ("flew",)), ("text", "all", ("bird",))))
    got = sorted(r["doc_id"] for r in eng.search(q, k=10).collect())
    assert got == [0, 1]

    # duplicate field name rejected (reference panics; we raise)
    with pytest.raises(ValueError, match="already exists"):
        add_field(spark, root, [FieldSpec(field="raw", source="text")])


def test_manifest_lineage(spark, tmp_path):
    import json
    import os

    root = str(tmp_path / "lineage")
    build_epoch(spark, golden_corpus(spark), reference_specs(), root,
                n_shards=2, buckets=4)
    with open(os.path.join(root, "epoch=0", "manifest.json")) as f:
        m = json.load(f)
    assert m["n_docs"] == 3
    assert all(b["status"] == "done" for b in m["buckets"].values())
    # posting_count lineage equals an independent recount
    idx = load_index(spark, root)
    total_rows = idx.postings.count() + idx.doc_lens.count()
    assert sum(b["rows"] for b in m["buckets"].values()) == total_rows
    assert m["params"]["k1"] == 1.2 and m["params"]["b"] == 0.75


def test_compact_epochs_preserves_results(spark, tmp_path):
    """Three epochs (two doc batches + one add_field) compact into ONE
    epoch with identical search results, summed stats, and the inputs
    deleted; a crash between commit and cleanup cannot double-count
    (list_epochs skips compacted_from)."""
    import pandas as pd

    from perlin_spark import (
        FieldSpec, PerlinEngine, QueryPipeline, add_field, build_epoch,
        compact_epochs, list_epochs, load_index,
    )

    root = str(tmp_path / "cidx")
    spec = FieldSpec(field="text", source="text")
    b1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["alpha beta", "beta gamma"],
                      "title": ["t one", "t two"]})
    )
    b2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2, 3], "text": ["gamma delta alpha", "alpha delta"],
                      "title": ["t three", "t four"]})
    )
    build_epoch(spark, b1, [spec], root, content_col="text", n_shards=2, buckets=2)
    build_epoch(spark, b2, [spec], root, content_col="text", n_shards=2, buckets=2)
    add_field(spark, root, [FieldSpec(field="title", source="title")])
    assert list_epochs(root) == [0, 1, 2]

    pl = QueryPipeline(text_spec=spec)
    eng = PerlinEngine(load_index(spark, root), pl)
    before = {
        q: [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
        for q in ["alpha", "beta gamma", "delta"]
    }
    before_stats = eng.index.stats_map()

    new_e = compact_epochs(spark, root)
    assert new_e == 3
    assert list_epochs(root) == [3]
    import os
    assert not os.path.exists(os.path.join(root, "epoch=0"))

    idx = load_index(spark, root)
    eng2 = PerlinEngine(idx, pl)
    after = {
        q: [(r["doc_id"], r["score"]) for r in eng2.search(q, k=10).collect()]
        for q in ["alpha", "beta gamma", "delta"]
    }
    assert after == before
    assert eng2.index.stats_map() == before_stats
    assert idx.n_docs == 4
    # the added field survives compaction
    got = [r["doc_id"] for r in eng2.search(
        "three", k=10,
        pipeline=QueryPipeline(text_spec=FieldSpec(field="title", source="title")),
    ).collect()]
    assert got == [2]
    # idempotent no-op on a single epoch
    assert compact_epochs(spark, root) is None


def test_compact_epochs_groups_straddling_arrow_batches(spark, tmp_path):
    """r2 verdict defect #1: with small Arrow batches
    (maxRecordsPerBatch=32) a (bucket, field, term, shard) splice group
    straddles batch boundaries; per-batch grouping would emit it as TWO
    rows and the scorer would lose postings.  600 terms x 2 epochs give
    >=500 groups, each with one row per epoch, so nearly every batch
    boundary lands inside a group.  Asserts BOTH the storage invariant
    (one row per group key after compaction — catches the splice bug even
    though the scorer now also merges duplicate-key blobs) and full
    search/postings identity before vs after."""
    from perlin_spark import compact_epochs

    root = str(tmp_path / "cbatch")
    spec = FieldSpec(field="text", source="text")
    terms = [f"t{i:03d}" for i in range(600)]

    def batch(offset):
        rows = [
            (offset + i, " ".join(t for j, t in enumerate(terms) if j % 20 == i))
            for i in range(20)
        ]
        return spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
        )

    build_epoch(spark, batch(0), [spec], root, n_shards=2, buckets=2)
    build_epoch(spark, batch(20), [spec], root, n_shards=2, buckets=2)
    # a third epoch covering only HALF the terms makes group sizes vary
    # (2 vs 3 rows): with uniform group sizes and an even batch size the
    # batch boundaries would always fall BETWEEN groups and never exercise
    # the straddle
    third = [
        (40 + i, " ".join(t for j, t in enumerate(terms)
                          if j % 2 == 0 and (j // 2) % 10 == i))
        for i in range(10)
    ]
    build_epoch(
        spark,
        spark.createDataFrame(pd.DataFrame(
            {"doc_id": [r[0] for r in third], "text": [r[1] for r in third]}
        )),
        [spec], root, n_shards=2, buckets=2,
    )

    pl = QueryPipeline(text_spec=spec)
    queries = ["t000", "t000 t019 t599", "t123"]
    eng = PerlinEngine(load_index(spark, root), pl)
    before = {
        q: [(r["doc_id"], round(r["score"], 9)) for r in eng.search(q, k=10).collect()]
        for q in queries
    }
    before_postings = _postings_set(eng.index)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        assert compact_epochs(spark, root, num_partitions=2) == 3
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    idx = load_index(spark, root)
    # storage invariant: exactly one row per group key (the splice must
    # not have split any group at a batch boundary)
    from pyspark.sql import functions as F

    dup = (
        idx.postings.groupBy("bucket", "field", "term", "shard")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    assert _postings_set(idx) == before_postings
    eng2 = PerlinEngine(idx, pl)
    after = {
        q: [(r["doc_id"], round(r["score"], 9)) for r in eng2.search(q, k=10).collect()]
        for q in queries
    }
    assert after == before


def test_scorer_merges_duplicate_key_blobs(spark, tmp_path):
    """Defense in depth for the same defect: if storage DOES hold a group
    split into two rows under one (field,term,shard,epoch) key, the scorer
    must merge the blobs, not silently drop the second one."""
    from perlin_spark import build_index

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2, 3],
                      "text": ["alpha", "alpha", "alpha beta", "beta"]})
    )
    spec = FieldSpec(field="text", source="text")
    idx = build_index(spark, corpus, [spec], content_col="text", n_shards=1)
    pl = QueryPipeline(text_spec=spec)
    full = [(r["doc_id"], round(r["score"], 9))
            for r in PerlinEngine(idx, pl).search("alpha", k=10).collect()]
    assert [d for d, _ in full] == [0, 1, 2]

    # simulate a split: replace the 'alpha' row with two half-rows under
    # the SAME (field, term, shard, epoch) key
    rows = idx.postings.collect()
    out = []
    for r in rows:
        d = r.asDict()
        if d["term"] == "alpha":
            docs, tfs = codec.decode_postings(bytes(d["blob"]))
            for sl in (slice(0, 2), slice(2, None)):
                h = dict(d)
                h["blob"] = codec.encode_postings(docs[sl], tfs[sl], 128)
                h["df"] = int(len(docs[sl]))
                out.append(h)
        else:
            out.append(d)
    split_postings = spark.createDataFrame(out, idx.postings.schema)
    idx.postings = split_postings
    idx.vocab_source = None  # force vocab from the (split) postings
    got = [(r["doc_id"], round(r["score"], 9))
           for r in PerlinEngine(idx, pl).search("alpha", k=10).collect()]
    assert got == full


def test_build_epoch_rejects_overlapping_doc_ids(spark, tmp_path):
    """Appending an epoch whose caller-supplied doc ids collide with a
    committed epoch must fail loudly — silently indexing the same doc_id
    twice duplicates results and breaks compaction."""
    import pandas as pd
    import pytest as pt

    from perlin_spark import FieldSpec, build_epoch

    root = str(tmp_path / "oidx")
    spec = FieldSpec(field="text", source="text")
    b = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "b c"]}))
    build_epoch(spark, b, [spec], root, n_shards=2, buckets=2)
    with pt.raises(ValueError, match="overlapping"):
        build_epoch(spark, b, [spec], root, n_shards=2, buckets=2)
    # disjoint ids append fine — resuming the pending epoch the failed
    # attempt left behind (stage-1 re-stages from the corrected corpus)
    b2 = spark.createDataFrame(pd.DataFrame({"doc_id": [2, 3], "text": ["c d", "a d"]}))
    assert build_epoch(spark, b2, [spec], root, n_shards=2, buckets=2) == 1
    from perlin_spark import load_index

    assert load_index(spark, root).n_docs == 4


def test_delete_docs_tombstones(spark, tmp_path):
    """Query-time deletes (Lucene live-docs semantics): tombstoned docs
    vanish from every result, shard top-k refills from live docs, scores
    of survivors are UNCHANGED (stats stay as built), the MaxScore and
    exhaustive paths agree, and tombstones persist across reopen and are
    idempotent."""
    import numpy as np

    root = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(i, f"alpha common{' beta' * (i % 3 == 0)} w{i}") for i in range(12)],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    build_epoch(spark, corpus, [spec], root, n_shards=2, buckets=4)
    pl = QueryPipeline(text_spec=spec, text_combinator="any")

    eng = PerlinEngine(load_index(spark, root), pl)
    before = [(r["doc_id"], r["score"]) for r in eng.search("alpha beta", k=4).collect()]
    victims = [before[0][0], before[2][0]]

    assert delete_docs(spark, root, victims) == 2
    assert delete_docs(spark, root, [victims[0]]) == 1  # idempotent at load

    eng2 = PerlinEngine(load_index(spark, root), pl)
    after = [(r["doc_id"], r["score"]) for r in eng2.search("alpha beta", k=4).collect()]
    got_ids = [d for d, _ in after]
    assert not set(got_ids) & set(victims)
    assert len(after) == 4  # top-k REFILLED from live docs, not truncated
    # survivors keep their exact as-built scores (stale-stats semantics)
    before_scores = dict(before)
    for d, s in after:
        if d in before_scores:
            assert s == before_scores[d]

    # MaxScore (pruned, multi-term any) == exhaustive on the deleted index
    pruned = [(r["doc_id"], round(r["score"], 9))
              for r in eng2.search("alpha beta", k=4).collect()]
    exact = [(r["doc_id"], round(r["score"], 9))
             for r in eng2.search("alpha beta", k=4, prune=False).collect()]
    assert pruned == exact

    # conjunctive + Must paths also exclude tombstones
    assert not {
        r["doc_id"] for r in eng2.search("alpha", k=None).collect()
    } & set(victims)

    # empty tombstone set short-circuits; over-cap raises BEFORE collect
    idx = load_index(spark, root)
    idx.set_deleted(idx.deleted.filter("doc_id < 0"))
    assert idx.deleted_array() is None
    idx2 = load_index(spark, root)
    idx2.DELETED_CLOSURE_MAX = 0
    with pytest.raises(ValueError, match="tombstones"):
        PerlinEngine(idx2, pl).search("alpha", k=4).collect()


def test_delete_docs_job(spark, tmp_path, capsys):
    """The spark-submit tombstone job: --ids and --ids-parquet both land
    in _deletes and take effect on the next load."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import delete_docs as job

    root = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(i, f"alpha w{i}") for i in range(6)], "doc_id long, text string"
    )
    spec = FieldSpec(field="text", source="text")
    build_epoch(spark, corpus, [spec], root, n_shards=1, buckets=2)

    assert job.main(["--index", root, "--ids", "0,1"]) == 0
    ids_pq = str(tmp_path / "more.parquet")
    spark.createDataFrame([(2,)], "doc_id long").write.parquet(ids_pq)
    assert job.main(["--index", root, "--ids-parquet", ids_pq]) == 0

    eng = PerlinEngine(
        load_index(spark, root), QueryPipeline(text_spec=spec)
    )
    got = {r["doc_id"] for r in eng.search("alpha", k=None).collect()}
    assert got == {3, 4, 5}


def test_tombstones_survive_compaction(spark, tmp_path):
    """compact_epochs folds epochs, not deletes: doc_ids are preserved by
    the byte-splice, _deletes sits outside the epoch dirs, and the
    compacted index still excludes the tombstoned docs."""
    root = str(tmp_path / "idx")
    spec = FieldSpec(field="text", source="text")
    for lo in (0, 4):  # two epochs so compaction has work to do
        corpus = spark.createDataFrame(
            [(i, f"alpha w{i}") for i in range(lo, lo + 4)],
            "doc_id long, text string",
        )
        build_epoch(spark, corpus, [spec], root, n_shards=1, buckets=2)

    delete_docs(spark, root, [1, 5])
    assert compact_epochs(spark, root) == 2
    eng = PerlinEngine(load_index(spark, root), QueryPipeline(text_spec=spec))
    got = {r["doc_id"] for r in eng.search("alpha", k=None).collect()}
    assert got == {0, 2, 3, 4, 6, 7}


def test_refresh_deletes_and_broadcast(spark, tmp_path):
    """A long-lived handle sees post-load deletes after refresh_deletes
    (reader-reopen semantics, r4 ADVICE), the tombstone array ships as a
    ONCE-PER-INDEX broadcast (cached handle, invalidated by set_deleted),
    and clearing _deletes clears the filter."""
    import shutil

    from perlin_spark import refresh_deletes
    from perlin_spark.epochs import DELETES_DIR

    root = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(i, f"alpha w{i}") for i in range(8)], "doc_id long, text string"
    )
    spec = FieldSpec(field="text", source="text")
    build_epoch(spark, corpus, [spec], root, n_shards=1, buckets=2)

    idx = load_index(spark, root)
    eng = PerlinEngine(idx, QueryPipeline(text_spec=spec))
    assert len(eng.search("alpha", k=None).collect()) == 8

    # deletes issued AFTER load are invisible until refresh
    delete_docs(spark, root, [0, 3])
    assert len(eng.search("alpha", k=None).collect()) == 8
    refresh_deletes(spark, root, idx)
    got = {r["doc_id"] for r in eng.search("alpha", k=None).collect()}
    assert got == set(range(8)) - {0, 3}

    # the broadcast is built once per handle and carries the sorted array
    bc1 = idx.deleted_broadcast()
    bc2 = idx.deleted_broadcast()
    assert bc1 is bc2
    assert list(bc1.value) == [0, 3]
    # set_deleted invalidates the cached broadcast
    refresh_deletes(spark, root, idx)
    assert idx.deleted_broadcast() is not bc1

    # removing _deletes (a physical fold) clears the filter on refresh
    shutil.rmtree(f"{root}/{DELETES_DIR}")
    refresh_deletes(spark, root, idx)
    assert idx.deleted_broadcast() is None
    assert len(eng.search("alpha", k=None).collect()) == 8


def test_compact_fold_deletes(spark, tmp_path):
    """delete -> compact(fold_deletes=True) physically drops the docs:
    postings, df, doc_lens, stats, vocabulary, docs table, and scores all
    equal a FROM-SCRATCH build of the surviving corpus; _deletes is
    removed; the over-cap path raises before collecting (r4 verdict #9)."""
    import os as _os

    from perlin_spark import epochs as epochs_mod

    rows = [(i, f"alpha common{' beta' * (i % 3 == 0)} w{i}") for i in range(12)]
    root = str(tmp_path / "idx")
    spec = FieldSpec(field="text", source="text")
    corpus1 = spark.createDataFrame(rows[:6], "doc_id long, text string")
    corpus2 = spark.createDataFrame(rows[6:], "doc_id long, text string")
    build_epoch(spark, corpus1, [spec], root, n_shards=2, buckets=4, positions=True)
    build_epoch(spark, corpus2, [spec], root, n_shards=2, buckets=4, positions=True)

    victims = [0, 3, 7]
    delete_docs(spark, root, victims)
    folded = compact_epochs(spark, root, fold_deletes=True)
    assert folded is not None
    assert not _os.path.isdir(_os.path.join(root, epochs_mod.DELETES_DIR))

    # reference: a from-scratch build of the surviving corpus (same params)
    ref_root = str(tmp_path / "ref")
    surviving = spark.createDataFrame(
        [r for r in rows if r[0] not in victims], "doc_id long, text string"
    )
    build_epoch(spark, surviving, [spec], ref_root, n_shards=2, buckets=4,
                positions=True)

    idx = load_index(spark, root)
    ref = load_index(spark, ref_root)
    assert idx.deleted is None  # nothing pending after the fold

    # stats (n_docs, avgdl, mindl, total_terms) identical
    key = ["field"]
    got_stats = {tuple(r[k] for k in key): r.asDict() for r in idx.stats.collect()}
    want_stats = {tuple(r[k] for k in key): r.asDict() for r in ref.stats.collect()}
    assert got_stats == want_stats
    assert idx.n_docs == ref.n_docs == 9

    # vocabulary df identical
    got_voc = {(r["field"], r["term"]): r["df"] for r in idx.vocabulary.collect()}
    want_voc = {(r["field"], r["term"]): r["df"] for r in ref.vocabulary.collect()}
    assert got_voc == want_voc

    # docs table holds exactly the survivors
    assert {r["doc_id"] for r in idx.docs.select("doc_id").collect()} == {
        r[0] for r in rows if r[0] not in victims
    }

    # scores now REFLECT the fold (no stale stats): equal to the fresh build
    pl = QueryPipeline(text_spec=spec, text_combinator="any")
    got = [(r["doc_id"], round(r["score"], 9))
           for r in PerlinEngine(idx, pl).search("alpha beta", k=12).collect()]
    want = [(r["doc_id"], round(r["score"], 9))
            for r in PerlinEngine(ref, pl).search("alpha beta", k=12).collect()]
    assert got == want and got

    # phrase over the folded positional sidecar still works
    ph = PerlinEngine(idx, QueryPipeline(text_spec=spec)).search_phrase(
        "alpha common", k=12
    )
    assert {r["doc_id"] for r in ph.collect()} == {
        r[0] for r in rows if r[0] not in victims
    }

    # over-cap: raises with the rebuild remedy BEFORE collecting
    delete_docs(spark, root, [1])
    old_cap = epochs_mod.FOLD_DELETES_MAX
    epochs_mod.FOLD_DELETES_MAX = 0
    try:
        with pytest.raises(ValueError, match="rebuild"):
            compact_epochs(spark, root, fold_deletes=True)
    finally:
        epochs_mod.FOLD_DELETES_MAX = old_cap

    # single-epoch root with pending tombstones: fold alone is the work
    assert compact_epochs(spark, root, fold_deletes=True) is not None
    idx2 = load_index(spark, root)
    assert {r["doc_id"] for r in idx2.docs.select("doc_id").collect()} == {
        r[0] for r in rows if r[0] not in victims + [1]
    }


def test_load_index_upto_epoch_time_travel(spark, tmp_path):
    """Snapshot reads: upto_epoch=N serves exactly the corpus as of epoch
    N (Iceberg-style time travel over the epoch log); stats (n_docs,
    avgdl -> scores) roll back with it."""
    root = str(tmp_path / "idx_tt")
    build_epoch(spark, golden_corpus(spark), reference_specs(), root,
                n_shards=2, buckets=4)
    extra = spark.createDataFrame(
        GOLDEN_EXTRA_DOCS, "doc_id long, title string, text string"
    )
    build_epoch(spark, extra, reference_specs(), root, n_shards=2, buckets=4)

    pl = QueryPipeline(
        text_spec=FieldSpec(field="text", source="text", stem=True,
                            number_field="number"))
    asof0 = PerlinEngine(load_index(spark, root, upto_epoch=0), pl)
    head = PerlinEngine(load_index(spark, root), pl)

    base_ids = {r["doc_id"] for r in golden_corpus(spark).select("doc_id").collect()}
    extra_ids = {r[0] for r in GOLDEN_EXTRA_DOCS}
    assert asof0.index.n_docs == len(base_ids)
    assert head.index.n_docs == len(base_ids) + len(extra_ids)

    # epoch-1 docs are invisible at upto_epoch=0
    probe = "deimos"
    head_hits = {r["doc_id"] for r in head.search(probe, k=100).collect()}
    asof_hits = {r["doc_id"] for r in asof0.search(probe, k=100).collect()}
    assert asof_hits == head_hits - extra_ids
    assert asof_hits <= base_ids

    # the snapshot equals a from-scratch build of the epoch-0 corpus
    single = build_index(spark, golden_corpus(spark), reference_specs(),
                         n_shards=2)
    assert _postings_set(asof0.index) == _postings_set(single)
