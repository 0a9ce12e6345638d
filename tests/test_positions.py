"""Positional-postings sidecar: codec roundtrips, phrase semantics parity
with the re-analysis fallback, persisted epochs + backfill + compaction,
and the plan guarantee (the corpus text is never scanned)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from perlin_spark import (
    FieldSpec,
    PerlinEngine,
    QueryPipeline,
    add_positions,
    build_epoch,
    compact_epochs,
    load_index,
)
from perlin_spark import codec
from perlin_spark.positions import decode_positions, encode_positions


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    )
)
def test_positions_codec_roundtrip(doc_positions):
    """Per-doc ascending position runs survive encode/decode for any
    shape, including concatenation of independently encoded halves (the
    splice invariant the merge relies on)."""
    runs = [np.unique(np.asarray(p, dtype=np.int64)) for p in doc_positions]
    tfs = np.array([r.size for r in runs], dtype=np.int64)
    flat = np.concatenate(runs)
    blob = encode_positions(flat, tfs)
    assert np.array_equal(decode_positions(blob, tfs), flat)
    # concatenated halves decode as one (what splice does across epochs)
    cut = len(runs) // 2
    a = encode_positions(
        np.concatenate(runs[:cut]) if cut else np.zeros(0, np.int64), tfs[:cut]
    )
    b = encode_positions(np.concatenate(runs[cut:]), tfs[cut:])
    assert np.array_equal(decode_positions(a + b, tfs), flat)


PHRASE_CORPUS = [
    (0, "merge sort is fast"),
    (1, "sort then merge later"),
    (2, "do a Merge SORT here"),
    (3, "merge sort merge sort"),
    (4, "nothing relevant"),
    (5, "merge merge sort"),
]


def _build(spark, positions):
    corpus = spark.createDataFrame(PHRASE_CORPUS, "doc_id long, text string")
    spec = FieldSpec(field="text", source="text")
    return PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=2, positions=positions,
    )


def test_positional_phrase_matches_fallback(spark):
    """Index-only phrase search returns exactly the re-analysis result,
    including duplicate-term phrases, and scores stay the conjunctive
    BM25 of the distinct terms."""
    pos_eng = _build(spark, True)
    fb_eng = _build(spark, False)
    assert pos_eng.index.positions is not None and fb_eng.index.positions is None
    for phrase in ("merge sort", "merge sort merge", "merge merge",
                   "sort merge", "fast merge", "merge sort is fast"):
        got = [(r["doc_id"], round(r["score"], 9))
               for r in pos_eng.search_phrase(phrase, k=10).collect()]
        want = [(r["doc_id"], round(r["score"], 9))
                for r in fb_eng.search_phrase(phrase, k=10).collect()]
        assert got == want, phrase
    assert {r["doc_id"] for r in pos_eng.search_phrase("merge sort", k=10).collect()} \
        == {0, 2, 3, 5}


def test_positional_phrase_plan_no_docs_scan(spark, tmp_path):
    """The r4 verdict's done-criterion: with the sidecar, the executed
    phrase plan contains NO scan of the docs/source text — position
    intersection + the scoring job only.  Pinned on a PERSISTED index
    (the serving shape), where the lineage is parquet scans: the source
    column appears in the fallback plan's docs probe and nowhere in the
    positional plan."""
    root = str(tmp_path / "idx")
    spec = FieldSpec(field="text", source="text")
    corpus = spark.createDataFrame(PHRASE_CORPUS, "doc_id long, text string")
    build_epoch(spark, corpus, [spec], root, n_shards=2, buckets=4, positions=True)
    idx = load_index(spark, root)
    eng = PerlinEngine(idx, QueryPipeline(text_spec=spec))

    df = eng.search_phrase("merge sort", k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "text#" not in plan  # the corpus text is never scanned
    assert "FlatMapGroupsInPandas" in plan  # the position-intersection stage

    near = eng.search_near("merge sort", 4, k=10)
    near.collect()
    near_plan = near._jdf.queryExecution().executedPlan().toString()
    assert "text#" not in near_plan  # span-near shares the index-only property
    assert "FlatMapGroupsInPandas" in near_plan

    idx.positions = None  # force the re-analysis fallback on the same index
    fb = eng.search_phrase("merge sort", k=10)
    fb.collect()
    fb_plan = fb._jdf.queryExecution().executedPlan().toString()
    assert "text#" in fb_plan  # the docs probe the sidecar removes


def test_positions_persisted_epochs_and_compaction(spark, tmp_path):
    """positions=True epochs: the sidecar persists per epoch, loads as a
    union, splices under compaction (positions payload byte-concat), and
    a mixed sidecar/no-sidecar root refuses to compact with a remedy."""
    root = str(tmp_path / "idx")
    spec = FieldSpec(field="text", source="text")
    c1 = spark.createDataFrame(PHRASE_CORPUS[:3], "doc_id long, text string")
    c2 = spark.createDataFrame(PHRASE_CORPUS[3:], "doc_id long, text string")
    build_epoch(spark, c1, [spec], root, n_shards=2, buckets=4, positions=True)
    build_epoch(spark, c2, [spec], root, n_shards=2, buckets=4, positions=True)

    eng = PerlinEngine(load_index(spark, root), QueryPipeline(text_spec=spec))
    assert eng.index.positions is not None
    assert sorted(
        r["doc_id"] for r in eng.search_phrase("merge sort", k=10).collect()
    ) == [0, 2, 3, 5]

    assert compact_epochs(spark, root) == 2
    eng2 = PerlinEngine(load_index(spark, root), QueryPipeline(text_spec=spec))
    assert eng2.index.positions is not None
    assert sorted(
        r["doc_id"] for r in eng2.search_phrase("merge sort", k=10).collect()
    ) == [0, 2, 3, 5]
    assert sorted(
        r["doc_id"] for r in eng2.search_phrase("merge sort merge", k=10).collect()
    ) == [3]

    # mixed root: new epoch without positions -> no sidecar at load, and
    # compaction refuses until backfilled
    c3 = spark.createDataFrame([(6, "merge sort again")], "doc_id long, text string")
    build_epoch(spark, c3, [spec], root, n_shards=2, buckets=4)
    assert load_index(spark, root).positions is None
    with pytest.raises(ValueError, match="add_positions"):
        compact_epochs(spark, root)
    assert add_positions(spark, root) == [3]
    eng3 = PerlinEngine(load_index(spark, root), QueryPipeline(text_spec=spec))
    assert eng3.index.positions is not None
    assert sorted(
        r["doc_id"] for r in eng3.search_phrase("merge sort", k=10).collect()
    ) == [0, 2, 3, 5, 6]
    assert compact_epochs(spark, root) == 4


def test_positions_number_routing_stream_slots(spark):
    """Positions index the SURVIVING stream: number-routed tokens do not
    occupy text slots, so a phrase spanning a routed token matches —
    identical to the re-analysis fallback's stream semantics."""
    corpus = spark.createDataFrame(
        [(0, "alpha 42 beta"), (1, "alpha beta"), (2, "alpha gamma beta")],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text", number_field="number")
    eng = PerlinEngine.build(
        spark, corpus, [spec],
        pipeline=QueryPipeline(text_spec=spec), n_shards=2, positions=True,
    )
    got = sorted(r["doc_id"] for r in eng.search_phrase("alpha beta", k=10).collect())
    assert got == [0, 1]

NEAR_CORPUS = [
    (0, "alpha beta gamma delta"),
    (1, "gamma x x alpha y beta"),
    (2, "alpha x beta x x gamma"),
    (3, "beta alpha gamma"),
    (4, "alpha beta"),
    (5, "alpha alpha beta"),
]


def _build_near(spark, positions):
    corpus = spark.createDataFrame(NEAR_CORPUS, "doc_id long, text string")
    spec = FieldSpec(field="text", source="text")
    return PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=2, positions=positions,
    )


def test_near_search_semantics_and_fallback_parity(spark):
    """Span-near over the sidecar: unordered = witness-per-distinct-term
    within the window (any order), ordered = strictly increasing slot
    chain (duplicates each need an occurrence), and the re-analysis
    fallback returns byte-identical results on every case.  The identity
    ordered+window=len-1 == phrase is pinned."""
    pos_eng = _build_near(spark, True)
    fb_eng = _build_near(spark, False)
    q = "alpha beta gamma"
    cases = [
        (q, 2, False, [0, 3]),
        (q, 5, False, [0, 1, 2, 3]),
        (q, 5, True, [0, 2]),
        (q, 2, True, [0]),
        ("alpha alpha", 1, True, [5]),       # duplicate slots need 2 occurrences
        ("alpha zzzqqq", 3, False, []),       # absent term: empty, no raise
    ]
    for query, w, ordered, want in cases:
        for eng in (pos_eng, fb_eng):
            got = sorted(
                r["doc_id"]
                for r in eng.search_near(query, w, k=None, ordered=ordered).collect()
            )
            assert got == want, (query, w, ordered, eng is pos_eng)
        a = [(r["doc_id"], round(r["score"], 9))
             for r in pos_eng.search_near(query, w, k=10, ordered=ordered).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in fb_eng.search_near(query, w, k=10, ordered=ordered).collect()]
        assert a == b, (query, w, ordered)
    # ordered near at window = n_slots - 1 is exactly phrase adjacency
    for eng in (pos_eng, fb_eng):
        near = [r["doc_id"] for r in eng.search_near(q, 2, k=10, ordered=True).collect()]
        phrase = [r["doc_id"] for r in eng.search_phrase(q, k=10).collect()]
        assert near == phrase
    assert pos_eng.search_near(q, 5, k=0).count() == 0
    assert pos_eng.search_near("", 3, k=10).count() == 0
    with pytest.raises(ValueError, match="window"):
        pos_eng.search_near(q, -1)


@settings(deadline=None, max_examples=120)
@given(
    st.lists(  # a few docs of tokens over a tiny alphabet
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=12),
        min_size=1, max_size=5,
    ),
    st.lists(st.sampled_from("abc"), min_size=2, max_size=3),  # query slots
    st.integers(min_value=0, max_value=6),
    st.booleans(),
)
def test_near_keys_match_vs_bruteforce(docs, slots, window, ordered):
    """near_keys_match == brute force over all occurrence choices."""
    from itertools import product

    from perlin_spark.positions import near_keys_match

    max_len = max(len(d) for d in docs)
    L = np.int64(max_len + window + 2)
    eff = slots if ordered else sorted(set(slots))
    slot_keys = [
        np.concatenate([
            np.int64(i) * L + np.flatnonzero(np.array(d) == t)
            for i, d in enumerate(docs)
        ]) for t in eff
    ]
    got = near_keys_match([np.unique(k) for k in slot_keys], window, ordered, L)

    want = []
    for i, d in enumerate(docs):
        occ = [[p for p, tok in enumerate(d) if tok == t] for t in eff]
        hit = False
        for choice in product(*occ):
            if ordered and any(b <= a for a, b in zip(choice, choice[1:])):
                continue
            if max(choice) - min(choice) <= window:
                hit = True
                break
        if hit:
            want.append(i)
    assert got.tolist() == want
