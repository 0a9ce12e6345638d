"""Codec round-trip property tests (SURVEY.md §5 rebuild plan item 3)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from perlin_spark import codec


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=400, unique=True),
    st.integers(min_value=1, max_value=300),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(doc_ids, block_size):
    docs = np.sort(np.array(doc_ids, dtype=np.int64))
    tfs = (docs % 997) + 1
    blob = codec.encode_postings(docs, tfs, block_size=block_size)
    d, t = codec.decode_postings(blob)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)


def test_varbyte_boundaries():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**53, 2**63 - 1], dtype=np.int64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(v)), v)


def test_empty():
    blob = codec.encode_postings(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    d, t = codec.decode_postings(blob)
    assert d.size == 0 and t.size == 0
    assert codec.decode_block_count(blob) == 0


def test_headers_and_block_skip():
    docs = np.arange(0, 10_000, 7, dtype=np.int64)
    tfs = (docs % 13) + 1
    blob = codec.encode_postings(docs, tfs, block_size=128)
    h = codec.read_headers(blob)
    assert int(h["count"].sum()) == docs.size
    # decode only blocks intersecting [3000, 5000]
    upper = np.append(h["first_doc"][1:], np.iinfo(np.int64).max)
    mask = (upper > 3000) & (h["first_doc"] <= 5000)
    d, t = codec.decode_postings(blob, mask)
    want = docs[(docs >= 3000) & (docs <= 5000)]
    assert set(want).issubset(set(d))
    # block-max headers are true maxima
    for i in np.flatnonzero(mask):
        di, ti = codec.decode_postings(blob, np.arange(h.size) == i)
        assert int(ti.max()) == int(h["max_tf"][i])


def test_strictly_increasing_enforced():
    with pytest.raises(ValueError):
        codec.encode_postings(np.array([3, 3]), np.array([1, 1]))


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=130),
)
@settings(max_examples=50, deadline=None)
def test_column_encode_equals_per_group(groups, block_size):
    docs_parts = [np.sort(np.array(g, dtype=np.int64)) for g in groups]
    tfs_parts = [(d % 31) + 1 for d in docs_parts]
    docs = np.concatenate(docs_parts)
    tfs = np.concatenate(tfs_parts)
    lens = np.array([d.size for d in docs_parts])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ends = np.cumsum(lens)
    values, offsets = codec.encode_postings_column(docs, tfs, starts, ends, block_size)
    assert int(offsets[-1]) == values.size
    buf = values.tobytes()
    for i, (d, t) in enumerate(zip(docs_parts, tfs_parts)):
        blob = buf[offsets[i] : offsets[i + 1]]
        assert blob == codec.encode_postings(d, t, block_size=block_size)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**30), min_size=1, max_size=200, unique=True),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=40, deadline=None)
def test_splice_blobs_decodes_to_concat(groups, block_size):
    """splice (no decode) must decode to the concatenation of its inputs
    when doc ranges are disjoint ascending — the partial-merge fast path."""
    # make ranges disjoint ascending by offsetting each group
    offset, parts = 0, []
    for g in groups:
        d = np.sort(np.array(g, dtype=np.int64)) + offset
        offset = int(d[-1]) + 1
        parts.append((d, (d % 17) + 1))
    blobs = [codec.encode_postings(d, t, block_size=block_size) for d, t in parts]
    spliced = codec.splice_blobs(blobs)
    d, t = codec.decode_postings(spliced)
    assert np.array_equal(d, np.concatenate([p[0] for p in parts]))
    assert np.array_equal(t, np.concatenate([p[1] for p in parts]))
    h = codec.read_headers(spliced)
    assert int(h["count"].sum()) == d.size  # block skip machinery intact


def test_merge_blobs_equals_single_encode():
    docs = np.arange(0, 1000, 3, dtype=np.int64)
    tfs = np.ones_like(docs)
    merged = codec.merge_blobs(
        [codec.encode_postings(docs[:111], tfs[:111]), codec.encode_postings(docs[111:], tfs[111:])]
    )
    assert merged == codec.encode_postings(docs, tfs)


def test_merge_partials_overlap_reencodes_interleaved_ids(spark):
    """Overlapping partials (interleaved external doc ids) take the
    decode-resort-encode slow path and come out doc-sorted."""
    import numpy as np

    from perlin_spark import codec
    from perlin_spark.build import PARTIAL_SCHEMA, merge_partials

    def partial(docs, tfs):
        d = np.array(docs, dtype=np.int64)
        t = np.array(tfs, dtype=np.int64)
        return (0, "dup", 0, len(docs), int(t.max()), int(d[0]), int(d[-1]),
                bytes(codec.encode_postings(d, t, 128)))

    df = spark.createDataFrame(
        [partial([1, 5], [1, 2]), partial([3, 9], [3, 1])], PARTIAL_SCHEMA
    )
    out = merge_partials(df, ["text"], 2, 128).collect()
    assert len(out) == 1
    docs, tfs = codec.decode_postings(bytes(out[0]["blob"]))
    assert docs.tolist() == [1, 3, 5, 9] and tfs.tolist() == [1, 3, 2, 1]
    assert out[0]["df"] == 4 and out[0]["max_tf"] == 3


def test_merge_partials_overlap_rejects_duplicate_doc_ids(spark):
    """The overlap slow path must fail loudly on the same doc appearing
    twice for one term (matching _encode_partition's guard) instead of
    silently inflating df / double-counting tf."""
    import numpy as np
    import pytest

    from perlin_spark import codec
    from perlin_spark.build import PARTIAL_SCHEMA, merge_partials

    def partial(docs, tfs):
        d = np.array(docs, dtype=np.int64)
        t = np.array(tfs, dtype=np.int64)
        return (0, "dup", 0, len(docs), int(t.max()), int(d[0]), int(d[-1]),
                bytes(codec.encode_postings(d, t, 128)))

    df = spark.createDataFrame(
        [partial([1, 5], [1, 1]), partial([5, 9], [2, 1])], PARTIAL_SCHEMA
    )
    with pytest.raises(Exception, match="duplicate doc_id"):
        merge_partials(df, ["text"], 2, 128).collect()
