"""Distributed BPE learner/encoder vs an independent pure-Python reference."""

import collections

import pytest

from perlin_spark.extras import bpe


# --- reference implementation (classic Sennrich BPE, list-based) -------------

def _ref_word_counts(texts):
    c = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return c


def _ref_learn(texts, n_merges, min_pair_count=2):
    vocab = {
        tuple(list(w) + [bpe.EOW]): n for w, n in _ref_word_counts(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for seq, n in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        # count desc, then (left, right) asc — the learner's tie-break
        (l, r), n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        new_vocab = {}
        for seq, cnt in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _ref_encode(word, merges):
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    seq = list(word) + [bpe.EOW]
    while len(seq) >= 2:
        cand = [(ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(seq, seq[1:])) if (a, b) in ranks]
        if not cand:
            break
        rk, _ = min(cand)
        l, r = [m[:2] for m in merges][rk]
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == l and seq[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "low lower newest widest wide new",
]


@pytest.fixture(scope="module")
def bpe_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_learn_bpe_matches_reference(bpe_docs):
    got = bpe.learn_bpe(bpe_docs, n_merges=12)
    want = _ref_learn(TEXTS, 12)
    assert got == want
    # ranked merges table round-trips
    rows = bpe.merges_df(bpe_docs.sparkSession, got).orderBy("rank").collect()
    assert [(r["left"], r["right"], r["pair_count"]) for r in rows] == want
    assert [r["rank"] for r in rows] == list(range(len(want)))


def test_learn_bpe_min_count_stops_early(bpe_docs):
    # a huge merge budget just drains the corpus to pairs below the floor
    got = bpe.learn_bpe(bpe_docs, n_merges=500, min_pair_count=3)
    assert all(n >= 3 for _, _, n in got)
    want = _ref_learn(TEXTS, 500, min_pair_count=3)
    assert got == want
    with pytest.raises(ValueError, match="n_merges"):
        bpe.learn_bpe(bpe_docs, n_merges=0)


def test_apply_bpe_matches_reference_and_is_lossless(bpe_docs):
    merges = bpe.learn_bpe(bpe_docs, n_merges=8)
    out = bpe.apply_bpe(bpe_docs, merges).orderBy("doc_id").collect()
    for row in out:
        want = []
        for w in row["text"].lower().split():
            want.extend(_ref_encode(w, merges))
        assert row["bpe_tokens"] == want
        # lossless: tokens concatenate back to the normalized text
        rebuilt = "".join(row["bpe_tokens"]).replace(bpe.EOW, " ").strip()
        assert rebuilt == " ".join(row["text"].lower().split())


def test_apply_bpe_empty_and_missing_column(bpe_docs, spark):
    empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    assert bpe.apply_bpe(empty, [("l", "o", 5)]).collect()[0]["bpe_tokens"] == []
    with pytest.raises(KeyError, match="no column"):
        bpe.apply_bpe(bpe_docs, [], text_col="nope")
