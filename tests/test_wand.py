"""Block-max MaxScore pruning ≡ exhaustive scoring (SURVEY.md §7 Stage 5 gate).

Randomized corpora + disjunctive queries; the pruned scorer must return the
exact same (doc_id, score) top-k as the exhaustive path.
"""

import random

import pandas as pd
import pytest

from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline

VOCAB = [f"w{i}" for i in range(40)] + ["rare1", "rare2", "midfreq"]


def _random_corpus(spark, n_docs: int, seed: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randrange(3, 60)
        toks = [VOCAB[min(int(1 / max(rng.random(), 1e-9)), len(VOCAB)) - 1] for _ in range(n)]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_maxscore_equals_exhaustive(spark, seed):
    spec = FieldSpec(field="text", source="text")
    corpus = _random_corpus(spark, 400, seed)
    eng = PerlinEngine.build(
        spark, corpus, [spec],
        pipeline=QueryPipeline(text_spec=spec, text_combinator="any"),
        n_shards=4, block_size=16,
    ).cache()
    rng = random.Random(seed * 100)
    for _ in range(4):
        terms = rng.sample(VOCAB, rng.randrange(2, 6))
        q = " ".join(terms)
        for k in (3, 10):
            pruned = [(r["doc_id"], round(r["score"], 10))
                      for r in eng.search(q, k=k, prune=True).collect()]
            exact = [(r["doc_id"], round(r["score"], 10))
                     for r in eng.search(q, k=k, prune=False).collect()]
            assert pruned == exact, (q, k)


def test_maxscore_skips_decode(spark):
    """The pruning path must actually prune: with one dominant term and many
    weak ones, results still exact (sanity envelope for the bound math)."""
    spec = FieldSpec(field="text", source="text")
    rows = [(i, "common " * 5 + (f"rare{i} " if i < 3 else "filler ") * 2)
            for i in range(200)]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    eng = PerlinEngine.build(
        spark, corpus, [spec],
        pipeline=QueryPipeline(text_spec=spec, text_combinator="any"),
        n_shards=2, block_size=8,
    )
    a = [(r["doc_id"], round(r["score"], 10)) for r in eng.search("rare1 common filler", k=5, prune=True).collect()]
    b = [(r["doc_id"], round(r["score"], 10)) for r in eng.search("rare1 common filler", k=5, prune=False).collect()]
    assert a == b and len(a) == 5


@pytest.mark.parametrize("seed", [5, 6])
def test_tfidf_maxscore_equals_exhaustive(spark, seed):
    """The pluggable TF-IDF similarity keeps MaxScore pruning exact: its
    impact bound (idf^2*sqrt(max_tf)/sqrt(mindl)) is tf-monotone and
    dl-anti-monotone like BM25's."""
    spec = FieldSpec(field="text", source="text")
    corpus = _random_corpus(spark, 400, seed)
    eng = PerlinEngine.build(
        spark, corpus, [spec],
        pipeline=QueryPipeline(text_spec=spec, text_combinator="any"),
        n_shards=4, block_size=16, similarity="tfidf",
    ).cache()
    rng = random.Random(seed * 100)
    for _ in range(3):
        terms = rng.sample(VOCAB, rng.randrange(2, 6))
        q = " ".join(terms)
        for k in (3, 10):
            pruned = [(r["doc_id"], round(r["score"], 10))
                      for r in eng.search(q, k=k, prune=True).collect()]
            exact = [(r["doc_id"], round(r["score"], 10))
                     for r in eng.search(q, k=k, prune=False).collect()]
            assert pruned == exact, (q, k)


def test_tfidf_scores_and_dispatch(spark):
    """TF-IDF scores equal the hand formula (idf^2*sqrt(tf)/sqrt(dl)),
    differ from BM25 on the same index, and an unknown similarity fails
    loudly instead of silently scoring as BM25."""
    import math

    spec = FieldSpec(field="text", source="text")
    corpus = spark.createDataFrame(
        [(0, "apple apple apple banana"), (1, "apple pear"),
         (2, "banana pear pear kiwi plum fig date elderberry")],
        "doc_id long, text string",
    )
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=2, similarity="tfidf",
    )
    got = {r["doc_id"]: r["score"] for r in eng.search("apple", k=10).collect()}
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    want = {0: idf * idf * math.sqrt(3) / math.sqrt(4),
            1: idf * idf * math.sqrt(1) / math.sqrt(2)}
    assert got.keys() == want.keys()
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d

    eng.index.similarity = "bm25"
    bm = {r["doc_id"]: r["score"] for r in eng.search("apple", k=10).collect()}
    assert bm.keys() == got.keys() and all(abs(bm[d] - got[d]) > 1e-9 for d in bm)

    eng.index.similarity = "zzz"
    with pytest.raises(ValueError, match="similarity"):
        eng.search("apple", k=10).collect()


@pytest.mark.parametrize("seed", [7])
def test_lmdir_maxscore_equals_exhaustive(spark, seed):
    """The LM-Dirichlet similarity keeps MaxScore pruning exact: its
    contribution is clamped at 0 (missing-term floor holds) and its bound
    (evaluated at max_tf, mindl) is tf-monotone / dl-anti-monotone."""
    spec = FieldSpec(field="text", source="text")
    corpus = _random_corpus(spark, 400, seed)
    eng = PerlinEngine.build(
        spark, corpus, [spec],
        pipeline=QueryPipeline(text_spec=spec, text_combinator="any"),
        n_shards=4, block_size=16, similarity="lmdir",
    ).cache()
    rng = random.Random(seed * 100)
    for _ in range(3):
        terms = rng.sample(VOCAB, rng.randrange(2, 6))
        q = " ".join(terms)
        for k in (3, 10):
            pruned = [(r["doc_id"], round(r["score"], 10))
                      for r in eng.search(q, k=k, prune=True).collect()]
            exact = [(r["doc_id"], round(r["score"], 10))
                     for r in eng.search(q, k=k, prune=False).collect()]
            assert pruned == exact, (q, k)


def test_lmdir_scores_formula_and_clamp(spark):
    """LM-Dirichlet scores equal the pinned hand formula
    max(0, ln(1 + tf/(mu*p(t|C))) + ln(mu/(dl+mu))), mu=2000, with
    p(t|C) = cttf/total_tokens; the per-term clamp keeps contributions
    non-negative (a very common term in a long doc scores 0, not < 0)."""
    import math

    spec = FieldSpec(field="text", source="text")
    corpus = spark.createDataFrame(
        [(0, "apple apple apple banana"), (1, "apple pear"),
         (2, "banana pear pear kiwi plum fig date elderberry")],
        "doc_id long, text string",
    )
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=2, similarity="lmdir",
    )
    total = 4 + 2 + 8
    mu = 2000.0

    def lm(tf, dl, cttf):
        return max(0.0, math.log1p(tf / (mu * (cttf / total)))
                   + math.log(mu / (dl + mu)))

    got = {r["doc_id"]: r["score"] for r in eng.search("apple", k=10).collect()}
    want = {0: lm(3, 4, 4), 1: lm(1, 2, 4)}
    assert got.keys() == want.keys()
    for d in want:
        assert abs(got[d] - want[d]) < 1e-12, d

    # clamp: a term covering most of the collection (p(t|C) near 1) in a
    # short doc — the tf excess cannot beat the length penalty, so the
    # pre-clamp value is negative and the score must be exactly 0
    corpus2 = spark.createDataFrame(
        [(0, ("the " * 49) + "x"), (1, "the y")], "doc_id long, text string"
    )
    eng2 = PerlinEngine.build(
        spark, corpus2, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=1, similarity="lmdir",
    )
    p = 50 / 52
    raw_doc1 = math.log1p(1 / (mu * p)) + math.log(mu / (2 + mu))
    assert raw_doc1 < 0  # the scenario really is negative pre-clamp
    got2 = {r["doc_id"]: r["score"] for r in eng2.search("the", k=10).collect()}
    assert got2[1] == 0.0
    want_doc0 = max(0.0, math.log1p(49 / (mu * p)) + math.log(mu / (50 + mu)))
    assert want_doc0 > 0 and abs(got2[0] - want_doc0) < 1e-12


def test_lmdir_unknown_term_and_build_validation(spark):
    spec = FieldSpec(field="text", source="text")
    corpus = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=1, similarity="lmdir",
    )
    assert eng.search("zzzqqq", k=5).count() == 0
    with pytest.raises(ValueError, match="similarity"):
        PerlinEngine.build(
            spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
            n_shards=1, similarity="dfr",
        )
