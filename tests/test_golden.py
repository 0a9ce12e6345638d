"""Golden parity suite: the reference's own integration-test query set.

Transcribed from ``/root/reference/src/document_index.rs:118-188``
(tabulated in SURVEY.md §2.4 / FIXTURES.md §4).  This is the
rank-identity gate of BASELINE.json: every gating expectation must hold
exactly (ordered doc-id lists, ascending-id tie-break under BM25).
"""

import pytest

from perlin_spark import Must, PerlinEngine
from perlin_spark.analysis import FieldSpec, QueryPipeline, reference_specs
from perlin_spark.fixtures import (
    GOLDEN_FREQUENT_NUMBER,
    GOLDEN_QUERIES,
    golden_corpus,
)


@pytest.fixture(scope="module")
def engine(spark):
    corpus = golden_corpus(spark)
    eng = PerlinEngine.build(
        spark, corpus, reference_specs(), n_shards=2, block_size=4
    ).cache()
    # pipeline A: NumberFilter -> [Any in number]; text -> [All in text]
    # (src/document_index.rs:90-97)
    eng.pipeline = QueryPipeline(
        text_spec=FieldSpec(
            field="text", source="text", stem=True, number_field="number"
        ),
        text_combinator="all",
        number_combinator="any",
    )
    return eng


# pipeline B: terminal [Any in title] (src/document_index.rs:136-142)
PIPELINE_B = QueryPipeline(
    text_spec=FieldSpec(field="title", source="text", stem=True, number_field="number"),
    text_combinator="any",
    number_combinator="any",
)


@pytest.mark.parametrize(
    "pipeline,query,expected",
    [(p, q, e) for p, q, e, gating in GOLDEN_QUERIES if gating],
    ids=[f"{p}:{q}" for p, q, e, gating in GOLDEN_QUERIES if gating],
)
def test_golden_queries(engine, pipeline, query, expected):
    pl = PIPELINE_B if pipeline == "B" else engine.pipeline
    got = [r["doc_id"] for r in engine.search(query, k=10, pipeline=pl).collect()]
    assert got == expected


def test_known_inconsistent_ocean_case(engine):
    """Reference asserts [] for "ocean" but that is jointly unsatisfiable
    with "flew" -> [0,1,2] under df-monotone weighting (SURVEY.md §2.4);
    the implemented semantics yield [1]."""
    got = [r["doc_id"] for r in engine.search("ocean", k=10).collect()]
    assert got == [1]


def test_must_filter(engine):
    """filtered_query: "flew" + Must(number=2567) -> [2]
    (src/document_index.rs:165-177)."""
    got = [
        r["doc_id"]
        for r in engine.search("flew", k=10, filters=[Must("number", "2567")]).collect()
    ]
    assert got == [2]


def test_frequent_terms(spark):
    """iterate_filters: df-descending (df, term) over the number field after
    the extra docs (src/document_index.rs:179-188).

    Expected values are true document frequencies (4,2,1); the reference's
    literal (5,3,1) is unreproducible from its visible corpus — see
    fixtures.GOLDEN_FREQUENT_NUMBER for the audit trail."""
    corpus = golden_corpus(spark, extra=True)
    eng = PerlinEngine.build(spark, corpus, reference_specs(), n_shards=2)
    got = [(r["df"], r["term"]) for r in eng.frequent_terms("number", 3).collect()]
    assert got == GOLDEN_FREQUENT_NUMBER


def test_bm25_scores_positive_and_ordered(engine):
    rows = engine.search("flew", k=10).collect()
    scores = [r["score"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # docs 0 and 1 have dl=5 (tie, broken by doc_id), doc 2 has dl=6
    assert abs(rows[0]["score"] - rows[1]["score"]) < 1e-12
    assert rows[2]["score"] < rows[1]["score"]


def test_search_docs_join(engine):
    rows = engine.search_docs("deimos phobos", k=5).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 2
    assert rows[0]["title"] == "Unicorns on Deimos"


def test_same_term_as_group_and_filter(engine):
    """A term used both as a query term and a Must filter must not
    duplicate result rows (blob dedup across role-expanded join rows)."""
    a = [(r["doc_id"], r["score"]) for r in
         engine.search("flew", k=10, filters=[Must("text", "flew")]).collect()]
    b = [(r["doc_id"], r["score"]) for r in engine.search("flew", k=10).collect()]
    assert a == b
    assert len({d for d, _ in a}) == len(a)


def test_must_not_and_may(spark):
    from perlin_spark import May, MustNot

    corpus = golden_corpus(spark)
    eng = PerlinEngine.build(spark, corpus, reference_specs(), n_shards=2)
    got = [
        r["doc_id"]
        for r in eng.search("flew", k=10, filters=[MustNot("number", "125")]).collect()
    ]
    assert got == [0, 2]
    rows = eng.search("flew", k=10, filters=[May("text", "ocean")]).collect()
    assert [r["doc_id"] for r in rows] != [] and len(rows) == 3
    by_id = {r["doc_id"]: r["score"] for r in rows}
    assert by_id[1] > by_id[0]  # the May term boosts doc 1 above the dl-tie
