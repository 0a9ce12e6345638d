"""Trigram-pruned substring/regex search (perlin_spark.trigram).

Parity model: the verified answer must equal a full-scan contains/rlike
filter — pruning may only shrink the candidate set, never the result.
"""

import pytest
from pyspark.sql import functions as F

from perlin_spark import FieldSpec, PerlinEngine
from perlin_spark.trigram import regex_literals, trigrams

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "quick brown foxes pack quick boxes"),
    (3, "a slow red fox naps; the dog packs nothing"),
    (4, "brown dogs jump over quick foxes daily"),
    (5, "xx"),  # below the trigram floor: contributes no trigrams
]


@pytest.fixture(scope="module")
def tri_engine(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    specs = [
        FieldSpec(field="text", source="text", tokenizer="whitespace"),
        FieldSpec(field="tri3", source="text", tokenizer="trigram", lowercase=False),
    ]
    eng = PerlinEngine.build(
        spark, docs, specs, content_col="text", n_shards=2
    ).cache()
    eng._raw_docs = docs
    return eng


def _scan_sub(docs, needle):
    return [
        r["doc_id"]
        for r in docs.filter(F.col("text").contains(needle))
        .select("doc_id").orderBy("doc_id").collect()
    ]


def _scan_re(docs, pat):
    return [
        r["doc_id"]
        for r in docs.filter(F.col("text").rlike(pat))
        .select("doc_id").orderBy("doc_id").collect()
    ]


def test_trigrams_helper():
    assert trigrams("abcd") == ["abc", "bcd"]
    assert trigrams("ab") == []
    assert trigrams("aaaa") == ["aaa"]  # deduplicated


def test_regex_literals_extraction():
    # (pattern, mandatory runs) — every run must appear verbatim in any match
    cases = {
        "quick brown": ["quick brown"],
        "qu.ck": ["qu", "ck"],
        "fox(es)? pack": ["fox", " pack"],
        "jum[px]s": ["jum", "s"],
        r"dog\s+packs": ["dog", "packs"],
        "ab+c": ["ab", "c"],          # b mandatory, contiguity broken after
        "colou?r": ["colo", "r"],
        "a{2,3}bc": ["bc"],
        "cat|dog": [],                # top-level alternation
        "(?i)quick": [],              # inline flag poisons all literals
        "(?:qui)ck": ["ck"],          # group contents never claimed
        r"a\.b\*c": ["a.b*c"],        # escaped metachars are literals
        "^start.*end$": ["start", "end"],
        "x*?yzw": ["yzw"],            # lazy quantifier suffix consumed
    }
    for pat, want in cases.items():
        assert regex_literals(pat) == want, pat


def test_substring_matches_full_scan(tri_engine):
    docs = tri_engine._raw_docs
    for needle in ["quick brown", "ck b", "pack", "over the", "zzz absent"]:
        got = [r["doc_id"] for r in tri_engine.search_substring(needle).collect()]
        assert got == _scan_sub(docs, needle), needle


def test_substring_crosses_token_boundary(tri_engine):
    # "n fox" spans a space: term search can never produce this
    got = [r["doc_id"] for r in tri_engine.search_substring("n fox").collect()]
    assert got == _scan_sub(tri_engine._raw_docs, "n fox") and got


def test_substring_k_and_floor(tri_engine):
    assert [r["doc_id"] for r in tri_engine.search_substring("fox", k=1).collect()] == [0]
    with pytest.raises(ValueError, match="trigram floor"):
        tri_engine.search_substring("fo")


def test_regex_matches_full_scan(tri_engine):
    docs = tri_engine._raw_docs
    for pat in [
        "qu[io]ck brown",
        "fox(es)? pack",
        r"dog\w* jump",
        "over .* lazy",
        "absent{2} run",
    ]:
        got = [r["doc_id"] for r in tri_engine.search_regex(pat).collect()]
        assert got == _scan_re(docs, pat), pat


def test_regex_refuses_unprunable_unless_opted_in(tri_engine):
    with pytest.raises(ValueError, match="allow_scan"):
        tri_engine.search_regex("cat|dog")
    got = [
        r["doc_id"]
        for r in tri_engine.search_regex("fox|liquor", allow_scan=True).collect()
    ]
    assert got == _scan_re(tri_engine._raw_docs, "fox|liquor")


def test_no_trigram_field_is_loud(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    eng = PerlinEngine.build(
        spark, docs,
        [FieldSpec(field="text", source="text", tokenizer="whitespace")],
        content_col="text", n_shards=2,
    )
    with pytest.raises(KeyError, match="no trigram field"):
        eng.search_substring("quick")


def test_candidate_plan_restricts_verify_to_candidates(tri_engine):
    """The verify scan must be candidate-restricted: under VERIFY_IDS_MAX
    the candidate ids ride in as an IN/INSET predicate on doc_id (no join,
    no full-corpus contains); the contains test applies on top."""
    plan = tri_engine.search_substring("quick brown")._jdf.queryExecution().executedPlan().toString()
    assert "Contains" in plan or "contains" in plan
    up = plan.upper()
    assert "INSET" in up or "DOC_ID#0L IN" in up or " IN (" in up

@pytest.fixture(scope="module")
def folded_engine(spark):
    docs = spark.createDataFrame(
        [(0, "Quick BROWN Fox"), (1, "quick brown fox"), (2, "QUICK other")],
        "doc_id long, text string",
    )
    specs = [
        FieldSpec(field="text", source="text", tokenizer="whitespace"),
        FieldSpec(field="tri3", source="text", tokenizer="trigram", lowercase=True),
    ]
    return PerlinEngine.build(
        spark, docs, specs, content_col="text", n_shards=2
    ).cache()


def test_substring_case_folded_field(folded_engine):
    """lowercase=True trigram field serves case-insensitive grep: mixed-
    case needle matches every casing; candidacy still prunes (doc 2 has
    no 'brown' in any case)."""
    got = [r["doc_id"] for r in folded_engine.search_substring("qUiCk BroWn").collect()]
    assert got == [0, 1]
    assert [r["doc_id"] for r in folded_engine.search_substring("ck oth").collect()] == [2]


def test_regex_case_folded_field(folded_engine):
    got = [r["doc_id"] for r in folded_engine.search_regex("BROWN f[ox]x").collect()]
    assert got == [0, 1]


def test_verify_id_pushdown_and_join_fallback_agree(tri_engine):
    """Under the cap the verify side is an IN-pushdown scan (no full-corpus
    contains); past the cap the join plan serves the same rows."""
    got = [r["doc_id"] for r in tri_engine.search_substring("quick brown").collect()]
    plan = tri_engine.search_substring("quick brown")._jdf.queryExecution().executedPlan().toString()
    assert "doc_id#" in plan and ("INSET" in plan.upper() or " IN (" in plan)
    # force the join fallback on this instance
    old = tri_engine.VERIFY_IDS_MAX
    tri_engine.VERIFY_IDS_MAX = 0
    try:
        got2 = [r["doc_id"] for r in tri_engine.search_substring("quick brown").collect()]
        got3 = [r["doc_id"] for r in tri_engine.search_regex("qu[io]ck brown").collect()]
    finally:
        tri_engine.VERIFY_IDS_MAX = old
    assert got2 == got
    assert got3 == [r["doc_id"] for r in tri_engine.search_regex("qu[io]ck brown").collect()]
