"""Analyzer parity tests vs /root/reference/src/language/ semantics."""

import pandas as pd

from perlin_spark.analysis import (
    FieldSpec,
    QueryPipeline,
    analyze_pandas,
    canonical_u64,
    tokenize,
)


def test_whitespace_tokenizer_matches_split_whitespace():
    # Rust split_whitespace: any Unicode whitespace, empties dropped
    s = pd.Series(["a  b\tc\nd", "  leading", "trailing  ", "", None, " nbsp em"])
    toks = tokenize(s, "whitespace")
    assert toks.tolist() == ["a", "b", "c", "d", "leading", "trailing", "nbsp", "em"]


def test_alphanumeric_tokenizer_unicode():
    # Rust char::is_alphanumeric is Unicode-aware and excludes '_'
    s = pd.Series(["foo_bar-baz", "søk(motor)", "x1+y2", "检索,引擎", "__"])
    toks = tokenize(s, "alphanumeric")
    assert toks.tolist() == ["foo", "bar", "baz", "søk", "motor", "x1", "y2", "检索", "引擎"]


def test_number_routing_u64_bounds():
    # tokens parsing as u64 route to the number field; over u64::MAX stay text
    spec = FieldSpec(field="text", source="text", number_field="number", stem=False)
    pdf = pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["10 018446744073709551615 18446744073709551615 18446744073709551616 x10"],
        }
    )
    out = analyze_pandas(pdf, [spec])
    routed = out[out["field"] == "number"].set_index("term")["tf"].to_dict()
    kept = sorted(out[out["field"] == "text"]["term"])
    # '018446744073709551615' canonicalizes to the same u64 term -> tf 2
    assert routed == {"10": 1, "18446744073709551615": 2}
    assert kept == ["18446744073709551616", "x10"]
    # canonical u64 form strips leading zeros like Rust parse->to_string
    assert canonical_u64(pd.Series(["007", "0", "000"])).tolist() == ["7", "0", "0"]


def test_stopwords_and_lowercase():
    spec = FieldSpec(field="text", source="text", stopwords=("the", "a"), stem=False)
    pdf = pd.DataFrame({"doc_id": [1], "text": ["The THE a Fox"]})
    out = analyze_pandas(pdf, [spec])
    assert sorted(out["term"]) == ["fox"]


def test_tf_counts():
    spec = FieldSpec(field="text", source="text", stem=False)
    pdf = pd.DataFrame({"doc_id": [7, 8], "text": ["b a b b", "a"]})
    out = analyze_pandas(pdf, [spec]).set_index(["doc_id", "term"])["tf"].to_dict()
    assert out == {(7, "b"): 3, (7, "a"): 1, (8, "a"): 1}


def test_query_pipeline_routing_and_combinators():
    spec = FieldSpec(field="text", source="text", stem=True, number_field="number")
    qp = QueryPipeline(text_spec=spec, text_combinator="all", number_combinator="any")
    q = qp.analyze("10 Birds flew")
    groups = {(f, c): list(t) for f, c, t in q.groups}
    assert groups[("number", "any")] == ["10"]
    assert groups[("text", "all")] == ["bird", "flew"]


def test_code_tokenizer_identifier_split():
    """'code' tokenizer: camelCase humps, acronym runs, snake/kebab case
    all split into searchable identifier parts (code-search feature for
    the input_hint code payload)."""
    import pandas as pd

    from perlin_spark.analysis import tokenize

    got = list(
        tokenize(
            pd.Series(["HTTPServer parse_config getValue2X foo-barBaz XMLHttpRequest"]),
            "code",
        )
    )
    assert got == [
        "HTTP", "Server", "parse", "config", "get", "Value2", "X",
        "foo", "bar", "Baz", "XML", "Http", "Request",
    ]


def test_code_tokenizer_matches_duckdb_oracle_property():
    """Property: the Arrow-kernel 'code' tokenizer and the DuckDB SQL the
    driver oracle uses (same two RE2 regexes + alnum extraction +
    lowercase) agree on arbitrary identifier soup — the cross-engine
    parity that makes ft_code_ident_bm25 hash-gateable."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from perlin_spark.analysis import tokenize

    ident_chars = st.sampled_from(
        list("abcXYZ_09 -.") + ["HTTP", "Server", "getX", "p_q", "2Fast"]
    )
    texts = st.lists(ident_chars, min_size=0, max_size=30).map("".join)

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(texts)
    def check(s):
        spark_side = [t.lower() for t in tokenize(pd.Series([s]), "code")]
        (sql_side,) = con.execute(
            r"""SELECT list_transform(regexp_extract_all(
                 regexp_replace(
                   regexp_replace(?, '([a-z0-9])([A-Z])', '\1 \2', 'g'),
                   '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'),
                 '[\p{L}\p{N}]+'), t -> lower(t))""",
            [s],
        ).fetchone()
        assert spark_side == list(sql_side), s

    check()


def test_debug_stages_pins_real_pipeline():
    """The Debugger tap (reference src/language/mod.rs:59-88): final
    stage must equal apply_field_pipeline's real output for every spec
    shape, intermediate stages must show the expected transformations,
    and the per-token callback fires like the reference's println."""
    import pandas as pd

    from perlin_spark.analysis import FieldSpec, apply_field_pipeline, debug_stages

    text = "Flew 007 the BIRD 18446744073709551616 ocean"
    specs = [
        FieldSpec(field="t", source="t"),
        FieldSpec(field="t", source="t", stem=True, number_field="num"),
        FieldSpec(field="t", source="t", stopwords=("the",), stem=True),
        FieldSpec(field="n", source="n", numbers_only=True),
    ]
    for spec in specs:
        stages = debug_stages(text, spec)
        real = apply_field_pipeline(pd.Series(text.split()), spec)
        # final debug stream per field == the real chain's output
        got_by_field: dict = {}
        for stage, field, toks in stages:
            got_by_field[field] = toks  # later stages overwrite: final wins
        for field, series in real:
            assert got_by_field[field] == [str(t) for t in series]

    stages = debug_stages(text, FieldSpec(field="t", source="t", number_field="num"))
    names = [s for s, _, _ in stages]
    assert names[0] == "tokenize" and "number_tee" in names and names[-1] == "index_term"
    tee = next(toks for s, f, toks in stages if s == "number_tee")
    assert tee == ["7"]  # 007 canonicalized; the 2^64 boundary token stays text

    seen = []
    debug_stages("a B", FieldSpec(field="t", source="t"),
                 callback=lambda s, t: seen.append((s, t)))
    assert ("tokenize", "B") in seen and ("index_term", "b") in seen
