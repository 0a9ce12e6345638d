"""Engine feature coverage: numbers-only fields (ToUsize), term_doc_ratio
weighting, hierarchy query expansion — SURVEY.md §2 items 7, 18, 25."""

import pandas as pd
import pytest

from perlin_spark import FieldSpec, Hierarchy, PerlinEngine, QueryPipeline
from perlin_spark.analysis import QuerySpec, analyze_pandas


def test_numbers_only_field_tousize():
    """ToUsize (src/language/integers.rs:56-76): parse-or-drop."""
    spec = FieldSpec(field="emails", source="emails", numbers_only=True)
    pdf = pd.DataFrame({"doc_id": [0], "emails": ["42 abc 007 99x 18446744073709551616"]})
    out = analyze_pandas(pdf, [spec])
    assert sorted(out["term"]) == ["42", "7"]  # canonical, non-numbers dropped


def test_term_doc_ratio_weighting(spark):
    """weight = idf * 1/term_doc_ratio (src/query/operators.rs:54):
    a down-weighted field contributes proportionally less score."""
    corpus = spark.createDataFrame(
        [(0, "apple", "apple"), (1, "apple", "banana")],
        "doc_id long, title string, body string",
    )
    specs_even = [
        FieldSpec(field="title", source="title"),
        FieldSpec(field="body", source="body"),
    ]
    specs_skewed = [
        FieldSpec(field="title", source="title", term_doc_ratio=2.0),
        FieldSpec(field="body", source="body"),
    ]

    def scores(specs):
        eng = PerlinEngine.build(spark, corpus, specs, n_shards=1)
        q = QuerySpec(groups=(("title", "any", ("apple",)), ("body", "any", ("apple",))))
        # both-group docs only: doc 0 (title+body), via any-groups intersection
        rows = eng.search(q, k=10).collect()
        return {r["doc_id"]: r["score"] for r in rows}

    even, skewed = scores(specs_even), scores(specs_skewed)
    # doc 0 matches in both fields; halving title weight lowers its score
    assert skewed[0] < even[0]
    # body-only contribution unchanged => drop equals half the title part
    title_part_even = even[0] - skewed[0]
    assert title_part_even > 0


def test_spark_hash_parity(spark):
    """Driver-side murmur3 (spark_hash.py) must equal F.hash bit-for-bit —
    it replaces the per-query bucket-pruning Spark job."""
    from pyspark.sql import functions as F

    from perlin_spark.spark_hash import bucket_of, spark_hash_strings

    rows = [
        ("text", "hello"),
        ("content", "ünïcode✓"),
        ("f", ""),
        ("number", "12345678901234567890"),
        ("x", "abcdefg"),
        ("y", "日本語テキスト"),
        ("text", "a"),
        ("text", "ab"),
        ("text", "abc"),
        ("text", "abcd"),
    ]
    df = spark.createDataFrame(rows, "field string, term string").select(
        "field", "term", F.hash("field", "term").alias("h"),
        F.pmod(F.hash("field", "term"), F.lit(8)).alias("b"),
    )
    for r in df.collect():
        assert spark_hash_strings([r["field"], r["term"]]) == r["h"]
        assert bucket_of(r["field"], r["term"], 8) == r["b"]


def test_hierarchy_query_expansion(spark):
    """Hierarchy child expansion (src/field/hierarchy.rs:31-36) used for
    query expansion: searching a parent term matches child-term docs."""
    h = Hierarchy(spark)
    h.add_element("animal")
    h.add_element("bird", "animal")
    h.add_element("sparrow", "bird")
    h.add_element("rock")
    assert h.get_child_terms("animal") == ["bird"]
    assert h.get_root_terms() == ["animal", "rock"]
    assert h.expand(["animal"]) == ["animal", "bird", "sparrow"]

    corpus = spark.createDataFrame(
        [(0, "sparrow on a branch"), (1, "granite rock"), (2, "a bird sings")],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(spark, corpus, [spec], n_shards=1)
    expanded = h.expand(["animal"])
    q = QuerySpec(groups=(("text", "any", tuple(expanded)),))
    got = sorted(r["doc_id"] for r in eng.search(q, k=10).collect())
    assert got == [0, 2]

    with pytest.raises(ValueError):
        h.add_element("bird")  # duplicate
    with pytest.raises(ValueError):
        h.add_element("x", "unknown-parent")


def test_report_progress_events(spark):
    """Progress events stream while a scoped job runs: fractions within
    [0,1], monotone task counts, and a final done=True event (the Spark
    analog of the reference's Query::progress, src/query/mod.rs:148)."""
    from perlin_spark.progress import report_progress

    events = []
    with report_progress(spark, events.append, interval=0.05):
        spark.range(0, 2_000_000, 1, 16).selectExpr("sum(id * 2)").collect()
        spark.range(0, 1_000_000, 1, 8).selectExpr("count(*)").collect()

    assert events and events[-1].done
    assert events[-1].tasks_total >= 24  # both jobs' stages counted
    fr = [e.fraction for e in events]
    assert all(0.0 <= f <= 1.0 for f in fr) and fr[-1] == 1.0
    dones = [e.tasks_done for e in events]
    assert dones == sorted(dones)


def test_dl_broadcast_checks_cap_before_collecting(spark):
    """r2 verdict defect #2: the 512 MB dl-broadcast cap must be enforced
    with a one-scalar aggregate BEFORE any blob reaches the driver — an
    over-cap index must never materialize its doc-length blobs driver-side
    (that collect was the very OOM the cap exists to prevent).  Search
    must still work via the per-query broadcast-join fallback."""
    corpus = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["alpha beta", "alpha", "beta gamma"]}
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, spark.createDataFrame(corpus), [spec],
        pipeline=QueryPipeline(text_spec=spec), n_shards=1,
    )
    idx = eng.index
    expected = [r["doc_id"] for r in eng.search("alpha", k=10).collect()]
    assert expected == [1, 0]

    # fresh cap state, 0-byte cap: every index is over it
    idx._dl_bc = None
    idx.DL_BROADCAST_MAX = 0

    class NoCollectProxy:
        """Delegates everything except blob-column selection."""

        def __init__(self, df):
            self._df = df

        def agg(self, *a, **k):  # the one-scalar size probe is allowed
            return self._df.agg(*a, **k)

        def select(self, *a, **k):
            raise AssertionError(
                "dl blobs were selected for driver collect despite the cap"
            )

        def __getattr__(self, name):
            return getattr(self._df, name)

    idx.doc_lens = NoCollectProxy(idx.doc_lens)
    assert idx.dl_broadcast() is None  # over cap -> no broadcast, no collect

    # the join fallback (filter -> real DataFrame -> select) still scores
    got = [r["doc_id"] for r in eng.search("alpha", k=10).collect()]
    assert got == expected


def test_hierarchy_dataframe_bfs_expansion(spark):
    """The DataFrame BFS (expand_terms) must match the driver-dict expand
    on a taxonomy round-tripped through to_df(), and feed search as an
    expanded Any group — the scale path for taxonomies that outgrow the
    driver (r2 verdict item)."""
    h = Hierarchy(spark)
    for term, parent in [
        ("animal", None), ("bird", "animal"), ("sparrow", "bird"),
        ("eagle", "bird"), ("fish", "animal"), ("salmon", "fish"),
        ("rock", None), ("granite", "rock"),
    ]:
        h.add_element(term, parent)

    # round-trip: to_df -> BFS == driver-dict BFS, at several seeds/depths
    for seeds in (["animal"], ["bird"], ["rock", "fish"], ["sparrow"]):
        df_terms = sorted(
            r["term"] for r in Hierarchy.expand_terms(h.to_df(), seeds).collect()
        )
        assert df_terms == h.expand(seeds)
    assert h.expand_via_df(["animal"]) == h.expand(["animal"])

    # unknown seed: passes through (expansion never drops seed terms)
    assert h.expand_via_df(["unknown"]) == ["unknown"]

    corpus = spark.createDataFrame(
        [(0, "sparrow on a branch"), (1, "granite cliff"), (2, "salmon run"),
         (3, "a bird sings"), (4, "nothing here")],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(spark, corpus, [spec], n_shards=1)
    expanded = h.expand_via_df(["animal"])
    q = QuerySpec(groups=(("text", "any", tuple(expanded)),))
    got = sorted(r["doc_id"] for r in eng.search(q, k=10).collect())
    assert got == [0, 2, 3]


def test_search_plan_properties(spark, tmp_path):
    """The two load-bearing plan claims, pinned: (a) a persisted index
    search prunes the parquet scan by bucket partition (PartitionFilters,
    not a post-scan filter); (b) a cached index's serving layout makes
    the scoring stage exchange-free (scan -> filter -> applyInPandas ->
    TakeOrderedAndProject in ONE stage)."""
    from perlin_spark import build_epoch, load_index
    from perlin_spark.analysis import reference_specs
    from perlin_spark.fixtures import golden_corpus

    root = str(tmp_path / "planidx")
    build_epoch(spark, golden_corpus(spark), reference_specs(), root,
                n_shards=2, buckets=4)
    pl = QueryPipeline(
        text_spec=FieldSpec(field="text", source="text", stem=True,
                            number_field="number"))

    idx = load_index(spark, root)
    df = PerlinEngine(idx, pl).search("deimos", k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]

    idx2 = load_index(spark, root).cache()
    idx2.postings.count()  # materialize the shard-partitioned cache
    df2 = PerlinEngine(idx2, pl).search("deimos", k=10)
    df2.collect()
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan2
    # single stage ABOVE the cache scan: the shard layout satisfies the
    # groupBy distribution, so no Exchange sits between the
    # InMemoryTableScan and the pandas scorer (the cached relation's own
    # stored build plan below it legitimately contains the one-time
    # repartition Exchange)
    query_stage = plan2.split("InMemoryRelation", 1)[0]
    assert "Exchange" not in query_stage
    assert "TakeOrderedAndProject" in query_stage


def test_prefix_and_fuzzy_search(spark):
    """Term-expansion search: prefix/fuzzy expand against the vocabulary
    (df desc / dist asc orders, caps, length band) and score as ONE
    Any-combinator query identical to an explicit QuerySpec search."""
    corpus = spark.createDataFrame(
        [
            (0, "merge sort merge"),
            (1, "merged branches fast"),
            (2, "merchant ledger sort"),
            (3, "sorting is not a term here"),
        ],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )

    # prefix expansion: df desc, term asc (all df=1 here, so pure term
    # order: 'merchant' < 'merge' < 'merged'); cap respected
    assert eng.expand_prefix("text", "mer") == ["merchant", "merge", "merged"]
    assert eng.expand_prefix("text", "mer", max_terms=2) == ["merchant", "merge"]
    assert eng.expand_prefix("text", "zzz") == []

    # fuzzy expansion: length band + levenshtein; dist asc first
    assert eng.expand_fuzzy("text", "merge", max_edits=1) == ["merge", "merged"]
    # 2 edits reaches nothing new except via the wider band
    assert eng.expand_fuzzy("text", "sost", max_edits=1) == ["sort"]
    assert eng.expand_fuzzy("text", "qqq") == []

    # scored search equals the explicit Any QuerySpec over the same terms
    got = {
        r["doc_id"]: r["score"]
        for r in eng.search_prefix("mer", k=10).collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in eng.search(
            QuerySpec(groups=(("text", "any", ("merchant", "merge", "merged")),)),
            k=10,
        ).collect()
    }
    assert got == want and set(got) == {0, 1, 2}

    # empty expansions return empty frames with the search schema
    empty = eng.search_prefix("zzz", k=10)
    assert empty.columns == ["doc_id", "score"] and empty.count() == 0
    assert eng.search_fuzzy("qqq", k=10).count() == 0


def test_phrase_search_adjacency_and_facets(spark):
    """Phrase candidacy = AND match, but only ADJACENT (analyzed-stream)
    occurrences survive verification; facet_counts aggregates the full
    match set per docs column."""
    corpus = spark.createDataFrame(
        [
            (0, "merge sort is fast", "a"),
            (1, "sort then merge later", "a"),      # both terms, NOT adjacent
            (2, "do a Merge SORT here", "b"),       # adjacency after lowercase
            (3, "merge sort merge sort", "b"),
            (4, "nothing relevant", "b"),
        ],
        "doc_id long, text string, source string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )

    hits = eng.search_phrase("merge sort", k=10).collect()
    assert [r["doc_id"] for r in hits] and {r["doc_id"] for r in hits} == {0, 2, 3}
    # scores equal the conjunctive BM25 over the distinct terms: doc 1
    # scores in THAT query but is excluded here by adjacency only
    conj = {
        r["doc_id"]: r["score"]
        for r in eng.search(
            QuerySpec(groups=(("text", "all", ("merge", "sort")),)), k=10
        ).collect()
    }
    assert 1 in conj
    for r in hits:
        assert r["score"] == conj[r["doc_id"]]

    # single-term phrase degrades to a plain term query (no verify pass)
    one = {r["doc_id"] for r in eng.search_phrase("merge", k=10).collect()}
    assert one == {0, 1, 2, 3}
    # phrase absent everywhere -> empty; analyzer-empty phrase -> empty
    assert eng.search_phrase("fast merge", k=10).count() == 0
    assert eng.search_phrase("", k=10).count() == 0

    # executed-plan pin (the docstring's claims): candidates broadcast
    # into the docs join, verify UDF above it, one TakeOrdered at the
    # top, and NO global sort between them (Catalyst eliminates the
    # k=None candidate sort under the join)
    df = eng.search_phrase("merge sort", k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    top = plan.split("MapInPandas", 1)[0]
    assert "Sort" not in top

    # facets over the full "merge" match set, (n_docs desc, value asc)
    fc = [(r["source"], r["n_docs"]) for r in eng.facet_counts("merge", by="source").collect()]
    assert fc == [("a", 2), ("b", 2)]
    fc2 = [(r["source"], r["n_docs"]) for r in eng.facet_counts("nothing", by="source").collect()]
    assert fc2 == [("b", 1)]


def test_more_like_this(spark):
    """Similar-doc retrieval: seed's top tf*idf terms as an Any query,
    seed excluded; rare shared terms dominate the selection."""
    corpus = spark.createDataFrame(
        [
            (0, "zebra zebra quark common common common"),
            (1, "zebra quark plus other words common"),   # shares the rare terms
            (2, "common words only here nothing rare"),
            (3, "totally unrelated text body"),
        ],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )
    hits = eng.more_like_this(0, k=10, max_terms=3).collect()
    ids = [r["doc_id"] for r in hits]
    assert 0 not in ids          # seed never returned
    assert ids[0] == 1           # rare-term sharer ranks first
    assert 3 not in ids          # no shared selected terms at all
    # unknown seed id -> empty, never raises
    assert eng.more_like_this(999, k=10).count() == 0


def test_snippets_positions_and_context(spark):
    """Highlighting: 1-based first-occurrence position over the analyzed
    stream, ±window context clipped at doc edges, empty for termless
    hits."""
    corpus = spark.createDataFrame(
        [
            (0, "zzz yyy xxx TARGET aaa bbb ccc ddd"),   # middle hit
            (1, "target starts this document body"),      # pos 1, left-clipped
            (2, "ends right at the target"),              # right-clipped
            (3, "no match here at all"),
        ],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )
    rows = {r["doc_id"]: r for r in eng.snippets("target", k=10, window=2).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["pos"] == 4 and rows[0]["snippet"] == "yyy xxx target aaa bbb"
    assert rows[1]["pos"] == 1 and rows[1]["snippet"] == "target starts this"
    assert rows[2]["pos"] == 5 and rows[2]["snippet"] == "at the target"
    # ordering is the search ordering (score desc, doc_id asc)
    ordered = [r["doc_id"] for r in eng.snippets("target", k=10, window=2).collect()]
    scores = [rows[d]["score"] for d in ordered]
    assert scores == sorted(scores, reverse=True)


def test_search_job_modes(spark, tmp_path, capsys):
    """The spark-submit search job's query modes (bm25/phrase/prefix/
    fuzzy/mlt/--snippets) against a persisted epoch."""
    import sys

    from perlin_spark.epochs import build_epoch

    sys.path.insert(0, "/root/repo/jobs")
    import search as job

    corpus = spark.createDataFrame(
        [
            (0, "merge sort is fast and stable"),
            (1, "sort then merge the runs"),
            (2, "merchant ledger entry"),
            (3, "unrelated body of text"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "idx")
    build_epoch(
        spark, corpus, [FieldSpec(field="text", source="text")], root,
        n_shards=2, buckets=4,
    )

    def run(*argv):
        assert job.main(["--index", root, *argv]) == 0
        return [
            ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines() if ln
        ]

    assert {r[0] for r in run("--query", "merge sort")} == {"0", "1"}
    assert {r[0] for r in run("--query", "merge sort", "--mode", "phrase")} == {"0"}
    # prefix 'mer' reaches the merchant doc too
    assert {r[0] for r in run("--query", "mer", "--mode", "prefix")} == {"0", "1", "2"}
    assert {r[0] for r in run("--query", "sost", "--mode", "fuzzy")} == {"0", "1"}
    mlt = run("--query", "0", "--mode", "mlt")
    assert "0" not in {r[0] for r in mlt} and mlt
    snip = run("--query", "merge", "--snippets")
    assert all(len(r) == 4 for r in snip) and snip[0][2] != "0"


def test_fuzzy_symspell_table(spark, tmp_path):
    """Fuzzy expansion probes the deletion-neighborhood table (r4 verdict
    item 5): full-recall parity with a band levenshtein scan, an executed
    plan keyed by ``delkey`` (never a vocabulary-wide distance pass), the
    band fallback beyond the table's depth, and the committed table
    (build_epoch(symspell=True)) attaching at load."""
    from pyspark.sql import functions as F

    from perlin_spark import build_epoch, compact_epochs, load_index

    corpus = spark.createDataFrame(
        [
            (0, "merge sort merge"),
            (1, "merged branches fast"),
            (2, "merchant ledger sort"),
            (3, "sorting is not a term here"),
        ],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )

    # parity with a reference band scan, for every probe and depth
    vocab = eng.index.vocabulary.filter(F.col("field") == "text")
    for probe in ("merge", "sost", "mergd", "ledgr", "qqq"):
        for e in (1, 2):
            want = sorted(
                r["term"]
                for r in vocab.select("term")
                .filter(F.levenshtein("term", F.lit(probe)) <= e)
                .collect()
            )
            got = sorted(
                r["term"] for r in eng._fuzzy_candidates("text", probe, e).collect()
            )
            assert got == want, (probe, e)

    # the candidate plan is keyed by delkey (IN-probe), not a vocab scan
    cand = eng._fuzzy_candidates("text", "sost", 1)
    cand.collect()
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "delkey" in plan
    # beyond the table depth: band fallback, no delkey
    deep = eng._fuzzy_candidates("text", "sost", 3)
    deep.collect()
    assert "delkey" not in deep._jdf.queryExecution().executedPlan().toString()

    # committed table: build_epoch(symspell=True) persists it and
    # load_index attaches it (no derivation job on the query path)
    root = str(tmp_path / "idx")
    build_epoch(spark, corpus, [spec], root, n_shards=2, buckets=4, symspell=True)
    idx = load_index(spark, root)
    assert idx._symspell is not None
    eng2 = PerlinEngine(idx, QueryPipeline(text_spec=spec))
    assert eng2.expand_fuzzy("text", "sost", max_edits=1) == ["sort"]
    assert eng2.expand_fuzzy("text", "merge", max_edits=1) == ["merge", "merged"]
    # compaction re-derives the table from the compacted vocabulary
    c2 = spark.createDataFrame([(4, "sorted output")], "doc_id long, text string")
    build_epoch(spark, c2, [spec], root, n_shards=2, buckets=4, symspell=True)
    assert compact_epochs(spark, root) is not None
    idx3 = load_index(spark, root)
    assert idx3._symspell is not None
    eng3 = PerlinEngine(idx3, QueryPipeline(text_spec=spec))
    assert eng3.expand_fuzzy("text", "sorted", max_edits=1) == ["sorted"]


def test_bm25_plan_invariant_to_sidecars(spark):
    """Scaling-evidence transfer guard: the BM25 search plan is
    byte-identical (modulo expression ids) whether or not the index
    carries the positional sidecar, a derived SymSpell table, or an
    EMPTY tombstone set — those features are additive no-ops on the
    build/query hot path, so N-vs-4N throughput measured on a plain
    build transfers to a feature-enabled one."""
    import re

    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(8)], "doc_id long, text string"
    )
    spec = FieldSpec(field="text", source="text")

    def norm_plan(df):
        df.collect()
        s = df._jdf.queryExecution().executedPlan().toString()
        s = re.sub(r"#\d+", "#x", s)
        s = re.sub(r"plan_id=\d+", "plan_id=x", s)
        s = re.sub(r"\[id=#?x?\d*\]", "[id=x]", s)
        return s

    plain = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )
    loaded = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=2, positions=True,
    )
    loaded.index.symspell()  # derive the deletion table
    # empty tombstone set: present but must short-circuit to None
    loaded.index.set_deleted(
        spark.createDataFrame([], "doc_id long")
    )
    assert loaded.index.deleted_broadcast() is None

    p1 = norm_plan(plain.search("alpha beta", k=5))
    p2 = norm_plan(loaded.search("alpha beta", k=5))
    assert p1 == p2


def test_wildcard_search(spark):
    """Glob expansion: * / ? compile to a LIKE predicate over the
    vocabulary (df desc, term asc, capped); literal % / _ in a pattern
    are escaped, not wildcards; the scored search equals the explicit
    Any QuerySpec over the expanded terms."""
    from perlin_spark.analysis import QuerySpec

    corpus = spark.createDataFrame(
        [
            (0, "merge sort merge"),
            (1, "merged branches fast"),
            (2, "merchant ledger sort"),
            (3, "m_rge literal%token"),
        ],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )

    assert eng.expand_wildcard("text", "mer*") == ["merchant", "merge", "merged"]
    assert eng.expand_wildcard("text", "merge?") == ["merged"]
    assert eng.expand_wildcard("text", "m*ge") == ["m_rge", "merge"]
    assert eng.expand_wildcard("text", "*ort*") == ["sort"]
    assert eng.expand_wildcard("text", "mer*", max_terms=2) == ["merchant", "merge"]
    # literal _ and % must NOT act as wildcards
    assert eng.expand_wildcard("text", "m_rge") == ["m_rge"]
    assert eng.expand_wildcard("text", "m?rge") == ["m_rge", "merge"]
    assert eng.expand_wildcard("text", "literal%*") == ["literal%token"]
    assert eng.expand_wildcard("text", "zzz*") == []

    got = [(r["doc_id"], round(r["score"], 9))
           for r in eng.search_wildcard("mer*", k=10).collect()]
    want = [(r["doc_id"], round(r["score"], 9))
            for r in eng.search(QuerySpec(
                groups=(("text", "any", ("merchant", "merge", "merged")),),
                filters=()), k=10).collect()]
    assert got == want and got
    assert eng.search_wildcard("zzz*", k=10).count() == 0


def test_explain_query(spark):
    """explain_query reports exactly the scorer-closure metadata: per-op
    df/idf/weight/role with a positive impact bound, the driver-side
    bucket pruning set, the dl path, similarity, and sidecar state —
    and reflects runtime changes (similarity swap, tombstones)."""
    import math

    from perlin_spark import Must

    corpus = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(8)],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec],
        pipeline=QueryPipeline(text_spec=spec, text_combinator="all"),
        n_shards=2, positions=True,
    )
    ex = eng.explain_query("alpha gamma", filters=[Must("text", "beta")])
    assert ex["similarity"] == "bm25" and ex["n_groups"] == 1 and ex["n_must"] == 1
    assert ex["dl_path"] in ("broadcast", "join")
    assert ex["n_deleted"] == 0 and ex["positions_sidecar"] is True
    assert ex["buckets_pruned_to"] is None  # in-memory build: no buckets
    by = {(t["field"], t["term"], t["role"]): t for t in ex["terms"]}
    assert set(by) == {("text", "alpha", "group"), ("text", "gamma", "group"),
                       ("text", "beta", "must")}
    a = by[("text", "alpha", "group")]
    assert a["df"] == 8
    assert abs(a["idf"] - math.log(1 + (8 - 8 + 0.5) / (8 + 0.5))) < 1e-9
    g = by[("text", "gamma", "group")]
    assert g["df"] == 5 and g["idf"] > a["idf"] > 0
    assert all(t["impact_bound_tf1"] > 0 for t in ex["terms"])

    eng.index.similarity = "tfidf"
    ex2 = eng.explain_query("alpha gamma")
    assert ex2["similarity"] == "tfidf"
    g2 = [t for t in ex2["terms"] if t["term"] == "gamma"][0]
    # tfidf bound at tf=1: idf^2 / sqrt(mindl); shortest doc is "alpha beta"
    assert abs(g2["impact_bound_tf1"] - g2["idf"] ** 2 / math.sqrt(2)) < 1e-9

    eng.index.set_deleted(spark.createDataFrame([(0,), (3,)], "doc_id long"))
    assert eng.explain_query("alpha")["n_deleted"] == 2


def test_search_many_batch_parity(spark):
    """Batch retrieval returns EXACTLY the per-query search results for
    every query in one job — including unknown-term and empty queries
    (no rows), shared filters, list inputs (auto ids), k=None, and
    tombstones; per-query order is (score desc, doc_id asc)."""
    from perlin_spark import Must

    corpus = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} " + ("dup " if i % 2 else "gamma "))
         for i in range(30)],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, corpus, [spec],
        pipeline=QueryPipeline(text_spec=spec, text_combinator="all"),
        n_shards=3,
    ).cache()

    qs = {"a": "alpha gamma", "b": "w1 dup", "c": "zzz", "d": "", "e": "alpha"}
    rows = eng.search_many(qs, k=4).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    for qid, q in qs.items():
        want = [(r["doc_id"], round(r["score"], 9))
                for r in eng.search(q, k=4).collect()]
        assert got.get(qid, []) == want, qid
    assert "c" not in got and "d" not in got

    # list input (auto ids), filters, k=None
    b = eng.search_many(["alpha"], k=None, filters=[Must("text", "dup")]).collect()
    w = eng.search("alpha", k=None, filters=[Must("text", "dup")]).collect()
    assert [r["doc_id"] for r in b] == [r["doc_id"] for r in w]
    assert all(r["query_id"] == "q0" for r in b)

    # tombstones apply to every query in the batch
    eng.index.set_deleted(spark.createDataFrame([(1,), (3,)], "doc_id long"))
    b2 = {r["doc_id"] for r in eng.search_many({"x": "dup"}, k=None).collect()}
    assert b2 and not b2 & {1, 3}


# --- Range filter (engine.Range -> must_any zero-weight group) ------------

@pytest.fixture(scope="module")
def range_engine(spark):
    from perlin_spark.analysis import reference_specs
    from perlin_spark.fixtures import golden_corpus

    eng = PerlinEngine.build(
        spark, golden_corpus(spark), reference_specs(), n_shards=2, block_size=4
    ).cache()
    eng.pipeline = QueryPipeline(
        text_spec=FieldSpec(
            field="text", source="text", stem=True, number_field="number"
        ),
        text_combinator="all",
        number_combinator="any",
    )
    return eng


def test_range_filter_restricts(range_engine):
    from perlin_spark import Range

    # golden numbers: doc0=10, doc1=125, doc2=2567 (FIXTURES.md §3)
    hits = range_engine.search("flew", k=10, filters=[Range("number", 100, 3000)])
    assert sorted(r["doc_id"] for r in hits.collect()) == [1, 2]
    hits = range_engine.search("flew", k=10, filters=[Range("number", 11, 124)])
    assert hits.collect() == []


def test_range_filter_score_invariant(range_engine):
    """A Range filter restricts candidates but must not perturb BM25."""
    from perlin_spark import Range

    base = {r["doc_id"]: r["score"]
            for r in range_engine.search("flew", k=10).collect()}
    got = {r["doc_id"]: r["score"]
           for r in range_engine.search(
               "flew", k=10, filters=[Range("number", 100, 3000)]).collect()}
    assert got == {d: base[d] for d in (1, 2)}


def test_range_only_query(range_engine):
    """No text group: pure range scan, score 0, doc_id-ascending ties."""
    from perlin_spark import Range

    rows = range_engine.search("", k=10, filters=[Range("number", 0, 200)]).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert all(r["score"] == 0.0 for r in rows)


def test_range_boundary_and_cap(range_engine):
    from perlin_spark import Range

    # inclusive bounds: [10, 125] holds both endpoints
    rows = range_engine.search("", k=10, filters=[Range("number", 10, 125)]).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]
    assert range_engine.expand_range("number", 0, 10**19) == ["10", "125", "2567"]
    with pytest.raises(ValueError, match="split the range"):
        range_engine.expand_range("number", 0, 10**19, max_terms=2)


# --- Field-weighted multi-field search (search_fields / BM25F-lite) -------

def test_search_fields_single_field_parity(range_engine):
    """boost=1.0 over one field == the plain Any-combinator query."""
    pl = QueryPipeline(
        text_spec=FieldSpec(
            field="text", source="text", stem=True, number_field="number"
        ),
        text_combinator="any",
    )
    want = [(r["doc_id"], r["score"])
            for r in range_engine.search("birds flew", k=10, pipeline=pl).collect()]
    got = [(r["doc_id"], r["score"])
           for r in range_engine.search_fields("birds flew", {"text": 1.0}, k=10).collect()]
    assert got == want and len(got) == 3


def test_search_fields_union_and_boost_linearity(range_engine):
    """A doc matching in ANY boosted field is a hit, and a field's
    contribution scales linearly in its boost."""
    def score2(tb):
        rows = range_engine.search_fields(
            "deimos", {"text": 1.0, "title": tb}, k=10).collect()
        return {r["doc_id"]: r["score"] for r in rows}

    s0, s1, s2 = score2(0.0), score2(1.0), score2(2.0)
    # doc2 holds 'deimos' in text AND title (golden corpus)
    assert set(s0) == set(s1) == set(s2) == {2}
    title_part = s1[2] - s0[2]
    assert title_part > 0
    assert s2[2] - s0[2] == pytest.approx(2 * title_part)


def test_search_fields_title_only_and_unknown_field(range_engine):
    rows = range_engine.search_fields("unicorns", {"title": 3.0}, k=10).collect()
    assert [r["doc_id"] for r in rows] == [2]
    with pytest.raises(KeyError, match="no indexed field"):
        range_engine.search_fields("x", {"nope": 1.0})
    assert range_engine.search_fields("", {"text": 1.0}, k=10).collect() == []


def test_search_after_pagination(range_engine):
    """Cursor paging: concatenated pages (k=3 each) reproduce the full
    ranking exactly, on BOTH scorer paths (maxscore single-Any-group OR
    query, and the exhaustive mixed-group path), and a cursor past the
    last row yields an empty page."""
    pl_any = QueryPipeline(
        text_spec=FieldSpec(field="text", source="text", stem=True,
                            number_field="number"),
        text_combinator="any",
    )

    def pages(query, **kwargs):
        full = [(r["doc_id"], r["score"])
                for r in range_engine.search(
                    query, k=None, pipeline=pl_any, **kwargs).collect()]
        walked, cursor = [], None
        while True:
            page = [(r["doc_id"], r["score"])
                    for r in range_engine.search(
                        query, k=1, after=cursor, pipeline=pl_any,
                        **kwargs).collect()]
            if not page:
                break
            walked.extend(page)
            # the cursor is (score, doc_id); rows are (doc_id, score)
            cursor = (page[-1][1], page[-1][0])
        return full, walked

    # maxscore path: single Any group, multi-term, prune=True
    full, walked = pages("birds flew deimos")
    assert len(full) == 3 and walked == full
    # exhaustive path: pruning disabled (forces the plain scorer)
    full2, walked2 = pages("birds flew deimos", prune=False)
    assert walked2 == full2 == full
    # cursor at the very end -> empty page
    assert range_engine.search(
        "birds flew deimos", k=3, after=(full[-1][1], full[-1][0]),
        pipeline=pl_any,
    ).collect() == []
    # swapped (doc_id, score) cursor -> loud error, not silent truncation
    with pytest.raises(ValueError, match="did you swap"):
        range_engine.search(
            "birds flew deimos", k=3, after=(full[0][0], full[0][1]),
            pipeline=pl_any,
        )


# --- suggest ("did you mean") ----------------------------------------------

@pytest.fixture(scope="module")
def suggest_engine(spark):
    docs = spark.createDataFrame(
        [
            (0, "merge sort window merge stream"),
            (1, "window stream merge filter"),
            (2, "filter stream stream scan"),
        ],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    return PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    ).cache()


def test_suggest_ranks_by_dist_then_df(suggest_engine):
    rows = [tuple(r) for r in suggest_engine.suggest("merg streem window", k=2).collect()]
    by_tok = {}
    for pos, tok, term, df, dist in rows:
        by_tok.setdefault((pos, tok), []).append((term, df, dist))
    # misspelled tokens correct at dist 1; exact token is its own dist-0 row
    assert by_tok[(0, "merg")][0] == ("merge", 2, 1)
    assert by_tok[(1, "streem")][0] == ("stream", 3, 1)
    assert by_tok[(2, "window")][0] == ("window", 2, 0)
    # ranking is (dist asc, df desc): merge(df 2) beats scan(df 1) for 'mergn'?
    # check tie-break shape instead: every token's rows are sorted
    for cands in by_tok.values():
        assert cands == sorted(cands, key=lambda c: (c[2], -c[1], c[0]))


def test_suggest_fallback_beyond_symspell_depth(suggest_engine):
    # max_edits=3 exceeds SYMSPELL_MAX_EDITS=2 -> length-banded fallback
    rows = [tuple(r) for r in suggest_engine.suggest("mergeee", k=1, max_edits=3).collect()]
    assert rows == [(0, "mergeee", "merge", 2, 2)]


def test_suggest_empty_and_unknown(suggest_engine):
    assert suggest_engine.suggest("", k=3).collect() == []
    # nothing within 2 edits of a long nonsense token -> no rows for it
    assert suggest_engine.suggest("qqqqzzzzqqqq", k=3).collect() == []


# --- query-time synonyms ----------------------------------------------------

def test_synonym_expansion_semantics(suggest_engine):
    """fast->(quick|rapid): conjunctive query becomes intersecting Any
    subgroups; a doc matching via an alternate is a hit, scores sum over
    matched alternates, and absent alternates are harmless no-ops."""
    from pyspark.sql import functions as F  # noqa: F401

    eng = suggest_engine
    syn = {"stream": ("scan",)}
    # 'merge stream' conjunctive: docs 0,1 have both; doc 2 has scan+stream
    base = {r["doc_id"]: r["score"] for r in eng.search("merge stream", k=10).collect()}
    expanded = {r["doc_id"]: r["score"]
                for r in eng.search("merge stream", k=10, synonyms=syn).collect()}
    assert set(base) == {0, 1}
    assert set(expanded) == {0, 1}          # doc 2 lacks 'merge' either way
    # doc 2's 'scan' now satisfies the stream-slot for the OR pipeline
    pl_terms = eng.pipeline.analyze("merge stream").groups
    assert pl_terms == (("text", "all", ("merge", "stream")),)
    import dataclasses
    pl_syn = dataclasses.replace(eng.pipeline, synonyms=syn)
    assert pl_syn.analyze("merge stream").groups == (
        ("text", "any", ("merge",)),
        ("text", "any", ("stream", "scan")),
    )
    # score grows where an alternate ALSO matches (doc 2 has scan+stream:
    # not a candidate w/o merge; doc 1 unchanged - no scan occurrences)
    assert expanded[1] == pytest.approx(base[1])
    # absent alternate: pure no-op
    same = {r["doc_id"]: r["score"]
            for r in eng.search("merge stream", k=10,
                                synonyms={"stream": ("zzznope",)}).collect()}
    assert same == pytest.approx(base)


def test_synonym_any_combinator_union(suggest_engine):
    import dataclasses

    pl = dataclasses.replace(
        suggest_engine.pipeline, text_combinator="any",
        synonyms={"merge": ("filter",)},
    )
    assert pl.analyze("merge stream").groups == (
        ("text", "any", ("merge", "filter", "stream")),
    )
    got = {r["doc_id"] for r in suggest_engine.search(
        "merge", k=10, pipeline=pl).collect()}
    assert got == {0, 1, 2}   # doc 2 matches via the 'filter' alternate


# --- sort-by-stored-field ----------------------------------------------------

def test_search_sorted_by_stored_field(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", 10), (1, "alpha", 99), (2, "alpha beta", 55),
         (3, "gamma", 7)],
        "doc_id long, text string, stars long",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )
    got = [(r["doc_id"], r["stars"])
           for r in eng.search_sorted("alpha beta", by="stars", k=10).collect()]
    assert got == [(2, 55), (0, 10)]          # conjunctive match, stars desc
    got_asc = [r["doc_id"] for r in eng.search_sorted(
        "alpha", by="stars", k=2, ascending=True).collect()]
    assert got_asc == [0, 2]                  # stars asc, k cut
    with pytest.raises(KeyError, match="no stored column"):
        eng.search_sorted("alpha", by="nope")


# --- minimum-should-match -----------------------------------------------------

def test_min_match_dial(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta"), (2, "alpha"),
         (3, "beta gamma"), (4, "delta")],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    pl = QueryPipeline(text_spec=spec, text_combinator="any")
    eng = PerlinEngine.build(spark, docs, [spec], pipeline=pl, n_shards=2).cache()
    q = "alpha beta gamma"

    def ids(**kw):
        return sorted(r["doc_id"] for r in eng.search(q, k=10, **kw).collect())

    assert ids(min_match=1) == [0, 1, 2, 3]       # plain OR
    assert ids(min_match=2) == [0, 1, 3]
    assert ids(min_match=3) == [0]                # == AND
    assert ids(min_match=4) == []                 # unsatisfiable
    # mm=1 must equal the default OR ranking exactly (scores included)
    base = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10).collect()]
    mm1 = [(r["doc_id"], r["score"]) for r in eng.search(q, k=10, min_match=1).collect()]
    assert mm1 == base
    # scores at mm=2 still sum over ALL matched terms (doc 0 outranks 1/3)
    top = eng.search(q, k=1, min_match=2).collect()[0]
    assert top["doc_id"] == 0
    # min_match on an 'all' group refuses
    with pytest.raises(ValueError, match="'any' groups only"):
        from perlin_spark.analysis import QuerySpec
        eng.search(QuerySpec(groups=(("text", "all", ("alpha", "beta"), 2),)), k=5)


# --- per-term boosts -----------------------------------------------------------

def test_term_boosts_scale_contribution(suggest_engine):
    eng = suggest_engine
    base = {r["doc_id"]: r["score"] for r in eng.search("merge stream", k=10).collect()}
    # boost=1 for every term: byte-identical to the default path
    same = {r["doc_id"]: r["score"]
            for r in eng.search("merge stream", k=10,
                                boosts={"merge": 1.0, "stream": 1.0}).collect()}
    assert same == base
    # boost=0 zeroes a term's contribution but keeps it matching
    zero = {r["doc_id"]: r["score"]
            for r in eng.search("merge stream", k=10, boosts={"stream": 0.0}).collect()}
    assert set(zero) == set(base)
    only_merge = {r["doc_id"]: r["score"]
                  for r in eng.search("merge", k=10).collect()}
    for d, s in zero.items():
        assert s == pytest.approx(only_merge[d])
    # boost=3 triples exactly the boosted term's share
    tripled = {r["doc_id"]: r["score"]
               for r in eng.search("merge stream", k=10, boosts={"stream": 3.0}).collect()}
    for d in base:
        stream_part = base[d] - only_merge.get(d, 0.0)
        assert tripled[d] == pytest.approx(only_merge.get(d, 0.0) + 3.0 * stream_part)


def test_describe_index_summary(suggest_engine):
    d = suggest_engine.describe()
    assert d["n_docs"] == 3 and d["fields"] == ["text"]
    assert d["terms_per_field"]["text"] == 6   # merge sort window stream filter scan
    assert d["postings_rows"] > 0 and d["similarity"] == "bm25"
    assert d["k1"] == 1.2 and d["b"] == 0.75
    assert d["positions_sidecar"] is False and d["deleted_docs"] == 0


def test_facet_stats(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", "py", 10), (1, "alpha", "py", 30),
         (2, "alpha beta", "rs", 20), (3, "gamma", "py", 99)],
        "doc_id long, text string, lang string, stars long",
    )
    spec = FieldSpec(field="text", source="text")
    pl = QueryPipeline(text_spec=spec, text_combinator="any")
    eng = PerlinEngine.build(spark, docs, [spec], pipeline=pl, n_shards=2)
    rows = {r["lang"]: r for r in eng.facet_stats("alpha", by="lang", value="stars").collect()}
    assert rows["py"]["n_docs"] == 2 and rows["py"]["min_value"] == 10
    assert rows["py"]["max_value"] == 30 and rows["py"]["sum_value"] == 40
    assert rows["py"]["avg_value"] == pytest.approx(20.0)
    assert rows["rs"]["n_docs"] == 1 and rows["rs"]["sum_value"] == 20
    with pytest.raises(KeyError, match="no stored column"):
        eng.facet_stats("alpha", by="lang", value="nope")


def test_min_match_guards(suggest_engine):
    # suggest_engine's pipeline is conjunctive: min_match must refuse
    with pytest.raises(ValueError, match="disjunctive text group"):
        suggest_engine.search("merge stream", min_match=2)
    # and never combine with synonyms
    import dataclasses
    pl_any = dataclasses.replace(suggest_engine.pipeline, text_combinator="any")
    with pytest.raises(ValueError, match="cannot combine with synonyms"):
        suggest_engine.search("merge stream", pipeline=pl_any, min_match=2,
                              synonyms={"merge": ("filter",)})


@pytest.fixture(scope="module")
def collapse_engine(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma", "py"), (1, "alpha beta", "py"),
         (2, "alpha", "rs"), (3, "alpha beta beta", "rs"),
         (4, "delta", "go"), (5, "alpha gamma gamma", "go")],
        "doc_id long, text string, lang string",
    )
    spec = FieldSpec(field="text", source="text")
    pl = QueryPipeline(text_spec=spec, text_combinator="any")
    return PerlinEngine.build(spark, docs, [spec], pipeline=pl, n_shards=2)


def test_search_collapse_top1_per_group(collapse_engine):
    """ES field collapsing: best doc per lang only, globally ranked."""
    rows = collapse_engine.search_collapse("alpha", by="lang", k=10).collect()
    assert [r["doc_id"] for r in rows] == [2, 1, 5]   # one per lang
    assert len({r["lang"] for r in rows}) == 3
    # survivors are each group's highest-scoring member
    full = {r["doc_id"]: r["score"]
            for r in collapse_engine.search("alpha", k=None).collect()}
    assert rows[0]["score"] == pytest.approx(max(full[2], full[3]))


def test_search_collapse_per_group_matches_window_path(collapse_engine):
    """per_group=1 takes the max_by aggregate path; it must agree with the
    general window path run at per_group=1... which we can't invoke
    directly, so compare against per_group=2 truncated per group."""
    top1 = collapse_engine.search_collapse("alpha", by="lang", k=None).collect()
    top2 = collapse_engine.search_collapse(
        "alpha", by="lang", k=None, per_group=2
    ).collect()
    best_of_two = {}
    for r in top2:
        cur = best_of_two.get(r["lang"])
        if cur is None or (r["score"], -r["doc_id"]) > (cur["score"], -cur["doc_id"]):
            best_of_two[r["lang"]] = r
    assert {r["doc_id"] for r in top1} == {r["doc_id"] for r in best_of_two.values()}
    # per_group=2 keeps at most two per lang and stays score-ranked
    from collections import Counter
    assert max(Counter(r["lang"] for r in top2).values()) <= 2
    scores = [r["score"] for r in top2]
    assert scores == sorted(scores, reverse=True)


def test_search_collapse_guards(collapse_engine):
    with pytest.raises(KeyError, match="no stored column"):
        collapse_engine.search_collapse("alpha", by="nope")
    with pytest.raises(ValueError, match="per_group"):
        collapse_engine.search_collapse("alpha", by="lang", per_group=0)


def test_significant_terms_jlh(collapse_engine):
    """JLH on a hand-computable corpus: query 'beta' -> fg docs {0,1,3}.
    beta: fg 3/3 vs bg 3/6 -> (1-.5)*(1/.5)=1.0; alpha: fg 3/3 vs bg 5/6
    -> (1/6)*(6/5)=0.2; gamma: fg 1/3 == bg 2/6 -> excluded (no lift)."""
    rows = {r["term"]: r for r in
            collapse_engine.significant_terms("beta", k=10, min_fg=1).collect()}
    assert set(rows) == {"beta", "alpha"}
    assert rows["beta"]["fg_df"] == 3 and rows["beta"]["bg_df"] == 3
    assert rows["beta"]["score"] == pytest.approx(1.0)
    assert rows["alpha"]["score"] == pytest.approx(0.2)
    # min_fg floor drops low-support buckets
    only_hi = collapse_engine.significant_terms("gamma", k=10, min_fg=2).collect()
    assert all(r["fg_df"] >= 2 for r in only_hi)


def test_facet_histogram(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", 5), (1, "alpha", 12), (2, "alpha beta", 19),
         (3, "gamma", 25), (4, "alpha gamma", 31)],
        "doc_id long, text string, stars long",
    )
    spec = FieldSpec(field="text", source="text")
    pl = QueryPipeline(text_spec=spec, text_combinator="any")
    eng = PerlinEngine.build(spark, docs, [spec], pipeline=pl, n_shards=2)
    rows = [(r["bucket"], r["n_docs"])
            for r in eng.facet_histogram("alpha", value="stars", interval=10).collect()]
    assert rows == [(0, 1), (10, 2), (30, 1)]   # doc 3 (gamma) absent
    with pytest.raises(KeyError, match="no stored column"):
        eng.facet_histogram("alpha", value="nope", interval=10)
    with pytest.raises(ValueError, match="interval"):
        eng.facet_histogram("alpha", value="stars", interval=0)


def test_term_vectors(collapse_engine):
    """ES termvectors: per-doc tf via candidates-only re-analysis; must
    equal the postings the index holds for those docs."""
    rows = [(r["doc_id"], r["term"], r["tf"])
            for r in collapse_engine.term_vectors([0, 3]).collect()]
    assert rows == [
        (0, "alpha", 1), (0, "beta", 1), (0, "gamma", 1),
        (3, "alpha", 1), (3, "beta", 2),
    ]
    # unknown doc id -> empty, never raises
    assert collapse_engine.term_vectors(999).count() == 0


# --- function score / rescore ---------------------------------------------------

@pytest.fixture(scope="module")
def rescore_engine(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta sort merge", 10), (1, "alpha beta", 200),
         (2, "alpha beta sort", 30), (3, "alpha beta merge sort", 1),
         (4, "sort merge", 500), (5, "alpha beta beta", 40)],
        "doc_id long, text string, stars long",
    )
    spec = FieldSpec(field="text", source="text")
    return PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    ).cache()


def test_function_score_field_value_factor(rescore_engine):
    import math

    eng = rescore_engine
    base = {r["doc_id"]: r["score"] for r in eng.search("alpha beta", k=None).collect()}
    stars = {0: 10, 1: 200, 2: 30, 3: 1, 5: 40}
    # multiply x log1p (the ES default-ish shape)
    got = {r["doc_id"]: r["score"]
           for r in eng.search_function_score("alpha beta", "stars", k=None).collect()}
    want = {d: s * math.log1p(stars[d]) for d, s in base.items()}
    assert got == pytest.approx(want)
    # sum mode + sqrt modifier + factor
    got2 = {r["doc_id"]: r["score"]
            for r in eng.search_function_score(
                "alpha beta", "stars", k=None, factor=4.0,
                modifier="sqrt", boost_mode="sum").collect()}
    want2 = {d: s + math.sqrt(4.0 * stars[d]) for d, s in base.items()}
    assert got2 == pytest.approx(want2)
    # ordering respects the combined score, (score desc, doc_id asc)
    rows = eng.search_function_score("alpha beta", "stars", k=3).collect()
    ordered = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [r["doc_id"] for r in rows] == [d for d, _ in ordered]
    with pytest.raises(KeyError, match="no stored column"):
        eng.search_function_score("alpha", "nope")
    with pytest.raises(ValueError, match="modifier"):
        eng.search_function_score("alpha", "stars", modifier="exp")
    with pytest.raises(ValueError, match="boost_mode"):
        eng.search_function_score("alpha", "stars", boost_mode="max")


def test_rescore_window_blend(rescore_engine):
    eng = rescore_engine
    primary = {r["doc_id"]: r["score"] for r in eng.search("alpha beta", k=None).collect()}
    secondary = {r["doc_id"]: r["score"] for r in eng.search("sort merge", k=None).collect()}
    # window covers the whole match set: every match blends both signals
    got = {r["doc_id"]: r["score"]
           for r in eng.search_rescore("alpha beta", "sort merge",
                                       k=None, window=10, rescore_weight=2.0).collect()}
    want = {d: p + 2.0 * secondary.get(d, 0.0) for d, p in primary.items()}
    assert got == pytest.approx(want)
    # doc 4 matches ONLY the rescore query -> never appears (window gates)
    assert 4 not in got
    # a narrow window: only the top-`window` primary docs are rescored
    top2 = sorted(primary.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    got2 = {r["doc_id"]: r["score"]
            for r in eng.search_rescore("alpha beta", "sort merge",
                                        k=None, window=2, rescore_weight=2.0).collect()}
    assert got2 == pytest.approx(
        {d: p + 2.0 * secondary.get(d, 0.0) for d, p in top2})
    # rescore query matching nothing in-window: pure primary order/scores
    got3 = {r["doc_id"]: r["score"]
            for r in eng.search_rescore("alpha beta", "zzz",
                                        k=None, window=10).collect()}
    assert got3 == pytest.approx(primary)
    with pytest.raises(ValueError, match="window"):
        eng.search_rescore("alpha", "beta", window=0)
    # empty primary -> empty result, no job explosion
    assert eng.search_rescore("zzz", "alpha", k=5).count() == 0


def test_restrict_ids_matches_exhaustive_and_caps(rescore_engine):
    """The scorer's inclusion filter: MaxScore-pruned restricted search
    equals the exhaustive restricted ranking; oversized sets refuse."""
    from perlin_spark.query import RESTRICT_CLOSURE_MAX, search as qsearch

    eng = rescore_engine
    pl = QueryPipeline(text_spec=FieldSpec(field="text", source="text"),
                       text_combinator="any")
    spec = pl.analyze("alpha merge", ())
    ids = [0, 2, 4]
    pruned = [(r["doc_id"], r["score"]) for r in qsearch(
        eng.index, spec, k=2, prune=True, restrict_ids=ids).collect()]
    exhaustive = [(r["doc_id"], r["score"]) for r in qsearch(
        eng.index, spec, k=None, prune=False, restrict_ids=ids).collect()[:2]]
    assert pruned == exhaustive
    assert {d for d, _ in pruned} <= set(ids)
    with pytest.raises(ValueError, match="restrict_ids"):
        qsearch(eng.index, spec, k=2,
                restrict_ids=range(RESTRICT_CLOSURE_MAX + 1))


# --- facet percentiles / keywords ------------------------------------------------

def test_facet_percentiles_exact(spark):
    import numpy as np

    docs = spark.createDataFrame(
        [(0, "alpha", "py", 10), (1, "alpha", "py", 200), (2, "alpha", "py", 30),
         (3, "alpha", "rs", 1), (4, "alpha", "rs", 40), (5, "beta", "rs", 7)],
        "doc_id long, text string, lang string, stars long",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )
    got = {r["lang"]: r for r in eng.facet_percentiles(
        "alpha", by="lang", value="stars", percentiles=(0.5, 0.95)).collect()}
    groups = {"py": [10, 200, 30], "rs": [1, 40]}
    for lang, vals in groups.items():
        assert got[lang]["n_docs"] == len(vals)
        # Spark exact percentile == numpy linear interpolation (type 7)
        assert got[lang]["p50_value"] == pytest.approx(
            float(np.percentile(vals, 50)))
        assert got[lang]["p95_value"] == pytest.approx(
            float(np.percentile(vals, 95)))
    # doc 5 (beta) never contributes
    assert got["rs"]["n_docs"] == 2
    with pytest.raises(ValueError, match="percentiles"):
        eng.facet_percentiles("alpha", by="doc_id", value="stars",
                              percentiles=(1.5,))
    with pytest.raises(KeyError, match="no stored column"):
        eng.facet_percentiles("alpha", by="nope", value="stars")


def test_keywords_tfidf_topk(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "alpha alpha alpha beta rare"), (1, "alpha beta beta"),
         (2, "alpha beta gamma gamma")],
        "doc_id long, text string",
    )
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec), n_shards=2
    )
    n = 3
    df = {"alpha": 3, "beta": 3, "gamma": 1, "rare": 1}
    idf = {t: math.log(1 + (n - d + 0.5) / (d + 0.5)) for t, d in df.items()}
    tf = {0: {"alpha": 3, "beta": 1, "rare": 1},
          1: {"alpha": 1, "beta": 2},
          2: {"alpha": 1, "beta": 1, "gamma": 2}}
    want = {}
    for d, terms in tf.items():
        scored = sorted(((t, c, c * idf[t]) for t, c in terms.items()),
                        key=lambda x: (-x[2], x[0]))[:2]
        want[d] = scored
    got = {}
    for r in eng.keywords(k_per_doc=2).collect():
        got.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["score"]))
    for d in got:
        got[d].sort(key=lambda x: (-x[2], x[0]))
    assert set(got) == set(want)
    for d in want:
        assert [(t, c) for t, c, _ in got[d]] == [(t, c) for t, c, _ in want[d]]
        for (_, _, gs), (_, _, ws) in zip(got[d], want[d]):
            assert gs == pytest.approx(ws)
    with pytest.raises(ValueError, match="k_per_doc"):
        eng.keywords(k_per_doc=0)


def test_search_parents_folds_and_floor(spark):
    """has_child parent ranking: every score_mode folds the per-child
    BM25 scores exactly (verified against the engine's own per-doc
    scores), min_children floors parents, and bad inputs refuse loudly."""
    import pytest
    from pyspark.sql import functions as F

    from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline

    spec = FieldSpec(field="text", source="text")
    rows = [
        (0, "apple banana", "p1"),
        (1, "apple apple cherry", "p1"),
        (2, "apple date", "p2"),
        (3, "kiwi plum", "p2"),
        (4, "apple apple apple", "p3"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, site string")
    eng = PerlinEngine.build(
        spark, corpus, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=2,
    )
    per_doc = {r["doc_id"]: r["score"]
               for r in eng.search("apple", k=None).collect()}
    assert set(per_doc) == {0, 1, 2, 4}
    site_of = {0: "p1", 1: "p1", 2: "p2", 4: "p3"}
    kids: dict = {}
    for d, s in per_doc.items():
        kids.setdefault(site_of[d], []).append(s)

    def got(mode, min_children=1):
        return {
            r["site"]: (r["score"], r["n_children"])
            for r in eng.search_parents(
                "apple", child_key="site", score_mode=mode,
                min_children=min_children, k=None,
            ).collect()
        }

    for mode, fold in [("sum", sum), ("max", max), ("min", min),
                       ("avg", lambda v: sum(v) / len(v)),
                       ("count", lambda v: float(len(v)))]:
        g = got(mode)
        assert set(g) == {"p1", "p2", "p3"}, mode
        for site, scores in kids.items():
            assert abs(g[site][0] - fold(scores)) < 1e-9, (mode, site)
            assert g[site][1] == len(scores), (mode, site)

    # min_children floor: only p1 has 2 matching children
    assert set(got("sum", min_children=2)) == {"p1"}
    # ranking order: sum mode, score desc then site asc
    order = [r["site"] for r in
             eng.search_parents("apple", child_key="site", k=None).collect()]
    want = sorted(kids, key=lambda s: (-sum(kids[s]), s))
    assert order == want

    with pytest.raises(KeyError, match="nope"):
        eng.search_parents("apple", child_key="nope")
    with pytest.raises(ValueError, match="score_mode"):
        eng.search_parents("apple", child_key="site", score_mode="mean")
    with pytest.raises(ValueError, match="min_children"):
        eng.search_parents("apple", child_key="site", min_children=0)
    # no matches -> empty, never raises
    assert eng.search_parents("zzzqqq", child_key="site").count() == 0


def test_search_parents_plan_two_phase_agg(spark):
    """The parent fold is a map-side-combinable two-phase HashAggregate
    keyed by the parent value (partial_sum below the exchange), with no
    Window/global-sort — parent cardinality, not the match set, bounds
    the shuffle — and the top-k is TakeOrderedAndProject."""
    from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=4,
    )
    df = eng.search_parents("merge", child_key="source", k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_facet_cardinality_exact_and_approx(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", "py", "s1"), (1, "alpha", "py", "s2"),
         (2, "alpha beta", "rs", "s1"), (3, "alpha", "py", "s1"),
         (4, "gamma", "py", "s9")],
        "doc_id long, text string, lang string, source string",
    )
    spec = FieldSpec(field="text", source="text")
    pl = QueryPipeline(text_spec=spec, text_combinator="any")
    eng = PerlinEngine.build(spark, docs, [spec], pipeline=pl, n_shards=2)
    rows = {r["lang"]: r
            for r in eng.facet_cardinality("alpha", by="lang",
                                           value="source").collect()}
    # doc 4 (gamma) is outside the match set: py matches {s1,s2,s1}->2
    assert rows["py"]["n_docs"] == 3 and rows["py"]["n_distinct"] == 2
    assert rows["rs"]["n_docs"] == 1 and rows["rs"]["n_distinct"] == 1
    # HLL path: exact at this cardinality, and its plan is the sketch
    # aggregate (partial merge), not a distinct expansion
    adf = eng.facet_cardinality("alpha", by="lang", value="source",
                                approx=True)
    arows = {r["lang"]: r for r in adf.collect()}
    assert arows["py"]["n_distinct"] == 2 and arows["rs"]["n_distinct"] == 1
    plan = adf._jdf.queryExecution().executedPlan().toString()
    assert "approx_count_distinct" in plan and "distinct" in plan.lower()
    with pytest.raises(KeyError, match="no stored column"):
        eng.facet_cardinality("alpha", by="lang", value="nope")


def test_facet_composite_pages_cover_all_buckets(spark):
    docs = spark.createDataFrame(
        [(i, "alpha", f"l{i % 3}", f"s{i % 5}") for i in range(30)]
        + [(99, "gamma only", "zz", "zz")],
        "doc_id long, text string, lang string, source string",
    )
    spec = FieldSpec(field="text", source="text")
    pl = QueryPipeline(text_spec=spec, text_combinator="any")
    eng = PerlinEngine.build(spark, docs, [spec], pipeline=pl, n_shards=2)
    # full bucket set (15 (lang, source) combos) via keyset pages of 4
    pages, after = [], None
    while True:
        page = eng.facet_composite("alpha", by=["lang", "source"],
                                   size=4, after=after).collect()
        if not page:
            break
        pages.extend(page)
        after = (page[-1]["lang"], page[-1]["source"])
    got = [(r["lang"], r["source"], r["n_docs"]) for r in pages]
    one_shot = [(r["lang"], r["source"], r["n_docs"])
                for r in eng.facet_composite("alpha", by=["lang", "source"],
                                             size=1000).collect()]
    assert got == one_shot and len(got) == 15
    assert got == sorted(got)                      # key-ascending
    assert all(n == 2 for _, _, n in got)          # 30 docs / 15 buckets
    assert ("zz", "zz", 1) not in got              # non-matching doc excluded
    # single-key form + guards
    langs = [(r["lang"], r["n_docs"])
             for r in eng.facet_composite("alpha", by="lang",
                                          size=10).collect()]
    assert langs == [("l0", 10), ("l1", 10), ("l2", 10)]
    with pytest.raises(ValueError, match="after has"):
        eng.facet_composite("alpha", by="lang", after=("a", "b"))
    with pytest.raises(KeyError, match="no stored column"):
        eng.facet_composite("alpha", by="nope")
    with pytest.raises(ValueError, match="at least one key"):
        eng.facet_composite("alpha", by=[])


def test_facet_composite_after_key_reaches_scan(spark):
    """The after-key predicate references only grouping columns, so
    Catalyst pushes the whole OR-of-AND-prefixes clause below the
    aggregate into the docs parquet scan — deep pages prune input, not
    just output."""
    from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spec = FieldSpec(field="text", source="text")
    eng = PerlinEngine.build(
        spark, docs, [spec], pipeline=QueryPipeline(text_spec=spec),
        n_shards=2,
    )
    df = eng.facet_composite("merge", by=["lang", "source"], size=3,
                             after=("de", "src11"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines()
                if "FileScan" in l and "lang" in l and "DataFilters" in l)
    assert "src11" in scan          # the after tuple reached the scan
    assert "TakeOrderedAndProject" in plan
