"""Engine facade — the user-visible API of the rebuild.

Plays the role of the reference's derive-generated ``…Index`` struct +
``run_query`` entry point (``perlin-derive/src/index_struct.rs:12-68``):

    engine = PerlinEngine.build(spark, corpus, specs, ...)
    engine.search("2567 deimos", k=10)          # -> DataFrame(doc_id, score)
    engine.search("flew", filters=[Must("number", "2567")])
    engine.frequent_terms("number", 3)

Unlike the reference, unknown ids / unset pipelines return empty results
instead of panicking (SURVEY.md §4 "quirks to not replicate").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .analysis import FieldSpec, QueryPipeline, QuerySpec
from .build import IndexData, build_index
from .query import search as _search, search_many as _search_many


@dataclass(frozen=True)
class Must:
    """Must-filter: results restricted to docs containing (field, term) —
    ``ChainingOperator::Must`` + ``Query::filter_by``
    (``/root/reference/src/query/mod.rs:14-19,250-261``)."""

    field: str
    term: str
    op: str = "must"


@dataclass(frozen=True)
class MustNot:
    field: str
    term: str
    op: str = "must_not"


@dataclass(frozen=True)
class May:
    """Score-boost only; never restricts the result set."""

    field: str
    term: str
    op: str = "may"


@dataclass(frozen=True)
class Range:
    """Numeric range filter over a routed number field: results restricted
    to docs holding ANY integer term with value in ``[lo, hi]`` (both
    inclusive).  The reference's ``#[filter]`` u64 field
    (``/root/reference/src/document_index.rs:60-69``) matches exact values
    only; a range is its natural extension — expanded against the
    vocabulary into the set of in-range values actually present, then run
    as one zero-weight Any-group (restricts candidates, never perturbs
    BM25 scores)."""

    field: str
    lo: int
    hi: int
    op: str = "must_range"


class PerlinEngine:
    """A built index + its query pipeline."""

    def __init__(self, index: IndexData, pipeline: QueryPipeline):
        self.index = index
        self.pipeline = pipeline

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        specs: list[FieldSpec],
        pipeline: QueryPipeline | None = None,
        **kwargs,
    ) -> "PerlinEngine":
        index = build_index(spark, corpus, specs, **kwargs)
        if pipeline is None:
            text_specs = [s for s in specs if s.field not in ("title",)]
            pipeline = QueryPipeline(text_spec=text_specs[0])
        return cls(index, pipeline)

    def cache(self) -> "PerlinEngine":
        self.index.cache()
        return self

    #: range-expansion cap — a Range filter REFUSES (never silently
    #: truncates, which would widen the result set) past this many distinct
    #: in-range vocabulary values; remedy: split the range, or bucket the
    #: numeric field at index time so a range is few coarse terms
    RANGE_MAX_TERMS = 512

    def expand_range(
        self, field: str, lo: int, hi: int, max_terms: int = RANGE_MAX_TERMS
    ) -> list[str]:
        """Distinct vocabulary values of the routed number ``field`` inside
        ``[lo, hi]``, value-ascending.  Number terms are canonical decimal
        strings (analysis.py u64 router), so ``cast(term as decimal(20,0))``
        — wide enough for 2^64-1 — is exact; the cast+range predicate
        reaches the vocabulary scan and the driver receives <= max_terms+1
        rows (refusal past the cap, tombstone-cap discipline,
        build.py:249-283)."""
        u64_max = 18446744073709551615
        lo, hi = max(int(lo), 0), min(int(hi), u64_max)
        if lo > hi:
            return []
        val = F.col("term").cast("decimal(20,0)")
        # bounds ride as decimal literals (a plain int above 2^63-1 would
        # overflow the py4j long conversion)
        lo_l = F.lit(str(lo)).cast("decimal(20,0)")
        hi_l = F.lit(str(hi)).cast("decimal(20,0)")
        rows = (
            self.index.vocabulary.filter(
                (F.col("field") == field)
                & val.isNotNull()
                & (val >= lo_l)
                & (val <= hi_l)
            )
            .select("term")
            .orderBy(F.asc(val), F.asc("term"))
            .limit(max_terms + 1)
            .collect()
        )
        if len(rows) > max_terms:
            raise ValueError(
                f"Range({field}, {lo}, {hi}) expands to more than "
                f"{max_terms} distinct values; split the range or index "
                f"a bucketed companion field for coarse range filtering"
            )
        return [r["term"] for r in rows]

    def _filter_tuples(self, filters) -> tuple:
        """Filter objects -> QuerySpec filter tuples; Range filters expand
        against the vocabulary here (one tiny driver-side scan each)."""
        out = []
        for f in filters:
            if isinstance(f, Range):
                out.append(
                    ("must_any", f.field, tuple(self.expand_range(f.field, f.lo, f.hi)))
                )
            else:
                out.append((f.op, f.field, f.term))
        return tuple(out)

    def analyze_query(self, query: str, filters=()) -> QuerySpec:
        return self.pipeline.analyze(query, self._filter_tuples(filters))

    def search(
        self,
        query: str | QuerySpec,
        k: int | None = 10,
        filters=(),
        pipeline: QueryPipeline | None = None,
        prune: bool = True,
        after: tuple[float, int] | None = None,
        synonyms: "dict[str, tuple[str, ...]] | None" = None,
        min_match: int | None = None,
        boosts: "dict[str, float] | None" = None,
    ) -> DataFrame:
        """``after=(score, doc_id)`` (the previous page's last served row)
        requests the NEXT page — constant per-page cost at any depth; see
        :func:`perlin_spark.query.search`.  ``synonyms`` overlays a
        query-time synonym map on the pipeline for this call (see
        :class:`perlin_spark.analysis.QueryPipeline.synonyms`).
        ``min_match=m`` (the ES minimum_should_match dial) tightens every
        'any' text group of the analyzed query to require >= m DISTINCT
        matching terms — between pure OR (m=1) and pure AND (m=#terms).
        ``boosts={term: w}`` (Lucene's ``term^w``) multiplies a term's
        score contribution; candidacy is untouched.  Boost keys are
        ANALYZED terms (post lowercase/stem)."""
        if isinstance(query, str):
            pl = pipeline or self.pipeline
            if synonyms is not None:
                import dataclasses

                pl = dataclasses.replace(pl, synonyms=synonyms)
            spec = pl.analyze(query, self._filter_tuples(filters))
            if min_match is not None:
                if synonyms is not None:
                    raise ValueError(
                        "min_match cannot combine with synonyms: synonym "
                        "expansion builds one Any-group PER QUERY SLOT, so "
                        "a group-level floor would mean 'm alternates of "
                        "each slot', not 'm of the query terms'"
                    )
                groups = tuple(
                    (g[0], g[1], g[2], min_match)
                    if g[1] == "any" and g[0] == pl.text_spec.field
                    else g
                    for g in spec.groups
                )
                if groups == spec.groups:
                    raise ValueError(
                        "min_match needs a disjunctive text group — use a "
                        "pipeline with text_combinator='any' ('all' already "
                        "requires every term)"
                    )
                spec = QuerySpec(groups=groups, filters=spec.filters)
        else:
            spec = query
        return _search(self.index, spec, k=k, prune=prune, after=after,
                       boosts=boosts)

    def explain_query(
        self,
        query: str | QuerySpec,
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> dict:
        """Driver-side query diagnostics (the Lucene ``explain`` shape):
        exactly the metadata the scorer closure will ship — one row per
        analyzed op with df / idf / weight / role / combinator and its
        MaxScore impact bound — plus the physical-plan facts (buckets the
        scan prunes to, doc-length path, similarity, live-docs state).
        Costs no Spark job beyond the driver-cached vocab/stats lookups."""
        from .query import _impact_bound, _query_ops
        from .spark_hash import bucket_of

        if isinstance(query, str):
            pl = pipeline or self.pipeline
            spec = pl.analyze(query, self._filter_tuples(filters))
        else:
            spec = query
        idx = self.index
        ratios = {s.field: s.term_doc_ratio for s in idx.specs}
        for s in idx.specs:
            if s.number_field:
                ratios.setdefault(s.number_field, 1.0)
        ops, n_groups, n_must = _query_ops(spec, ratios)
        stats = idx.stats_map()
        pairs = sorted({(op["field"], op["term"]) for op in ops})
        vocab = idx.vocab_lookup(pairs)
        sim = getattr(idx, "similarity", "bm25")
        cttf = idx.cttf_lookup(pairs) if sim == "lmdir" else {}
        terms = []
        for op in ops:
            df_g, idf = vocab[(op["field"], op["term"])]
            st = stats.get(op["field"], {"avgdl": 1.0, "mindl": 0})
            avgdl = max(float(st["avgdl"]), 1e-9)
            mindl = max(float(st["mindl"]), 0.0)
            terms.append({
                "field": op["field"], "term": op["term"], "role": op["role"],
                "group": op["group"], "combinator": op["comb"],
                "df": int(df_g), "idf": float(idf),
                "weight": float(op["weight"]),
                # the impact bound evaluated at tf=1 (block max_tf values
                # live shard-side; tf=1 is the floor every match pays)
                "impact_bound_tf1": float(_impact_bound(
                    1.0, idf, op["weight"], mindl, avgdl, idx.k1, idx.b, sim,
                    pc=(
                        cttf[(op["field"], op["term"])]
                        / max(float(st.get("total_terms", 0)), 1.0)
                        if sim == "lmdir" else 0.0
                    ),
                )),
            })
        deleted = idx.deleted_array()
        return {
            "similarity": sim,
            "k1": idx.k1,
            "b": idx.b,
            "n_groups": n_groups,
            "n_must": n_must,
            "n_shards": idx.n_shards,
            "buckets_pruned_to": (
                sorted({bucket_of(f, t, idx.buckets) for f, t in pairs})
                if idx.buckets else None
            ),
            "dl_path": "broadcast" if idx.dl_broadcast() is not None else "join",
            "n_deleted": int(deleted.size) if deleted is not None else 0,
            "positions_sidecar": idx.positions is not None,
            "terms": terms,
        }

    def search_many(
        self,
        queries,
        k: int | None = 10,
        filters=(),
        pipeline: QueryPipeline | None = None,
        prune: bool = True,
    ) -> DataFrame:
        """Batch retrieval — MANY queries in ONE Spark job ->
        (query_id, doc_id, score), per-query top-k.  ``queries`` is a
        dict ``{query_id: query-string-or-QuerySpec}`` or a list (auto
        ids ``q0, q1, ...``); shared ``filters`` apply to every string
        query.  The offline shape for hard-negative mining / retrieval
        decontamination / eval sweeps: one postings scan over the union
        of all query terms instead of a job per query."""
        pl = pipeline or self.pipeline
        if not isinstance(queries, dict):
            queries = {f"q{i}": q for i, q in enumerate(queries)}
        filt = self._filter_tuples(filters)
        specs = {
            qid: (q if isinstance(q, QuerySpec) else pl.analyze(q, filt))
            for qid, q in queries.items()
        }
        return _search_many(self.index, specs, k=k, prune=prune)

    def search_docs(self, query, k: int = 10, filters=(), pipeline=None) -> DataFrame:
        """Search + join back the docs table (the ``ExternalId`` lookup,
        ``/root/reference/src/document_index.rs:26-35`` as a plain join)."""
        hits = self.search(query, k=k, filters=filters, pipeline=pipeline)
        return hits.join(self.index.docs, "doc_id", "left").orderBy(
            F.desc("score"), F.asc("doc_id")
        )

    def search_fields(
        self,
        query: str,
        boosts: dict[str, float],
        k: int | None = 10,
        prune: bool = True,
    ) -> DataFrame:
        """Field-weighted multi-field search (the Lucene multi-field /
        BM25F-lite shape): the query is analyzed through EACH boosted
        field's own pipeline (a stemmed body and an unstemmed title each
        see their own normal form), a doc matches if ANY field matches,
        and each matching (field, term) contributes
        ``boost * idf * sim(tf, dl_field)`` — per-field length
        normalization.  Number-routed query tokens are ignored here (use
        :class:`Must`/:class:`Range` filters for the number field).  Same
        single-stage plan as :meth:`search`."""
        from .query import search_fielded as _search_fielded

        specs_by_field = {s.field: s for s in self.index.specs}
        triples: list[tuple[str, str, float]] = []
        for field, boost in boosts.items():
            spec = specs_by_field.get(field)
            if spec is None:
                raise KeyError(
                    f"no indexed field {field!r}; have {sorted(specs_by_field)}"
                )
            for t in self._analyze_ordered(query, spec):
                triples.append((field, t, float(boost)))
        return _search_fielded(self.index, triples, k=k, prune=prune)

    def frequent_terms(self, field: str, k: int | None = None) -> DataFrame:
        return self.index.frequent_terms(field, k)

    # --- term-expansion search (prefix / fuzzy) --------------------------
    #
    # Beyond the reference surface: classic fulltext-index features built
    # on the vocabulary table the index already maintains.  Expansion is a
    # predicate scan of the (small, per-field-distinct-terms) vocabulary,
    # capped at `max_terms` highest-df terms — so the collect is k rows by
    # construction — and the expanded set runs as ONE Any-combinator BM25
    # query (same single-stage job as every other search).

    #: expansion cap — part of the operator contract, replicated in oracles
    EXPAND_MAX_TERMS = 32

    def expand_prefix(
        self, field: str, prefix: str, max_terms: int = EXPAND_MAX_TERMS
    ) -> list[str]:
        """Highest-df vocabulary terms starting with ``prefix`` (df desc,
        term asc — the repo-wide deterministic tie-break).  `startswith`
        compiles to a `StartsWith` predicate that reaches the vocabulary
        scan; no shuffle, driver receives <= max_terms rows."""
        rows = (
            self.index.vocabulary.filter(
                (F.col("field") == field) & F.col("term").startswith(prefix)
            )
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        return [r["term"] for r in rows]

    @staticmethod
    def _glob_to_like(pattern: str) -> str:
        """``*``/``?`` glob -> SQL LIKE pattern (literal ``%``/``_``/``\\``
        escaped with ``\\``) — LIKE semantics are identical in Spark and
        ANSI SQL, so the oracle needs no regex-dialect translation."""
        out = []
        for ch in pattern:
            if ch == "*":
                out.append("%")
            elif ch == "?":
                out.append("_")
            elif ch in ("%", "_", "\\"):
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)

    def expand_wildcard(
        self, field: str, pattern: str, max_terms: int = EXPAND_MAX_TERMS
    ) -> list[str]:
        """Highest-df vocabulary terms matching the ``*``/``?`` glob
        (df desc, term asc — the repo-wide tie-break).  Compiles to a
        LIKE predicate on the vocabulary scan; a prefix-shaped glob
        (``pre*``) additionally gets the `startswith` pushdown so the
        planner can range-prune like :meth:`expand_prefix`."""
        cond = F.col("term").like(self._glob_to_like(pattern))
        head = pattern.split("*")[0].split("?")[0]
        if head:  # leading literal: add the sargable prefix predicate
            cond = cond & F.col("term").startswith(head)
        rows = (
            self.index.vocabulary.filter((F.col("field") == field) & cond)
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        return [r["term"] for r in rows]

    @staticmethod
    def _deletion_keys(term: str, max_edits: int) -> list[str]:
        """All strings reachable from ``term`` with <= max_edits deletions
        (including itself) — the query-side half of SymSpell.  Driver-side
        and tiny: O(len^max_edits) short strings."""
        keys = {term}
        frontier = {term}
        for _ in range(max_edits):
            nxt = {t[:i] + t[i + 1:] for t in frontier for i in range(len(t))}
            frontier = nxt - keys
            keys |= nxt
        return sorted(keys)

    def _fuzzy_candidates(self, field: str, term: str, max_edits: int) -> DataFrame:
        """(term, df, dist) candidates via the SymSpell table: the query's
        deletion keys probe ``delkey`` (an IN predicate that reaches the
        scan — never a vocabulary-wide levenshtein), and edit distance is
        verified on the probed candidates only.  Falls back to the
        length-banded vocabulary scan when ``max_edits`` exceeds the
        table's depth."""
        dist = F.levenshtein(F.col("term"), F.lit(term))
        if max_edits > self.index.SYMSPELL_MAX_EDITS:
            tl = len(term)
            base = self.index.vocabulary.filter(
                (F.col("field") == field)
                & (F.length("term") >= tl - max_edits)
                & (F.length("term") <= tl + max_edits)
            ).select("term", "df")
        else:
            keys = self._deletion_keys(term, max_edits)
            base = (
                self.index.symspell()
                .filter((F.col("field") == field) & F.col("delkey").isin(keys))
                .select("term")
                .dropDuplicates(["term"])
                .join(
                    self.index.vocabulary.filter(F.col("field") == field).select(
                        "term", "df"
                    ),
                    "term",
                )
            )
        return base.select("term", "df", dist.alias("dist")).filter(
            F.col("dist") <= max_edits
        )

    def expand_fuzzy(
        self,
        field: str,
        term: str,
        max_edits: int = 1,
        max_terms: int = EXPAND_MAX_TERMS,
    ) -> list[str]:
        """Vocabulary terms within ``max_edits`` Levenshtein edits of
        ``term`` (distance asc, df desc, term asc), found by probing the
        SymSpell deletion-neighborhood table (``IndexData.symspell``):
        symmetric deletes guarantee full recall, verification runs only
        over the probed candidates, and the vocabulary is never scanned
        whole (r4 verdict item 5)."""
        rows = (
            self._fuzzy_candidates(field, term, max_edits)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        return [r["term"] for r in rows]

    def suggest(
        self,
        query: str,
        k: int = 3,
        field: str | None = None,
        max_edits: int = 2,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """Did-you-mean: for EVERY analyzed token of ``query``, the top-k
        correction candidates from the vocabulary, ranked ``(dist asc,
        df desc, term asc)`` — a token that exists in the vocabulary
        appears as its own dist-0 row (callers decide whether its df
        justifies keeping it).  Returns ``(token_pos, token, term, df,
        dist)``, ``token_pos`` = first position of the token in the
        analyzed stream.

        ONE Spark job for the whole query: all tokens' deletion keys ride
        a single broadcast probe into the SymSpell table (``(token,
        delkey)`` pairs — the same full-recall symmetric-delete scheme as
        :meth:`search_fuzzy`, never a vocabulary-wide levenshtein), edit
        distance verifies on probed candidates only, and the per-token
        top-k is a window head over ``token_pos`` partitions (the
        ``search_many`` shape).  Beyond the table's depth
        (``max_edits > SYMSPELL_MAX_EDITS``) it falls back to per-token
        length-banded vocabulary scans."""
        from pyspark.sql import Window

        spec = (pipeline or self.pipeline).text_spec
        field = field or spec.field
        first_pos: dict[str, int] = {}
        for i, t in enumerate(self._analyze_ordered(query, spec)):
            first_pos.setdefault(t, i)
        toks = [(pos, tok) for tok, pos in first_pos.items()]
        spark = self.index.spark
        out_schema = "token_pos int, token string, term string, df long, dist int"
        if not toks:
            return spark.createDataFrame([], out_schema)
        vocab = self.index.vocabulary.filter(F.col("field") == field).select(
            "term", "df"
        )
        if max_edits > self.index.SYMSPELL_MAX_EDITS:
            probe = spark.createDataFrame(toks, "token_pos int, token string")
            cand = vocab.join(
                F.broadcast(probe),
                (F.length("term") >= F.length("token") - max_edits)
                & (F.length("term") <= F.length("token") + max_edits),
            )
        else:
            rows = [
                (pos, tok, dk)
                for pos, tok in toks
                for dk in self._deletion_keys(tok, max_edits)
            ]
            probe = spark.createDataFrame(
                rows, "token_pos int, token string, delkey string"
            )
            cand = (
                self.index.symspell()
                .filter(F.col("field") == field)
                .join(F.broadcast(probe), "delkey")
                .select("token_pos", "token", "term")
                .dropDuplicates(["token_pos", "term"])
                .join(vocab, "term")
            )
        dist = F.levenshtein(F.col("term"), F.col("token"))
        cand = cand.withColumn("dist", dist).filter(F.col("dist") <= max_edits)
        w = Window.partitionBy("token_pos").orderBy(
            F.asc("dist"), F.desc("df"), F.asc("term")
        )
        return (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("token_pos", "token", "term", "df", "dist")
            .orderBy("token_pos", F.asc("dist"), F.desc("df"), F.asc("term"))
        )

    def _search_expanded(self, field: str, terms: list[str], k: int | None):
        """One Any-combinator BM25 query over literal index terms — the
        QuerySpec is built directly (the terms are already normalized
        vocabulary entries; re-analyzing could re-stem a stem)."""
        groups = ((field, "any", tuple(terms)),) if terms else ()
        return self.search(QuerySpec(groups=groups, filters=()), k=k)

    def search_prefix(
        self,
        prefix: str,
        k: int | None = 10,
        field: str | None = None,
        max_terms: int = EXPAND_MAX_TERMS,
    ) -> DataFrame:
        """Prefix search: ``pre*`` -> expand against the vocabulary ->
        one disjunctive BM25 query.  Empty expansion returns an empty
        (doc_id, score) frame, never raises."""
        field = field or self.pipeline.text_spec.field
        return self._search_expanded(
            field, self.expand_prefix(field, prefix, max_terms), k
        )

    def search_fuzzy(
        self,
        term: str,
        k: int | None = 10,
        field: str | None = None,
        max_edits: int = 1,
        max_terms: int = EXPAND_MAX_TERMS,
    ) -> DataFrame:
        """Fuzzy search: all vocabulary terms within ``max_edits`` of the
        query term, scored as one disjunctive BM25 query."""
        field = field or self.pipeline.text_spec.field
        return self._search_expanded(
            field, self.expand_fuzzy(field, term, max_edits, max_terms), k
        )

    def search_wildcard(
        self,
        pattern: str,
        k: int | None = 10,
        field: str | None = None,
        max_terms: int = EXPAND_MAX_TERMS,
    ) -> DataFrame:
        """Wildcard search: ``*`` (any run) / ``?`` (one char) glob over
        the vocabulary, scored as one disjunctive BM25 query.  Prefix
        search is the ``pre*`` special case."""
        field = field or self.pipeline.text_spec.field
        return self._search_expanded(
            field, self.expand_wildcard(field, pattern, max_terms), k
        )

    def query(
        self,
        q: str,
        k: int | None = 10,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """Run a query-string in the mini-language
        (:mod:`perlin_spark.qparser` — the Lucene classic QueryParser
        shape: ``+must -not field:term term^2 "a phrase" wild* fuzzy~``).
        Pure assembly over existing operators:

        * plain terms analyze through the pipeline into the default
          combinator group, with ``^boosts`` mapped to their analyzed
          forms;
        * each wildcard / fuzzy token expands against the vocabulary into
          its own Any-subgroup (groups intersect);
        * each phrase's terms join the spec as a conjunctive group, then
          its adjacency-verified match set filters the hits (rank-then-
          verify, the ``search_phrase`` semantics); ``-"phrase"`` anti-
          joins instead;
        * ``+term`` / ``-term`` / ``field:term`` become Must / MustNot
          filters (explicit-field terms are INDEX terms, not re-analyzed).
        """
        from .qparser import parse_query

        pl = pipeline or self.pipeline
        spec_field = pl.text_spec.field
        p = parse_query(q)

        def analyzed(tok: str) -> list[str]:
            return self._analyze_ordered(tok, pl.text_spec)

        base = pl.analyze(" ".join(p.terms)) if p.terms else QuerySpec()
        groups = list(base.groups)
        boosts: dict[str, float] = {}
        for tok, w in p.boosts.items():
            for t in analyzed(tok):
                boosts[t] = w
        for pat in p.wildcards:
            exp = self.expand_wildcard(spec_field, pat)
            groups.append((spec_field, "any", tuple(exp)))
        for tok, edits in p.fuzzy:
            exp = self.expand_fuzzy(spec_field, tok, max_edits=edits)
            groups.append((spec_field, "any", tuple(exp)))
        phrase_terms: list[list[str]] = []
        for ph in p.phrases:
            terms = analyzed(ph)
            phrase_terms.append(terms)
            uniq = tuple(dict.fromkeys(terms))
            if uniq:
                groups.append((spec_field, "all", uniq))
        filters: list[tuple] = list(base.filters)
        for fname, tok in p.musts:
            if fname is not None:
                filters.append(("must", fname, tok))
            else:
                for t in analyzed(tok):
                    filters.append(("must", spec_field, t))
        for fname, tok in p.must_nots:
            if fname is not None:
                filters.append(("must_not", fname, tok))
            else:
                for t in analyzed(tok):
                    filters.append(("must_not", spec_field, t))
        spec = QuerySpec(groups=tuple(groups), filters=tuple(filters))
        hits = _search(self.index, spec, k=None, boosts=boosts or None)
        for ph, terms in zip(p.phrases, phrase_terms):
            if len(terms) > 1:
                hits = hits.join(self._phrase_match_set(ph, pl), "doc_id")
        for ph in p.not_phrases:
            terms = analyzed(ph)
            if len(terms) > 1:
                hits = hits.join(
                    self._phrase_match_set(ph, pl), "doc_id", "left_anti"
                )
            elif terms:
                # single-token "phrase" exclusion == MustNot on the term
                hits = hits.join(
                    self.search(
                        QuerySpec(groups=((pl.text_spec.field, "all",
                                           tuple(terms)),)), k=None
                    ).select("doc_id"),
                    "doc_id", "left_anti",
                )
        hits = hits.orderBy(F.desc("score"), F.asc("doc_id"))
        return hits.limit(k) if k is not None else hits

    def _phrase_match_set(self, phrase: str, pl: QueryPipeline) -> DataFrame:
        """doc_ids where the phrase's analyzed terms occur adjacent in
        order — the verify half of :meth:`search_phrase` (positional
        sidecar when present, candidates-only re-analysis otherwise)."""
        return self.search_phrase(
            phrase, k=None,
            pipeline=QueryPipeline(text_spec=pl.text_spec, text_combinator="all"),
        ).select("doc_id")

    def describe(self) -> dict:
        """Driver-side index summary (Lucene's IndexReader stats /
        _cat/indices analog): corpus size, per-field vocabulary sizes,
        postings row count, scoring params, sidecar presence, tombstone
        count.  Two tiny aggregate jobs (vocabulary groupBy + postings
        count) — blob columns are never touched."""
        idx = self.index
        terms_per_field = {
            r["field"]: int(r["n"])
            for r in (
                (idx.vocab_source if idx.vocab_source is not None else idx.vocabulary)
                .groupBy("field").agg(F.count("*").alias("n")).collect()
            )
        }
        deleted = idx.deleted_array() if hasattr(idx, "deleted_array") else None
        return {
            "n_docs": int(idx.n_docs),
            "fields": [s.field for s in idx.specs],
            "terms_per_field": terms_per_field,
            "postings_rows": int(idx.postings.count()),
            "n_shards": int(idx.n_shards),
            "buckets": idx.buckets,
            "block_size": int(idx.block_size),
            "similarity": getattr(idx, "similarity", "bm25"),
            "k1": float(idx.k1),
            "b": float(idx.b),
            "positions_sidecar": idx.positions is not None,
            "deleted_docs": 0 if deleted is None else int(len(deleted)),
        }

    def search_sorted(
        self,
        query: "str | QuerySpec",
        by: str,
        k: int | None = 10,
        ascending: bool = False,
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """Results ordered by a STORED document column instead of
        relevance (recency / length / popularity sorting — Lucene's
        sort-by-field): the same single-stage candidacy job produces the
        full match set (scoring skipped from the contract; matching
        semantics identical to :meth:`search`), which joins a two-column
        projection of the docs table and takes the global top-k on
        ``(by asc|desc, doc_id asc)`` — a TakeOrdered, never a full sort.
        Returns ``(doc_id, <by>)``."""
        cand = self.search(query, k=None, filters=filters, pipeline=pipeline)
        if by not in self.index.docs.columns:
            raise KeyError(
                f"no stored column {by!r} in the docs table "
                f"({self.index.docs.columns})"
            )
        order = [F.asc(by) if ascending else F.desc(by), F.asc("doc_id")]
        out = (
            self.index.docs.select("doc_id", by)
            .join(cand.select("doc_id"), "doc_id")
            .orderBy(*order)
        )
        return out.limit(k) if k is not None else out

    def search_function_score(
        self,
        query: "str | QuerySpec",
        field: str,
        k: int | None = 10,
        factor: float = 1.0,
        modifier: str = "log1p",
        boost_mode: str = "multiply",
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(doc_id, score) — ES ``function_score`` with a
        ``field_value_factor`` function: the BM25 score of every matching
        doc is combined with ``f(factor * field)`` where ``f`` is the
        ``modifier`` (``log1p`` -> ln(1+x), ``sqrt``, ``none``) and
        ``boost_mode`` is ``multiply`` or ``sum`` — relevance blended
        with a stored popularity/recency/length signal.

        Plan shape: the :meth:`search_sorted` shape — one single-stage
        search job for the full scored match set, a two-column docs-table
        equi-join on doc_id, the arithmetic inline (whole-stage codegen),
        then TakeOrdered on (score desc, doc_id asc) — never a full sort,
        and nothing driver-side.  At 100 TB the join shuffles only the
        match set against a pruned two-column projection of docs."""
        if field not in self.index.docs.columns:
            raise KeyError(
                f"no stored column {field!r} in the docs table "
                f"({self.index.docs.columns})"
            )
        mods = {
            "log1p": lambda c: F.log1p(c),
            "sqrt": lambda c: F.sqrt(c),
            "none": lambda c: c,
        }
        if modifier not in mods:
            raise ValueError(f"unknown modifier {modifier!r} ({sorted(mods)})")
        if boost_mode not in ("multiply", "sum"):
            raise ValueError(f"unknown boost_mode {boost_mode!r} (multiply | sum)")
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        fv = mods[modifier](F.lit(float(factor)) * F.col(field).cast("double"))
        combined = (
            (F.col("score") * fv) if boost_mode == "multiply" else (F.col("score") + fv)
        )
        out = (
            hits.join(self.index.docs.select("doc_id", field), "doc_id")
            .select("doc_id", combined.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        return out.limit(k) if k is not None else out

    def search_rescore(
        self,
        query: "str | QuerySpec",
        rescore_query: "str | QuerySpec",
        k: int | None = 10,
        window: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(doc_id, score) — the ES ``rescore`` window: the top ``window``
        docs of the primary query (BM25, (score desc, doc_id asc) order)
        are re-scored by a second query, and the page is the top-k of
        ``query_weight * primary + rescore_weight * secondary`` (secondary
        = 0 where the rescore query does not match).  Two-phase ranking:
        a cheap broad query recalls, an expensive precise one reorders —
        without ever scoring the expensive query outside the window.

        Plan shape: one primary search job (its k-row window is collected
        — ``window`` ids, driver-tiny by construction); the secondary
        query then runs as the SAME single-stage scorer job with the
        window ids riding the closure as an inclusion filter (the
        tombstone machinery's twin — out-of-window docs never generate
        candidates, so a high-df rescore query costs window-bounded work
        per shard); the combine is arithmetic over <= window rows."""
        if window < 1:
            raise ValueError("window must be >= 1")
        primary = self.search(
            query, k=window, filters=filters, pipeline=pipeline
        ).collect()  # <= window rows by construction
        if not primary:
            return self._empty_scores()
        ids = [int(r["doc_id"]) for r in primary]
        pl = pipeline or self.pipeline
        spec2 = (
            rescore_query
            if isinstance(rescore_query, QuerySpec)
            else pl.analyze(rescore_query, ())
        )
        secondary = _search(
            self.index, spec2, k=None, prune=False, restrict_ids=ids
        ).withColumnRenamed("score", "score2")
        prim_df = self.index.spark.createDataFrame(
            [(int(r["doc_id"]), float(r["score"])) for r in primary],
            "doc_id long, score1 double",
        )
        out = (
            prim_df.join(F.broadcast(secondary), "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit(float(query_weight)) * F.col("score1")
                    + F.lit(float(rescore_weight)) * F.coalesce(F.col("score2"), F.lit(0.0))
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        return out.limit(k) if k is not None else out

    def _empty_scores(self) -> DataFrame:
        from .query import RESULT_SCHEMA

        return self.index.spark.createDataFrame([], RESULT_SCHEMA)

    #: substring/regex candidacy intersects at most this many trigrams —
    #: the RAREST by df.  Exactness is unaffected (verification is the
    #: contains/rlike filter; dropping trigrams only widens candidates),
    #: so high-df grams like ' th' never gate the intersection cost.
    TRIGRAM_MAX = 8

    def _tri_spec(self) -> FieldSpec:
        for s in self.index.specs:
            if s.tokenizer == "trigram":
                return s
        raise KeyError(
            "no trigram field indexed; add "
            "FieldSpec(field='tri3', source=<content>, tokenizer='trigram', "
            "lowercase=False) to the build specs to enable substring/regex "
            "search (perlin_spark.trigram)"
        )

    def _tri_candidates(self, spec: FieldSpec, tris: list[str]) -> DataFrame | None:
        """Conjunctive match set over the rarest ``TRIGRAM_MAX`` of
        ``tris`` — the stock AND machinery on the trigram field.  ``None``
        = some required trigram is absent from the vocabulary, so no
        document can match (proof, not heuristic: every tri is mandatory)."""
        dfs = self.index.vocab_lookup([(spec.field, t) for t in tris])
        if any(dfs[(spec.field, t)][0] == 0 for t in tris):
            return None
        sel = sorted(tris, key=lambda t: dfs[(spec.field, t)][0])[: self.TRIGRAM_MAX]
        q = QuerySpec(groups=((spec.field, "all", tuple(sel)),), filters=())
        return self.search(q, k=None).select("doc_id")

    def _empty_ids(self) -> DataFrame:
        return self.index.spark.createDataFrame([], "doc_id long")

    #: substring/regex verify: candidate doc_ids at or under this count
    #: are collected (<=32 KB of int64) and pushed into the docs scan as
    #: an IN predicate — with a doc_id-clustered layout that is row-group
    #: min/max pruning, so verify IO is candidates-only.  Catalyst would
    #: otherwise push the contains()/rlike() below the candidate join and
    #: the docs side becomes a FULL corpus scan (found by plan_audit).
    #: Above the cap the join plan runs instead: a needle common enough
    #: to produce thousands of candidates amortizes a scan, and a
    #: many-thousand-literal InSet costs real plan-compile time
    VERIFY_IDS_MAX = 4096

    def _verify_base(self, cand: DataFrame, src: str) -> DataFrame:
        """Docs-side verify input: the two-column projection restricted
        to candidates — id-pushdown plan under the cap, join plan above."""
        ids = [r["doc_id"] for r in cand.limit(self.VERIFY_IDS_MAX + 1).collect()]
        base = self.index.docs.select("doc_id", src)
        if len(ids) <= self.VERIFY_IDS_MAX:
            # the limit did not truncate, so `ids` IS the complete set
            return base.filter(F.col("doc_id").isin(ids))
        return base.join(cand, "doc_id")

    def search_substring(self, needle: str, k: int | None = None) -> DataFrame:
        """Exact substring search over the raw content — the code-search
        primitive (grep for a fixed string), served by the trigram field
        (``perlin_spark.trigram``; Cox's trigram index): candidacy = AND
        over the needle's rarest trigrams (one bucket-pruned single-stage
        job, same plan as BM25), then ``contains(content, needle)`` runs
        on CANDIDATE rows only of a two-column corpus projection — the
        candidate ids ride into the docs scan as an IN predicate
        (:meth:`_verify_base`, row-group pruning under a doc_id-clustered
        layout; join-plan fallback past ``VERIFY_IDS_MAX``).  Returns
        ``(doc_id)`` ascending; ``k=None`` = the full match set.  Needles
        shorter than 3 chars are below the trigram floor and refuse
        loudly (filter the corpus scan directly for those)."""
        spec = self._tri_spec()
        if len(needle) < 3:
            raise ValueError(
                f"substring search needs len(needle) >= 3, got {needle!r}; "
                "below the trigram floor — filter the corpus directly"
            )
        from .trigram import trigrams

        # a lowercase=True trigram field serves CASE-INSENSITIVE grep:
        # per-gram lowering == grams of lowered text (1:1 case mapping —
        # exact for ASCII/code; locale one-to-many foldings excepted), so
        # fold the needle for candidacy and the scan column for verify
        fold = spec.lowercase
        probe = needle.lower() if fold else needle
        cand = self._tri_candidates(spec, trigrams(probe))
        if cand is None:
            return self._empty_ids()
        src = spec.source
        scan_col = F.lower(F.col(src)) if fold else F.col(src)
        out = (
            self._verify_base(cand, src)
            .filter(scan_col.contains(probe))
            .select("doc_id")
            .orderBy("doc_id")
        )
        return out.limit(k) if k is not None else out

    def search_regex(
        self, pattern: str, k: int | None = None, allow_scan: bool = False
    ) -> DataFrame:
        """Regex search over the raw content, trigram-pruned: the
        pattern's MANDATORY literal runs (``perlin_spark.trigram.
        regex_literals``, conservative Cox analysis) supply the trigrams;
        candidacy and verification as in :meth:`search_substring`, with
        ``rlike(pattern)`` (java.util.regex) as the exact test.  A pattern
        with no mandatory run >= 3 chars cannot be pruned: it REFUSES
        unless ``allow_scan=True`` explicitly opts into the full-corpus
        verify scan (still a two-column projection)."""
        spec = self._tri_spec()
        from .trigram import regex_literals, trigrams

        # lowercase=True trigram field: fold extracted literals for
        # candidacy and match case-insensitively ((?i) is java.util.regex
        # syntax accepted by rlike) — mirrors search_substring's folding
        fold = spec.lowercase
        lits = regex_literals(pattern)
        if fold:
            lits = [lit.lower() for lit in lits]
            pattern = "(?i)" + pattern
        tris = sorted({t for lit in lits for t in trigrams(lit)})
        src = spec.source
        base = self.index.docs.select("doc_id", src)
        if tris:
            cand = self._tri_candidates(spec, tris)
            if cand is None:
                return self._empty_ids()
            base = self._verify_base(cand, src)
        elif not allow_scan:
            raise ValueError(
                f"regex {pattern!r} has no mandatory literal run of >= 3 "
                "chars — trigram pruning is impossible; pass "
                "allow_scan=True to run the full-corpus verify scan"
            )
        out = (
            base.filter(F.col(src).rlike(pattern))
            .select("doc_id")
            .orderBy("doc_id")
        )
        return out.limit(k) if k is not None else out

    def _analyze_ordered(self, text: str, spec) -> list[str]:
        """The field's analyzed token stream for one string, order and
        duplicates preserved (what positional matching operates on)."""
        import pandas as pd

        from .analysis import apply_field_pipeline, tokenize

        toks = tokenize(pd.Series([text]), spec.tokenizer)
        for fname, terms in apply_field_pipeline(toks, spec):
            if fname == spec.field:
                return terms.tolist()
        return []

    def search_phrase(
        self,
        phrase: str,
        k: int | None = 10,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """Phrase search, rank-then-verify: candidacy = conjunctive match
        of the phrase's distinct terms (index-pruned, the cheap set), then
        adjacency is verified ONLY on candidates by re-analyzing their
        source text with the SAME Arrow analyzer the index was built with
        (exact parity by construction — positions are post-analysis, the
        standard semantics).  Score = conjunctive BM25 over the distinct
        terms; ordering ``(score desc, doc_id asc)``.

        INDEX-ONLY PATH (preferred, used whenever the index carries the
        positional sidecar — ``build_index(positions=True)`` /
        ``build_epoch(positions=True)`` / ``add_positions``): adjacency is
        verified by position-set intersection over the phrase terms'
        sidecar rows (``positions.phrase_match_docs``) — bucket-pruned,
        shard-local, and the corpus text is NEVER read, so per-query cost
        is O(phrase terms' postings), not O(candidates' text).  This is
        the 100-TB shape (r4 verdict item 3).

        FALLBACK (no sidecar): re-analysis cost is |candidates| — the
        verify UDF only ever receives candidate rows (Catalyst eliminates
        the k=None sort and broadcasts the candidate set into the docs
        join; executed plan pinned by test).  The docs PROBE side is a
        two-column projected scan whose IO shrinks further under a
        doc_id-clustered layout (row-group min/max pruning) or Spark's
        runtime bloom-filter join."""
        spec = (pipeline or self.pipeline).text_spec
        terms = self._analyze_ordered(phrase, spec)
        if not terms:
            return self.search(QuerySpec(groups=(), filters=()), k=k)
        uniq = tuple(dict.fromkeys(terms))
        cand = self.search(
            QuerySpec(groups=((spec.field, "all", uniq),), filters=()), k=None
        )
        if len(terms) == 1:
            if k is not None:
                return cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            return cand
        if self.index.positions is not None:
            from .positions import phrase_match_docs

            matched = phrase_match_docs(
                self.index.positions, spec.field, terms, buckets=self.index.buckets
            )
            out = cand.join(matched, "doc_id")
            out = out.orderBy(F.desc("score"), F.asc("doc_id"))
            return out.limit(k) if k is not None else out
        src = spec.source
        joined = cand.join(self.index.docs.select("doc_id", src), "doc_id")
        needle = " " + " ".join(terms) + " "
        tokenizer, field = spec.tokenizer, spec.field

        def verify(batches):
            import pandas as pd

            from .analysis import apply_field_pipeline, tokenize

            for pdf in batches:
                if pdf.empty:
                    yield pdf[["doc_id", "score"]]
                    continue
                pdf = pdf.reset_index(drop=True)
                toks = tokenize(pdf[src], tokenizer)
                streams = pd.Series([""] * len(pdf))
                for fname, ts in apply_field_pipeline(toks, spec):
                    if fname == field and len(ts):
                        joined_terms = ts.groupby(level=0).agg(" ".join)
                        streams.update(joined_terms)
                mask = (" " + streams + " ").str.contains(needle, regex=False)
                yield pdf.loc[mask.to_numpy(), ["doc_id", "score"]]

        out = joined.mapInPandas(verify, schema="doc_id long, score double")
        out = out.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k is not None else out

    def search_near(
        self,
        query: str,
        window: int,
        k: int | None = 10,
        ordered: bool = False,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """Proximity (span-near) search: documents where the query terms
        co-occur within a ``window``-token span of the field's analyzed
        stream.  ``ordered=False`` (default): one witness occurrence per
        DISTINCT term, any order, ``max(pos) - min(pos) <= window``.
        ``ordered=True``: one occurrence per query SLOT (duplicates kept)
        at strictly increasing positions with the same span bound — so
        ``ordered=True, window=len(terms)-1`` is exactly phrase adjacency.
        Score = conjunctive BM25 over the distinct terms (candidacy set),
        ordering ``(score desc, doc_id asc)`` — the phrase contract.

        Uses the positional sidecar when the index carries it (term- and
        bucket-pruned sidecar scan, shard-local key intersection — corpus
        text never read); otherwise falls back to re-analyzing only the
        candidate rows, same as phrase."""
        if window < 0:
            raise ValueError("window must be >= 0")
        spec = (pipeline or self.pipeline).text_spec
        terms = self._analyze_ordered(query, spec)
        if not terms:
            return self.search(QuerySpec(groups=(), filters=()), k=k)
        uniq = tuple(dict.fromkeys(terms))
        cand = self.search(
            QuerySpec(groups=((spec.field, "all", uniq),), filters=()), k=None
        )
        if len(terms) == 1:
            if k is not None:
                return cand.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            return cand
        if self.index.positions is not None:
            from .positions import near_match_docs

            matched = near_match_docs(
                self.index.positions, spec.field, terms, window,
                ordered=ordered, buckets=self.index.buckets,
            )
            out = cand.join(matched, "doc_id")
            out = out.orderBy(F.desc("score"), F.asc("doc_id"))
            return out.limit(k) if k is not None else out
        src = spec.source
        slots = list(terms) if ordered else sorted(set(terms))

        def verify(batches):
            import numpy as np
            import pandas as pd

            from .analysis import apply_field_pipeline, tokenize
            from .positions import near_keys_match

            for pdf in batches:
                if pdf.empty:
                    yield pdf[["doc_id", "score"]]
                    continue
                pdf = pdf.reset_index(drop=True)
                toks = tokenize(pdf[src], spec.tokenizer)
                keep = []
                for fname, ts in apply_field_pipeline(toks, spec):
                    if fname != spec.field or not len(ts):
                        continue
                    # per-row surviving streams; row index plays doc_id
                    for row, stream in ts.groupby(level=0):
                        arr = stream.to_numpy()
                        L = np.int64(arr.size + window + 2)
                        slot_keys = [
                            np.int64(row) * L + np.flatnonzero(arr == t)
                            for t in slots
                        ]
                        if near_keys_match(slot_keys, window, ordered, L).size:
                            keep.append(row)
                yield pdf.loc[sorted(set(keep)), ["doc_id", "score"]]

        joined = cand.join(self.index.docs.select("doc_id", src), "doc_id")
        out = joined.mapInPandas(verify, schema="doc_id long, score double")
        out = out.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k is not None else out

    #: more_like_this representative-term cap — operator contract
    MLT_MAX_TERMS = 10

    def more_like_this(
        self,
        doc_id: int,
        k: int | None = 10,
        max_terms: int = MLT_MAX_TERMS,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """Similar-document retrieval: the seed doc's ``max_terms``
        highest tf·idf terms (tf from re-analyzing its source text with
        the build analyzer; idf from the driver-cached vocabulary — the
        index's own numbers) run as ONE Any-combinator BM25 query, seed
        excluded.  Tie-break (weight desc, term asc), then the usual
        (score desc, doc_id asc).

        Driver work is O(seed doc length): one single-row fetch + one
        cached vocab batch — the scored retrieval is the same
        single-stage search job as every other query."""
        from collections import Counter

        spec = (pipeline or self.pipeline).text_spec
        rows = self.index.docs.filter(F.col("doc_id") == doc_id).select(
            spec.source
        ).collect()
        if not rows or rows[0][0] is None:
            return self.search(QuerySpec(groups=(), filters=()), k=k)
        tf = Counter(self._analyze_ordered(rows[0][0], spec))
        vocab = self.index.vocab_lookup([(spec.field, t) for t in tf])
        weighted = sorted(
            ((t, n * vocab[(spec.field, t)][1]) for t, n in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )[:max_terms]
        terms = tuple(t for t, _ in weighted)
        if not terms:
            return self.search(QuerySpec(groups=(), filters=()), k=k)
        hits = self.search(
            QuerySpec(groups=((spec.field, "any", terms),), filters=()),
            k=None if k is None else k + 1,
        ).filter(F.col("doc_id") != doc_id)
        hits = hits.orderBy(F.desc("score"), F.asc("doc_id"))
        return hits.limit(k) if k is not None else hits

    def facet_counts(
        self,
        query: str | QuerySpec,
        by: str,
        filters=(),
        k: int | None = None,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(by, n_docs) — matching-document counts per value of a docs
        column over the FULL match set (search-engine faceting).  One
        search job + one doc_id-keyed join + one aggregation keyed by the
        facet value; n_docs desc, value asc."""
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        out = (
            hits.join(self.index.docs.select("doc_id", by), "doc_id")
            .groupBy(by)
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc(by))
        )
        return out.limit(k) if k is not None else out

    def facet_stats(
        self,
        query: str | QuerySpec,
        by: str,
        value: str,
        filters=(),
        k: int | None = None,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """Numeric sub-aggregation per facet bucket over the FULL match
        set (the ES terms-agg + stats shape): ``(by, n_docs, min_value,
        max_value, avg_value, sum_value)`` of the stored numeric docs
        column ``value``, bucketed by the docs column ``by``.  Same plan
        as :meth:`facet_counts` — one search job + a three-column docs
        join + one aggregation; n_docs desc, bucket asc."""
        for col in (by, value):
            if col not in self.index.docs.columns:
                raise KeyError(
                    f"no stored column {col!r} in the docs table "
                    f"({self.index.docs.columns})"
                )
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        out = (
            hits.join(self.index.docs.select("doc_id", by, value), "doc_id")
            .groupBy(by)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min(value).alias("min_value"),
                F.max(value).alias("max_value"),
                F.avg(value).alias("avg_value"),
                F.sum(value).alias("sum_value"),
            )
            .orderBy(F.desc("n_docs"), F.asc(by))
        )
        return out.limit(k) if k is not None else out

    def facet_histogram(
        self,
        query: str | QuerySpec,
        value: str,
        interval: int,
        filters=(),
        k: int | None = None,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(bucket, n_docs) — the ES histogram aggregation: matching docs
        bucketed by ``floor(value / interval) * interval`` over a stored
        numeric column, bucket-ascending.  Same plan as
        :meth:`facet_counts` — one search job + a two-column docs join +
        one aggregation keyed by the bucket (map-side combinable)."""
        if value not in self.index.docs.columns:
            raise KeyError(
                f"no stored column {value!r} in the docs table "
                f"({self.index.docs.columns})"
            )
        if interval <= 0:
            raise ValueError("interval must be > 0")
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        bucket = (
            F.floor(F.col(value) / F.lit(int(interval))) * F.lit(int(interval))
        ).cast("long")
        out = (
            hits.join(self.index.docs.select("doc_id", value), "doc_id")
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.asc("bucket"))
        )
        return out.limit(k) if k is not None else out

    def term_vectors(self, doc_ids, field: str | None = None) -> DataFrame:
        """(doc_id, term, tf) — the ES term-vectors API: per-document
        term frequencies for the given doc id(s), re-derived by running
        the build analyzer over exactly those docs (one Arrow batch pass
        over the id-pruned docs join — the forward view is never
        materialized corpus-wide, and the inverted index is never
        decoded).  Ordering: doc_id, term."""
        if isinstance(doc_ids, int):
            doc_ids = [doc_ids]
        spec = self.pipeline.text_spec
        field = field or spec.field
        src = spec.source
        ids_df = self.index.spark.createDataFrame(
            [(int(d),) for d in doc_ids], "doc_id long"
        )
        joined = ids_df.join(self.index.docs.select("doc_id", src), "doc_id")
        spec_ref = spec

        def gen(batches):
            import pandas as pd

            from .analysis import analyze_pandas

            for pdf in batches:
                if pdf.empty:
                    yield pd.DataFrame(
                        {"doc_id": pd.Series([], dtype="int64"),
                         "field": pd.Series([], dtype="object"),
                         "term": pd.Series([], dtype="object"),
                         "tf": pd.Series([], dtype="int64")}
                    )
                    continue
                yield analyze_pandas(pdf.reset_index(drop=True), [spec_ref])

        out = joined.mapInPandas(
            gen, schema="doc_id long, field string, term string, tf long"
        )
        return (
            out.filter(F.col("field") == field)
            .select("doc_id", "term", "tf")
            .orderBy("doc_id", "term")
        )

    def facet_percentiles(
        self,
        query: "str | QuerySpec",
        by: str,
        value: str,
        percentiles: tuple = (0.5, 0.95),
        filters=(),
        k: int | None = None,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(by, n_docs, p<NN>_value...) — the ES percentiles
        sub-aggregation, exact: per facet bucket, the linearly-interpolated
        (SQL ``percentile_cont``) percentiles of a stored numeric docs
        column over the FULL match set.  Same plan as :meth:`facet_stats`
        — one search job + a three-column docs join + one aggregation (the
        exact percentile buffers each bucket's values in the aggregator;
        the buckets of a facet column are bounded-cardinality by contract,
        and at sketch-accuracy needs ``percentile_approx`` drops in with
        the same plan).  n_docs desc, bucket asc."""
        for col in (by, value):
            if col not in self.index.docs.columns:
                raise KeyError(
                    f"no stored column {col!r} in the docs table "
                    f"({self.index.docs.columns})"
                )
        ps = [float(p) for p in percentiles]
        if not ps or any(not (0.0 <= p <= 1.0) for p in ps):
            raise ValueError(f"percentiles must be in [0, 1]: {percentiles}")
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        aggs = [F.count(F.lit(1)).alias("n_docs")] + [
            F.percentile(F.col(value).cast("double"), F.lit(p)).alias(
                f"p{int(round(p * 100)):02d}_value"
            )
            for p in ps
        ]
        out = (
            hits.join(self.index.docs.select("doc_id", by, value), "doc_id")
            .groupBy(by)
            .agg(*aggs)
            .orderBy(F.desc("n_docs"), F.asc(by))
        )
        return out.limit(k) if k is not None else out

    def facet_cardinality(
        self,
        query: "str | QuerySpec",
        by: str,
        value: str,
        filters=(),
        k: int | None = None,
        approx: bool = False,
        rsd: float = 0.05,
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(by, n_docs, n_distinct) — the ES ``cardinality``
        sub-aggregation: per facet bucket, how many DISTINCT values of a
        stored docs column appear in the FULL match set (unique authors
        per language, unique repos per tag, ...).  Same plan as
        :meth:`facet_stats` — one search job + a three-column docs join +
        one aggregation.

        ``approx=False`` (default) computes the exact distinct count —
        Spark plans it as a two-phase aggregate (partial distinct below
        the exchange keyed on ``(by, value)``), so the shuffle carries at
        most one row per distinct pair, not per matching doc.  At 100 TB
        a high-cardinality ``value`` makes even that pair set huge;
        ``approx=True`` switches to ``approx_count_distinct`` (Spark's
        HyperLogLog++), whose fixed-size sketches partial-aggregate
        map-side and merge in the exchange — constant shuffle bytes per
        bucket regardless of cardinality, the same sketch-merge shape a
        multi-executor cluster needs.  ``rsd`` is the HLL relative
        standard deviation (ES default 40000 thresholds ~ rsd 0.0065).
        n_docs desc, bucket asc."""
        for col in (by, value):
            if col not in self.index.docs.columns:
                raise KeyError(
                    f"no stored column {col!r} in the docs table "
                    f"({self.index.docs.columns})"
                )
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        distinct = (
            F.approx_count_distinct(value, rsd) if approx
            else F.count_distinct(F.col(value))
        )
        out = (
            hits.join(self.index.docs.select("doc_id", by, value), "doc_id")
            .groupBy(by)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                distinct.alias("n_distinct"),
            )
            .orderBy(F.desc("n_docs"), F.asc(by))
        )
        return out.limit(k) if k is not None else out

    def facet_composite(
        self,
        query: "str | QuerySpec",
        by: "str | list[str]",
        size: int = 10,
        after: tuple | None = None,
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(by..., n_docs) — the ES ``composite`` aggregation: bucket the
        FULL match set by one or more stored docs columns and page
        through ALL buckets in deterministic key order, ``size`` at a
        time, resuming from ``after`` (the last key tuple of the previous
        page).  This is how a terms agg with millions/billions of buckets
        is exported without materializing it: each page is an independent
        job whose cost is one aggregation + a keyset predicate — no
        OFFSET (whose per-shard buffer grows with depth) and no driver
        accumulation.  Buckets order key-ascending (NULL-free by
        contract: composite sources must be non-null columns).

        ``after`` is a tuple matching ``by``; the next page is every
        bucket with key lexicographically GREATER than it — the same
        keyset-pagination shape as :meth:`search` ``after=``.  The
        predicate references only grouping columns, so Catalyst pushes
        the WHOLE OR-of-AND-prefixes clause below the aggregate into the
        docs parquet scan (``DataFilters`` on the FileScan — pinned by
        ``test_facet_composite_after_key_reaches_scan``), so deep pages
        also prune input row-groups under a key-clustered layout."""
        keys = [by] if isinstance(by, str) else list(by)
        if not keys:
            raise ValueError("facet_composite needs at least one key column")
        for col in keys:
            if col not in self.index.docs.columns:
                raise KeyError(
                    f"no stored column {col!r} in the docs table "
                    f"({self.index.docs.columns})"
                )
        if after is not None and len(after) != len(keys):
            raise ValueError(
                f"after has {len(after)} values for {len(keys)} key columns"
            )
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        out = (
            hits.join(self.index.docs.select("doc_id", *keys), "doc_id")
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        if after is not None:
            # lexicographic tuple > after, expanded to OR-of-AND-prefixes
            # (k1 > a1) OR (k1 = a1 AND k2 > a2) OR ...
            clause = None
            for i in range(len(keys)):
                c = F.col(keys[i]) > F.lit(after[i])
                for j in range(i):
                    c = (F.col(keys[j]) == F.lit(after[j])) & c
                clause = c if clause is None else (clause | c)
            out = out.filter(clause)
        return out.orderBy(*[F.asc(c) for c in keys]).limit(size)

    def keywords(
        self,
        k_per_doc: int = 3,
        field: str | None = None,
    ) -> DataFrame:
        """(doc_id, term, tf, score) — per-document tf-idf keyword
        extraction over the committed index: each doc's top ``k_per_doc``
        terms by ``tf * idf`` (ties term-ascending), the corpus-scale
        'tag every document' batch op (feeds faceting, routing, weak
        labels for training data).

        Plan shape: the per-(field,term) vocabulary row (df, idf — tiny)
        is broadcast-joined onto the COMPRESSED postings rows first, so
        idf rides each blob before decoding; one Arrow pass decodes blobs
        to (doc_id, term, tf, score); the per-doc top-k is a row_number
        window keyed by doc_id — an even-keyed shuffle (every doc has
        O(dl) terms), never a global sort.  O(postings) total work: the
        honest lower bound for whole-corpus keyword extraction."""
        import pandas as pd

        from . import codec

        if k_per_doc < 1:
            raise ValueError("k_per_doc must be >= 1")
        f = field or self.pipeline.text_spec.field
        vocab = self.index.vocabulary.filter(F.col("field") == f).select(
            "term", "idf"
        )
        rows = (
            self.index.postings.filter(F.col("field") == f)
            .select("term", "blob")
            .join(F.broadcast(vocab), "term")
        )

        def explode(batches):
            for pdf in batches:
                frames = []
                for term, blob, idf in zip(pdf["term"], pdf["blob"], pdf["idf"]):
                    docs, tfs = codec.decode_postings(bytes(blob))
                    frames.append(
                        pd.DataFrame(
                            {
                                "doc_id": docs,
                                "term": term,
                                "tf": tfs,
                                "score": tfs.astype("float64") * float(idf),
                            }
                        )
                    )
                yield (
                    pd.concat(frames, ignore_index=True)
                    if frames
                    else pd.DataFrame(
                        {
                            "doc_id": pd.Series([], dtype="int64"),
                            "term": pd.Series([], dtype=str),
                            "tf": pd.Series([], dtype="int64"),
                            "score": pd.Series([], dtype="float64"),
                        }
                    )
                )

        from pyspark.sql.window import Window

        flat = rows.mapInPandas(
            explode, "doc_id long, term string, tf long, score double"
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
        return (
            flat.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k_per_doc)
            .drop("rn")
        )

    def search_collapse(
        self,
        query: str | QuerySpec,
        by: str,
        k: int | None = 10,
        per_group: int = 1,
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(doc_id, score, by) — ES field collapsing / Lucene grouping:
        rank the match set by BM25, keep only the best ``per_group`` docs
        per value of the stored docs column ``by`` (best = highest score,
        doc_id-ascending tie-break), return the global top-k of the
        survivors.  Diversifies results: at most ``per_group`` hits per
        source/site/repo.

        Plan shape: one search job + a doc_id-keyed docs join, then —
        for ``per_group=1`` — a ``max_by`` aggregation (map-side
        combinable, no per-group sort; the 100-TB path: one shuffle keyed
        by the collapse value); for ``per_group>1`` a per-group
        ``row_number`` window (still keyed by ``by`` — partitions by
        group value, never a global sort)."""
        if by not in self.index.docs.columns:
            raise KeyError(
                f"no stored column {by!r} in the docs table "
                f"({self.index.docs.columns})"
            )
        if per_group < 1:
            raise ValueError("per_group must be >= 1")
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        joined = hits.join(self.index.docs.select("doc_id", by), "doc_id")
        if per_group == 1:
            # max over (score, -doc_id) == highest score, lowest doc_id
            best = joined.groupBy(by).agg(
                F.max(
                    F.struct(
                        F.col("score").alias("score"),
                        (-F.col("doc_id")).alias("neg_id"),
                    )
                ).alias("best")
            )
            out = best.select(
                (-F.col("best.neg_id")).cast("long").alias("doc_id"),
                F.col("best.score").alias("score"),
                by,
            )
        else:
            from pyspark.sql.window import Window

            # salted two-phase top-P: a low-cardinality collapse key (lang,
            # source, ...) would make the naive per-group window sort one
            # huge partition per value.  Phase 1 takes top-P within
            # (group, salt) — 32-way parallel per group; phase 2's window
            # then sees <= 32*P rows per group.  Exact: every row of a
            # group's true top-P is in its salt's top-P.
            salt = F.pmod(F.hash("doc_id"), F.lit(self.COLLAPSE_SALTS))
            order = (F.desc("score"), F.asc("doc_id"))
            w1 = Window.partitionBy(by, "salt").orderBy(*order)
            w2 = Window.partitionBy(by).orderBy(*order)
            out = (
                joined.withColumn("salt", salt)
                .withColumn("rn", F.row_number().over(w1))
                .filter(F.col("rn") <= per_group)
                .withColumn("rn", F.row_number().over(w2))
                .filter(F.col("rn") <= per_group)
                .select("doc_id", "score", by)
            )
        out = out.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k is not None else out

    #: collapse phase-1 fan-out per group (the skew dial for per_group>1)
    COLLAPSE_SALTS = 32

    #: search_parents score composition modes (ES has_child score_mode,
    #: plus 'count' = number of matching children as the score)
    PARENT_SCORE_MODES = ("sum", "max", "min", "avg", "count")

    def search_parents(
        self,
        query: "str | QuerySpec",
        child_key: str,
        k: int | None = 10,
        score_mode: str = "sum",
        min_children: int = 1,
        filters=(),
        pipeline: "QueryPipeline | None" = None,
    ) -> DataFrame:
        """(child_key, score, n_children) — parent-child search (the ES
        ``has_child`` query / Lucene block join, reference has no parent
        axis — beyond-reference): rank PARENTS by a composition of their
        matching children's relevance.  Children are the indexed docs;
        the parent key is a stored docs column (site, repo, source, ...).
        ``score_mode`` folds child scores per parent: ``sum`` (default,
        ES's), ``max``/``min``/``avg``, or ``count`` (number of matching
        children — the "how many pages of this site match" shape).
        ``min_children`` drops parents with fewer matching children (the
        ES ``min_children`` dial).  Ties: score desc, parent key asc.

        Plan shape: one search job + a doc_id-keyed docs join + ONE
        map-side-combinable aggregation keyed by the parent value —
        collapse's 100-TB discipline (never a per-parent sort; parent
        cardinality bounds the shuffle, not the match set)."""
        if child_key not in self.index.docs.columns:
            raise KeyError(
                f"no stored column {child_key!r} in the docs table "
                f"({self.index.docs.columns})"
            )
        if score_mode not in self.PARENT_SCORE_MODES:
            raise ValueError(
                f"unknown score_mode {score_mode!r} "
                f"(one of {self.PARENT_SCORE_MODES})"
            )
        if min_children < 1:
            raise ValueError("min_children must be >= 1")
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        joined = hits.join(self.index.docs.select("doc_id", child_key), "doc_id")
        folds = {
            "sum": F.sum("score"),
            "max": F.max("score"),
            "min": F.min("score"),
            "avg": F.avg("score"),
            "count": F.count(F.lit(1)).cast("double"),
        }
        out = (
            joined.groupBy(child_key)
            .agg(
                folds[score_mode].alias("score"),
                F.count(F.lit(1)).alias("n_children"),
            )
            .filter(F.col("n_children") >= min_children)
            .orderBy(F.desc("score"), F.asc(child_key))
        )
        return out.limit(k) if k is not None else out

    #: significant-terms floor — buckets below this foreground doc count
    #: are noise (the ES `min_doc_count` default for significant_terms)
    SIGNIFICANT_MIN_FG = 3

    def significant_terms(
        self,
        query: str | QuerySpec,
        k: int | None = 10,
        min_fg: int = SIGNIFICANT_MIN_FG,
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(term, fg_df, bg_df, score) — the ES significant-terms
        aggregation: terms that are unusually frequent in the documents
        MATCHING the query (foreground) relative to the whole corpus
        (background), scored with JLH::

            score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
            fg_pct = fg_df / n_fg,  bg_pct = bg_df / N

        keeping only terms with ``fg_df >= min_fg`` and
        ``fg_pct > bg_pct``; score desc, term asc.

        Cost shape: one search job for the match set, then re-analysis of
        the MATCHING docs only (one Arrow batch pass — candidates-only,
        the snippets discipline, never the corpus) aggregated to per-term
        foreground doc counts; background counts come from the stored
        vocabulary (no second corpus scan).  The foreground size rides a
        1-row aggregate crossJoin so no scalar leaves the cluster."""
        pl = pipeline or self.pipeline
        spec = pl.text_spec
        hits = self.search(query, k=None, filters=filters, pipeline=pipeline)
        # _analyzed_pairs emits each matching doc's terms deduplicated
        # inside its own Arrow batch, so the pairs are already globally
        # distinct — a plain row count per term IS the foreground df
        # (r6: drops the former global distinct exchange + two-phase
        # countDistinct over the re-analysis output)
        # LAZY localCheckpoint (the dedup_components pattern): the pairs
        # frame feeds BOTH aggregations below, and without a
        # materialization boundary the search job + re-analysis pass
        # execute once per consumer.  This is a per-invocation
        # intermediate — recomputed on every call, nothing persists
        # across runs — so it is plan truncation, not result caching.
        pairs = self._analyzed_pairs(
            hits.select("doc_id"), spec
        ).localCheckpoint(eager=False)
        fg = pairs.groupBy("term").agg(
            F.count(F.lit(1)).alias("fg_df")
        )
        # n_fg = |matching docs|: every hit contains >= 1 group term in
        # the searched field, so its re-analysis emits >= 1 pair and the
        # distinct-doc count over `pairs` equals the hit count — this
        # rides the checkpointed rows instead of re-running the search
        n_fg = pairs.agg(F.countDistinct("doc_id").alias("n_fg"))
        bg = self.index.vocabulary.filter(F.col("field") == spec.field).select(
            "term", F.col("df").alias("bg_df")
        )
        n_docs = int(self.index.n_docs)
        out = (
            fg.filter(F.col("fg_df") >= F.lit(int(min_fg)))
            .join(bg, "term")
            .crossJoin(F.broadcast(n_fg))
            .withColumn("fg_pct", F.col("fg_df") / F.col("n_fg"))
            .withColumn("bg_pct", F.col("bg_df") / F.lit(float(n_docs)))
            .filter(F.col("fg_pct") > F.col("bg_pct"))
            .withColumn(
                "score",
                (F.col("fg_pct") - F.col("bg_pct"))
                * (F.col("fg_pct") / F.col("bg_pct")),
            )
            .select("term", "fg_df", "bg_df", "score")
            .orderBy(F.desc("score"), F.asc("term"))
        )
        return out.limit(k) if k is not None else out

    def _analyzed_pairs(self, doc_ids: DataFrame, spec: FieldSpec) -> DataFrame:
        """DISTINCT (doc_id, term) pairs of the given docs re-analyzed
        through ``spec`` — the candidates-only re-analysis primitive shared
        by significant_terms (and the moral core of snippets): an Arrow
        batch pass over exactly the joined rows, never the corpus.  Each
        doc's pairs are deduplicated inside its own batch and a doc never
        spans batches, so the output is globally distinct without a
        distinct exchange."""
        src = spec.source
        joined = doc_ids.join(self.index.docs.select("doc_id", src), "doc_id")
        field = spec.field

        def gen(batches):
            import pyarrow as _pa
            import pyarrow.compute as _pc

            from .analysis import analyze_record_batch

            for batch in batches:
                if len(batch) == 0:
                    continue
                ids = batch.column("doc_id")
                # the analyzer's tf rows are one row per (doc, term) —
                # already the distinct pairs, no pandas round-trip
                for fname, doc_pos, tcodes, term_dict, _tfs in (
                    analyze_record_batch(batch, [spec])
                ):
                    if fname != field or not len(tcodes):
                        continue
                    yield _pa.RecordBatch.from_arrays(
                        [
                            ids.take(_pa.array(doc_pos)),
                            _pc.take(term_dict, _pa.array(tcodes)),
                        ],
                        names=["doc_id", "term"],
                    )

        return joined.mapInArrow(
            gen, schema="doc_id long, term string"
        )

    #: snippet context half-width (tokens each side) — operator contract
    SNIPPET_WINDOW = 3

    def snippets(
        self,
        query: str | QuerySpec,
        k: int | None = 10,
        window: int = SNIPPET_WINDOW,
        filters=(),
        pipeline: QueryPipeline | None = None,
    ) -> DataFrame:
        """(doc_id, score, pos, snippet) — highlighting: for each top-k
        hit, the 1-based position of the FIRST query-term occurrence in
        the doc's analyzed token stream and the ±``window``-token context
        around it, space-joined.  ``pos`` is 0 / snippet empty if no term
        occurs (possible only for pure-filter or May-only queries).

        Cost shape: the search job is unchanged; highlighting touches the
        k result rows only (k-row join + one Arrow batch pass), never the
        corpus."""
        pl = pipeline or self.pipeline
        spec = pl.text_spec
        qspec = (
            pl.analyze(query, tuple((f.op, f.field, f.term) for f in filters))
            if isinstance(query, str)
            else query
        )
        qterms = frozenset(
            t for f, _, ts in qspec.groups if f == spec.field for t in ts
        )
        hits = self.search(qspec, k=k)
        src = spec.source
        joined = hits.join(self.index.docs.select("doc_id", src), "doc_id")
        tokenizer, field = spec.tokenizer, spec.field

        def gen(batches):
            import pandas as pd

            from .analysis import apply_field_pipeline, tokenize

            for pdf in batches:
                if pdf.empty:
                    yield pd.DataFrame(
                        {"doc_id": pd.Series([], dtype="int64"),
                         "score": pd.Series([], dtype="float64"),
                         "pos": pd.Series([], dtype="int64"),
                         "snippet": pd.Series([], dtype="object")}
                    )
                    continue
                pdf = pdf.reset_index(drop=True)
                toks = tokenize(pdf[src], tokenizer)
                streams = pd.Series([None] * len(pdf), dtype="object")
                for fname, ts in apply_field_pipeline(toks, spec):
                    if fname == field and len(ts):
                        streams.update(ts.groupby(level=0).agg(list))
                pos_out, snip_out = [], []
                for stream in streams:
                    stream = stream or []
                    pos = next(
                        (i + 1 for i, t in enumerate(stream) if t in qterms), 0
                    )
                    pos_out.append(pos)
                    snip_out.append(
                        " ".join(stream[max(0, pos - 1 - window): pos + window])
                        if pos
                        else ""
                    )
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "score": pdf["score"],
                     "pos": pos_out, "snippet": snip_out}
                )

        out = joined.mapInPandas(
            gen, schema="doc_id long, score double, pos long, snippet string"
        )
        return out.orderBy(F.desc("score"), F.asc("doc_id"))
