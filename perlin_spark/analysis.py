"""Vectorized analysis pipelines (tokenize -> normalize -> route).

Re-expresses the reference's push-based ``pipeline!`` chains
(``/root/reference/src/language/mod.rs:181-234``) as vectorized pandas
transforms run inside ``mapInPandas`` — no per-row Python in the hot path,
per the driver contract (BASELINE.json ``input_hint``).

Stage parity map (SURVEY.md §2.1):

* ``WhitespaceTokenizer``  (``src/language/mod.rs:92-120``)   -> ``Series.str.split()``
  (pandas' no-arg split == Rust ``split_whitespace``: any Unicode
  whitespace, empty tokens dropped).
* ``AlphaNumericTokenizer`` (``src/language/mod.rs:27-56``)   ->
  ``Series.str.findall(r'[^\\W_]+')`` — Unicode letters+digits, like Rust
  ``char::is_alphanumeric`` (which excludes ``_``).
* ``LowercaseFilter``       (``src/language/mod.rs:122-150``) -> ``Series.str.lower()``.
* ``Stemmer`` (Snowball english, ``src/language/stemmers.rs:9-47``) ->
  :func:`perlin_spark.stemmer.stem_series` (memoized unique-term stemming).
* ``StopwordFilter``        (``src/language/stopword_filter.rs:4-27``) -> ``Series.isin``.
* ``NumberFilter``          (``src/language/integers.rs:13-52``) -> regex route:
  tokens parsing as **u64** go to a numeric field, the rest stay in the
  text chain.  Tokens above u64::MAX take the string path, matching the
  reference's parse failure branch (``src/language/integers.rs:34``).
* Branch syntax ``Element | [other_field]`` (``src/language/mod.rs:188-195``)
  -> the routed frames are unioned into the same (field, term) output.

The same ``FieldSpec`` drives both the indexing side and the query side
(:func:`analyze_query`), which is the parity requirement called out in
SURVEY.md §2.3 #31.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .stemmer import stem_series

U64_MAX_STR = "18446744073709551615"  # 2**64 - 1, the reference's u64 bound
_ALNUM_PATTERN = r"[^\W_]+"
#: RE2 equivalent of the Python pattern above: runs of anything that is not
#: a Unicode letter/number are separators (underscore is neither, so it
#: separates — same as ``[^\W_]+`` which is "word chars minus underscore")
_ALNUM_SEP_RE2 = r"[^\p{L}\p{N}]+"
# camelCase boundaries for the identifier-splitting 'code' tokenizer:
# lower/digit->Upper, and acronym->CapWord (HTTPServer -> HTTP Server)
_CAMEL_RE2_A = (r"([a-z0-9])([A-Z])", r"\1 \2")
_CAMEL_RE2_B = (r"([A-Z]+)([A-Z][a-z])", r"\1 \2")


@dataclass(frozen=True)
class FieldSpec:
    """One indexed field and its analysis chain (cf. ``Field<T>``,
    ``/root/reference/src/field/mod.rs:23-28``)."""

    field: str                       # index field name
    source: str                      # corpus column analyzed into it
    tokenizer: str = "whitespace"    # 'whitespace' | 'alphanumeric' | 'code'
                                     # | 'trigram' (char 3-grams, substring
                                     # search — perlin_spark.trigram)
    lowercase: bool = True
    stem: bool = False               # Snowball english
    stopwords: tuple = ()
    number_field: str | None = None  # route u64 tokens into this field
    term_doc_ratio: float = 1.0      # weighting knob (src/field/mod.rs:91)
    numbers_only: bool = False       # ToUsize: parse-or-drop numeric field
                                     # (src/language/integers.rs:56-76)


def _split_arrow(arr: pa.Array, tokenizer: str) -> pa.Array:
    """string array -> list<string> token lists, via Arrow C++ kernels.

    The hot path runs on contiguous Arrow buffers (no per-token Python
    objects) — on bandwidth-constrained hosts this is the difference
    between scaling with cores and stalling on DRAM.  Semantics are pinned
    to the Unicode ``White_Space`` property / ``\\p{L}\\p{N}`` classes,
    matching the reference's Rust ``char::is_whitespace`` /
    ``char::is_alphanumeric`` (``/root/reference/src/language/mod.rs:27-120``).
    Empty tokens (split artifacts at string edges) are dropped downstream.
    """
    if tokenizer == "whitespace":
        return pc.utf8_split_whitespace(arr)
    if tokenizer == "alphanumeric":
        return pc.split_pattern_regex(arr, pattern=_ALNUM_SEP_RE2)
    if tokenizer == "code":
        # identifier-aware: break camelCase humps, then split on
        # non-alphanumeric (snake_case/kebab-case split for free) —
        # HTTPServer -> [http, server], parse_config -> [parse, config];
        # the same two regexes replicate 1:1 in the DuckDB oracle
        s = pc.replace_substring_regex(arr, pattern=_CAMEL_RE2_A[0], replacement=_CAMEL_RE2_A[1])
        s = pc.replace_substring_regex(s, pattern=_CAMEL_RE2_B[0], replacement=_CAMEL_RE2_B[1])
        return pc.split_pattern_regex(s, pattern=_ALNUM_SEP_RE2)
    if tokenizer == "trigram":
        # raw-content character 3-grams — the substring/regex-search
        # sidecar field (perlin_spark.trigram; Cox's trigram index).  No
        # Arrow n-gram kernel exists; CPython slicing per BATCH string is
        # the pragmatic path (build-time only — queries never tokenize
        # the corpus, and this is batch-level Python, not a row UDF)
        return pa.array(
            [
                [s[i : i + 3] for i in range(len(s) - 2)] if s else []
                for s in arr.to_pylist()
            ],
            type=pa.list_(pa.string()),
        )
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def tokenize(content: pd.Series, tokenizer: str) -> pd.Series:
    """content Series (index = doc position) -> exploded token Series."""
    arr = pa.Array.from_pandas(content.astype(object))
    lists = _split_arrow(arr, tokenizer)
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    toks = flat.to_pandas().astype(object)
    keep = (toks != "").to_numpy()
    out = toks[keep]
    out.index = content.index.to_numpy()[parent[keep]]
    return out


def _is_u64(tokens: pd.Series) -> pd.Series:
    """Vectorized u64-parse test (digits only, value <= 2**64-1)."""
    digits = tokens.str.fullmatch(r"[0-9]+")
    canon = tokens.str.lstrip("0")
    short = canon.str.len() < len(U64_MAX_STR)
    boundary = (canon.str.len() == len(U64_MAX_STR)) & (canon <= U64_MAX_STR)
    return digits & (short | boundary)


def canonical_u64(tokens: pd.Series) -> pd.Series:
    """Decimal canonical form, like Rust's parse->to_string ('010' -> '10')."""
    canon = tokens.str.lstrip("0")
    return canon.mask(canon == "", "0")


def route_unique_terms(
    uniq: pd.Series, spec: FieldSpec
) -> list[tuple[str, np.ndarray, pd.Series]]:
    """Run one field's normalization chain over the UNIQUE terms only.

    Returns ``[(field_name, bool-mask over uniq, normalized terms), ...]``.
    Zipfian text makes uniques ~1000x smaller than occurrences, so every
    per-string stage (lowercase, stem, stopwords, u64 routing) is off the
    hot path.  Tokens that are empty (tokenizer split artifacts) or contain
    NUL are dropped here — NUL would collide with the reserved doc-length
    pseudo-term (see ``build.DL_MARKER``), so it is reserved, loudly."""
    n = len(uniq)
    valid = np.ones(n, dtype=bool)
    if n:
        bad = (
            uniq.str.contains("\x00", regex=False).fillna(False).to_numpy()
            | (uniq == "").to_numpy()
        )
        valid &= ~bad
    out: list[tuple[str, np.ndarray, pd.Series]] = []
    if spec.numbers_only:
        num = (_is_u64(uniq).to_numpy() if n else valid.copy()) & valid
        kept = uniq[num]
        out.append((spec.field, num, canonical_u64(kept) if len(kept) else kept))
        return out
    remaining = valid
    if spec.number_field is not None and n:
        num = _is_u64(uniq).to_numpy() & valid
        if num.any():
            out.append((spec.number_field, num, canonical_u64(uniq[num])))
        remaining = remaining & ~num
    terms = uniq[remaining]
    if spec.lowercase:
        terms = terms.str.lower()
    if spec.stopwords and len(terms):
        keep = ~terms.isin(set(spec.stopwords)).to_numpy()
        mask = remaining.copy()
        mask[np.flatnonzero(remaining)[~keep]] = False
        remaining, terms = mask, terms[keep]
    if spec.stem and len(terms):
        terms = stem_series(terms)
    out.append((spec.field, remaining, terms))
    return out


def apply_field_pipeline(tokens: pd.Series, spec: FieldSpec) -> list[tuple[str, pd.Series]]:
    """Run one field's chain over an exploded token Series.

    Returns ``[(field_name, term_series), ...]`` — more than one entry when
    the NumberFilter tees tokens into a numeric field.
    """
    if len(tokens):
        tokens = tokens[~tokens.str.contains("\x00", regex=False).fillna(False)]
    out: list[tuple[str, pd.Series]] = []
    if spec.numbers_only:
        # ToUsize semantics: parse as unsigned int, silently drop the rest
        numeric = _is_u64(tokens) if len(tokens) else tokens.astype(bool)
        kept = tokens[numeric]
        out.append((spec.field, canonical_u64(kept) if len(kept) else kept))
        return out
    if spec.number_field is not None and len(tokens):
        numeric = _is_u64(tokens)
        routed = tokens[numeric]
        if len(routed):
            out.append((spec.number_field, canonical_u64(routed)))
        tokens = tokens[~numeric]
    if spec.lowercase:
        tokens = tokens.str.lower()
    if spec.stopwords and len(tokens):
        tokens = tokens[~tokens.isin(set(spec.stopwords))]
    if spec.stem and len(tokens):
        tokens = stem_series(tokens)
    out.append((spec.field, tokens))
    return out


def analyze_pandas(pdf: pd.DataFrame, specs: list[FieldSpec], doc_id_col: str = "doc_id") -> pd.DataFrame:
    """One corpus batch -> tf rows ``(doc_id, field, term, tf)``.

    Thin pandas adapter over :func:`analyze_record_batch` — ONE semantic
    source for tokenization/normalization, so tests exercising this
    function gate exactly the code the distributed build runs.
    """
    pdf = pdf.reset_index(drop=True)
    batch = pa.RecordBatch.from_pandas(pdf, preserve_index=False)
    doc_ids_all = pdf[doc_id_col].to_numpy(dtype="int64")
    out_frames: list[pd.DataFrame] = []
    for field_name, doc_pos, tcodes, term_dict, tfs in analyze_record_batch(
        batch, specs, doc_id_col
    ):
        out_frames.append(
            pd.DataFrame(
                {
                    "doc_id": doc_ids_all[doc_pos],
                    "field": field_name,
                    "term": pc.take(term_dict, pa.array(tcodes)).to_pandas().astype(object),
                    "tf": tfs.astype("int64"),
                }
            )
        )
    if not out_frames:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "field": [], "term": [], "tf": pd.Series([], dtype="int64")}
        )
    return pd.concat(out_frames, ignore_index=True)


def analyze_record_batch(
    batch: pa.RecordBatch, specs: list[FieldSpec], doc_id_col: str = "doc_id"
) -> list[tuple[str, np.ndarray, np.ndarray, pa.Array, np.ndarray]]:
    """One Arrow corpus batch -> aggregated tf rows per output field.

    Returns ``[(field_name, doc_pos, term_codes, term_dict, tf), ...]``
    where ``doc_pos`` indexes rows of ``batch`` and ``term_codes`` indexes
    ``term_dict``.  Rows are TERM-MAJOR: sorted by (term_code, doc_pos) —
    the partial-posting encoder consumes term-grouped, doc-ascending runs
    directly, so the single ``np.unique`` here is the only sort on the
    whole map side (for doc-sorted input partitions).

    This is the build hot path: tokenization (:func:`_split_arrow`),
    flatten/parent-index bookkeeping, and occurrence dictionary-encoding
    all run inside Arrow C++ over contiguous buffers; Python only ever
    touches the (tiny) unique-term vector via :func:`route_unique_terms`
    and fixed-width numpy int arrays.  No per-occurrence Python objects —
    the contract of BASELINE.json ``input_hint`` and the reason the build
    scales with cores instead of stalling on memory bandwidth.
    """
    names = set(batch.schema.names)
    out: list[tuple[str, np.ndarray, np.ndarray, pa.Array, np.ndarray]] = []
    for spec in specs:
        if spec.source not in names:
            continue
        lists = _split_arrow(batch.column(spec.source), spec.tokenizer)
        flat = pc.list_flatten(lists)
        if len(flat) == 0:
            continue
        doc_pos_all = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        uniq = pd.Series(denc.dictionary.to_pandas(), dtype=object)

        for field_name, mask, final_terms in route_unique_terms(uniq, spec):
            if not mask.any():
                continue
            # remap occurrence codes -> compact per-field term ids; identical
            # normalized terms share one id so tf merges across raw spellings
            final_codes, final_uniques = pd.factorize(final_terms.to_numpy())
            remap = np.full(len(uniq), -1, dtype=np.int64)
            remap[np.flatnonzero(mask)] = final_codes
            occ_codes = remap[codes]
            occ_mask = occ_codes >= 0
            if not occ_mask.any():
                continue
            n_rows = len(batch)
            key = occ_codes[occ_mask] * n_rows + doc_pos_all[occ_mask]
            uk, counts = np.unique(key, return_counts=True)
            out.append(
                (
                    field_name,
                    uk % n_rows,   # doc_pos
                    uk // n_rows,  # term code (non-decreasing)
                    pa.array(final_uniques, type=pa.string()),
                    counts.astype(np.int64),
                )
            )
    return out


def analyze_record_batch_positions(
    batch: pa.RecordBatch, specs: list[FieldSpec], doc_id_col: str = "doc_id"
) -> list[tuple[str, np.ndarray, np.ndarray, pa.Array, np.ndarray, np.ndarray]]:
    """Occurrence-level twin of :func:`analyze_record_batch` for the
    positional sidecar: returns
    ``[(field_name, doc_pos, term_codes, term_dict, tf, positions), ...]``
    where rows are the same term-major (term_code, doc_pos) posting
    groups, and ``positions`` is the concatenation — aligned with the
    postings' doc order, ``tf`` values per doc — of each occurrence's
    0-based rank within the document's SURVIVING token stream for that
    field (the stream phrase adjacency is defined over: stopword-dropped
    and number-routed tokens do not occupy a slot, exactly matching the
    re-analysis semantics of ``PerlinEngine.search_phrase``).

    Same vectorization discipline as the tf analyzer: Arrow tokenize +
    flatten, normalization over unique terms only, numpy sorts — no
    per-occurrence Python."""
    names = set(batch.schema.names)
    out: list[tuple[str, np.ndarray, np.ndarray, pa.Array, np.ndarray, np.ndarray]] = []
    for spec in specs:
        if spec.source not in names:
            continue
        lists = _split_arrow(batch.column(spec.source), spec.tokenizer)
        flat = pc.list_flatten(lists)
        if len(flat) == 0:
            continue
        doc_pos_all = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        uniq = pd.Series(denc.dictionary.to_pandas(), dtype=object)

        for field_name, mask, final_terms in route_unique_terms(uniq, spec):
            if not mask.any():
                continue
            final_codes, final_uniques = pd.factorize(final_terms.to_numpy())
            remap = np.full(len(uniq), -1, dtype=np.int64)
            remap[np.flatnonzero(mask)] = final_codes
            occ_codes = remap[codes]
            occ_mask = occ_codes >= 0
            if not occ_mask.any():
                continue
            t = occ_codes[occ_mask]
            d = doc_pos_all[occ_mask].astype(np.int64, copy=False)
            # positions: rank within the doc's surviving stream — the flat
            # token order is doc-major and in-document order, so d is
            # non-decreasing and rank = index - start of the doc's run
            n_occ = t.size
            newdoc = np.empty(n_occ, dtype=bool)
            newdoc[0] = True
            newdoc[1:] = d[1:] != d[:-1]
            idx = np.arange(n_occ, dtype=np.int64)
            run_start = np.maximum.accumulate(np.where(newdoc, idx, 0))
            pos = idx - run_start
            # term-major regroup: (term, doc, pos ascending) — pos order
            # within (term, doc) is original order, kept by the stable sort
            order = np.lexsort((pos, d, t))
            t, d, pos = t[order], d[order], pos[order]
            change = np.empty(n_occ, dtype=bool)
            change[0] = True
            change[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
            starts = np.flatnonzero(change)
            tfs = np.diff(np.append(starts, n_occ))
            out.append(
                (
                    field_name,
                    d[starts],
                    t[starts],
                    pa.array(final_uniques, type=pa.string()),
                    tfs.astype(np.int64),
                    pos,
                )
            )
    return out


@dataclass(frozen=True)
class QuerySpec:
    """Analyzed query: per-field term groups plus chained filters.

    ``groups`` is ``[(field, combinator, (terms...)), ...]`` with
    combinator in {'all', 'any'} (``Combinator``,
    ``/root/reference/src/query/operators.rs:13-17``).  Groups combine by
    intersection (strict AND across analyzed query terms — SURVEY.md §2.4).
    ``filters`` is ``[(op, field, term), ...]`` with op in
    {'must', 'must_not', 'may'} (``ChainingOperator``,
    ``src/query/mod.rs:14-19``), plus ``('must_any', field, (terms...))``
    — an expanded :class:`~perlin_spark.engine.Range` filter: candidates
    must hold ANY of the tuple's terms (zero score contribution).
    """

    groups: tuple = ()
    filters: tuple = ()


@dataclass(frozen=True)
class QueryPipeline:
    """Query-side analyzer: the same chain re-run over the query string
    (``/root/reference/src/query/query_pipeline.rs:52-68``)."""

    text_spec: FieldSpec
    text_combinator: str = "all"      # `[All in text]`
    number_combinator: str = "any"    # `[Any in number]`
    #: query-time synonym map over ANALYZED terms: {term: (alt, ...)}.
    #: Keys are matched and alternates emitted post-analysis (after
    #: lowercase/stem), so both sides must be index terms — the standard
    #: query-side synonym-filter placement.  Under the 'all' combinator
    #: every token becomes its own Any subgroup ``(token | alts...)`` and
    #: groups intersect (Lucene SynonymGraph semantics: each query slot
    #: must match SOME alternate; scores sum over matched alternates).
    #: Under 'any' the alternates simply join the union group.
    synonyms: "dict[str, tuple[str, ...]] | None" = None

    def analyze(self, query: str, filters: tuple = ()) -> QuerySpec:
        toks = tokenize(pd.Series([query]), self.text_spec.tokenizer)
        groups: dict[tuple[str, str], list[str]] = {}
        if not toks.empty:
            for field_name, terms in apply_field_pipeline(toks, self.text_spec):
                comb = (
                    self.number_combinator
                    if field_name == self.text_spec.number_field
                    else self.text_combinator
                )
                key = (field_name, comb)
                groups.setdefault(key, []).extend(terms.tolist())
        out: list[tuple[str, str, tuple]] = []
        for (f, comb), terms in groups.items():
            syn = self.synonyms if f == self.text_spec.field else None
            if syn and comb == "all":
                for t in dict.fromkeys(terms):
                    alts = tuple(dict.fromkeys((t, *syn.get(t, ()))))
                    out.append((f, "any", alts))
            elif syn:
                union: list[str] = []
                for t in terms:
                    union.append(t)
                    union.extend(syn.get(t, ()))
                out.append((f, "any", tuple(dict.fromkeys(union))))
            else:
                out.append((f, comb, tuple(terms)))
        return QuerySpec(groups=tuple(out), filters=tuple(filters))


# --- canonical pipelines -------------------------------------------------

def reference_specs() -> list[FieldSpec]:
    """The reference test application's fields
    (``/root/reference/src/document_index.rs:60-69,80-89``)."""
    return [
        FieldSpec(field="text", source="text", tokenizer="whitespace",
                  lowercase=True, stem=True, number_field="number"),
        FieldSpec(field="title", source="title", tokenizer="whitespace",
                  lowercase=True, stem=True),
    ]


def documents_specs() -> list[FieldSpec]:
    """Pipeline for /root/testdata documents: whitespace + lowercase only
    (keeps the DuckDB oracle SQL-expressible; stemming is gated by the
    golden pytest suite instead)."""
    return [FieldSpec(field="text", source="text", tokenizer="whitespace", lowercase=True)]


def code_specs() -> list[FieldSpec]:
    """Pipeline for the BASELINE.json input_hint code-repo corpus:
    alphanumeric tokenizer + lowercase + u64 routing + stemming."""
    return [
        FieldSpec(field="content", source="content", tokenizer="alphanumeric",
                  lowercase=True, stem=False, number_field="number"),
    ]


def debug_stages(
    text: str, spec: FieldSpec, callback=None
) -> list[tuple[str, str, list[str]]]:
    """The reference's ``Debugger`` pipeline stage
    (``/root/reference/src/language/mod.rs:59-88``): a tap that observes
    the token stream between any two stages and passes it through
    unchanged.  The reference prints each item to stdout; here every
    inter-stage stream is captured as ``(stage, field, tokens)`` rows —
    inspectable as data, the Spark-idiomatic form of a println tap —
    and ``callback(stage, token)`` is invoked per token when given (the
    literal reference behavior is ``callback=lambda s, t: print(s, t)``).

    Stage order mirrors :func:`apply_field_pipeline` exactly;
    ``tests/test_analysis.py`` pins the final stage to its output, so the
    debug view cannot drift from the real chain."""
    out: list[tuple[str, str, list[str]]] = []

    def tap(stage: str, field: str, toks: pd.Series) -> None:
        vals = [str(t) for t in toks]
        out.append((stage, field, vals))
        if callback is not None:
            for t in vals:
                callback(stage, t)

    toks = tokenize(pd.Series([text]), spec.tokenizer)
    tap("tokenize", spec.field, toks)
    if len(toks):
        toks = toks[~toks.str.contains("\x00", regex=False).fillna(False)]
        tap("nul_filter", spec.field, toks)
    if spec.numbers_only:
        numeric = _is_u64(toks) if len(toks) else toks.astype(bool)
        kept = toks[numeric]
        tap("to_usize", spec.field, canonical_u64(kept) if len(kept) else kept)
        return out
    if spec.number_field is not None and len(toks):
        numeric = _is_u64(toks)
        routed = toks[numeric]
        if len(routed):
            tap("number_tee", spec.number_field, canonical_u64(routed))
        toks = toks[~numeric]
        tap("number_filter", spec.field, toks)
    if spec.lowercase:
        toks = toks.str.lower()
        tap("lowercase", spec.field, toks)
    if spec.stopwords and len(toks):
        toks = toks[~toks.isin(set(spec.stopwords))]
        tap("stopword_filter", spec.field, toks)
    if spec.stem and len(toks):
        toks = stem_series(toks)
        tap("stem", spec.field, toks)
    tap("index_term", spec.field, toks)
    return out
