"""Text analysis for training-data pipelines: quality scoring, language-ID,
token counting, document fingerprinting.

All native Spark SQL expressions (codegen-eligible, no Python in the hot
path) with exact DuckDB oracles.  Pinned constants below are part of the
operator contract — the SQL oracles replicate them literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# tiny marker profiles for heuristic language id (n-gram-free variant:
# marker-token voting; deterministic and SQL-expressible)
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "los", "las", "y", "que"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "est", "des"),
}

#: BPE-ish subword segmentation: letter runs, digit runs, single symbols
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

FINGERPRINT_K = 5  # tokens per fingerprint shingle


def _tokens(col: str = "text"):
    # empty tokens dropped for parity with the engine tokenizer and the
    # SQL oracles (list_filter(... <> ''))
    return F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda t: t != "")


def _toks_frame(documents: DataFrame, *keep: str) -> DataFrame:
    """Project the token array ONCE before any expression that references
    it repeatedly.  Without this projection boundary Catalyst inlines the
    split+lower+filter tree into every consumer — including the
    PER-ELEMENT lambda of the gram-building ``transform``, where it
    re-tokenizes the document once per gram (O(tokens^2) per doc, the
    r6 plan audit's biggest finding).  ``CollapseProject`` keeps the
    boundary because the aliased expression is non-cheap and referenced
    more than once."""
    cols = keep or ("doc_id",)
    return documents.select(*cols, _tokens().alias("toks"))


def quality_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, uniq_ratio_x1e4, stop_ratio_x1e4).

    Length/uniqueness/stopword-density heuristics — the standard cheap
    quality gates of a pretraining pipeline."""
    toks = F.col("toks")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(list(STOPWORDS))))
    return _toks_frame(documents, "doc_id", "text").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.floor(F.size(F.array_distinct(toks)) / F.size(toks) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("uniq_ratio_x1e4"),
        F.floor(stop_hits / F.size(toks) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("stop_ratio_x1e4"),
    )


def langid(documents: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) by marker-token voting; ties/zero -> 'und'.

    Deterministic argmax: languages compared in sorted key order, strict
    greater-than wins (so equal scores keep the earlier language only when
    it scored > 0 and later ones don't beat it; all-zero -> 'und')."""
    toks = F.col("toks")

    def marker_hits(markers):
        # NB: a 2-arg lambda would make F.filter pass (element, index)
        return F.size(F.filter(toks, lambda t: t.isin(list(markers))))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):  # deterministic tie-break: first max wins
        s = scores[lang]
        best_lang = F.when(s > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(s > best_score, s).otherwise(best_score)
    return _toks_frame(documents).select("doc_id", best_lang.alias("pred_lang"))


def subword_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_subwords) — whitespace vs BPE-ish counts."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))).alias(
            "n_subwords"
        ),
    )


def fingerprint(documents: DataFrame, k: int = FINGERPRINT_K) -> DataFrame:
    """(doc_id, fingerprint) — min-hash-of-shingles document fingerprint
    (winnowing-style 'rolling hash, keep the minimum'); md5-derived 60-bit
    ints keep BIGINT arithmetic identical across engines."""
    toks = F.col("toks")
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    hashes = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    return _toks_frame(documents).select(
        "doc_id", F.array_min(hashes).alias("fingerprint")
    )


#: default quality gates for filter_corpus — part of the operator
#: contract, replicated literally in the SQL oracle
QUALITY_MIN_TOKENS = 5
QUALITY_MAX_TOKENS = 100_000
QUALITY_MIN_UNIQ_X1E4 = 1000     # >= 10% distinct tokens
QUALITY_MAX_STOP_X1E4 = 7000     # <= 70% stopwords


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob_x1e4) — corpus-unigram-LM
    pseudo-perplexity: each token scores ``ln(count(term)/total_tokens)``
    against the corpus's OWN unigram distribution, averaged per document.
    The standard cheap LM-quality signal of a pretraining pipeline
    (outlier docs — boilerplate, wrong-language, garbage — sit far from
    the corpus distribution and score low... or suspiciously high for
    pure stopword spam; gate on both tails).

    Fully declarative, ONE corpus pass: corpus term counts and the
    token total are derived from the per-doc tf aggregate (``sum(tf)``),
    so the tokenize+explode subtree appears once behind a reused
    exchange instead of re-running per aggregation; the totals ride a
    broadcast one-row frame, no driver collect.  At 100 TB the tf table
    is the only wide shuffle and is exactly the vocabulary aggregation
    the index build already does."""
    toks = documents.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n_total"))
    per_doc = (
        tf.join(cnt, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.log(F.col("c") / F.col("n_total")))
                / F.sum("tf")
            ).alias("alp"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("alp") * 10000 + F.lit(0.5)).cast("long").alias(
            "avg_logprob_x1e4"
        ),
    )


def filter_corpus(
    documents: DataFrame,
    min_tokens: int = QUALITY_MIN_TOKENS,
    max_tokens: int = QUALITY_MAX_TOKENS,
    min_uniq_x1e4: int = QUALITY_MIN_UNIQ_X1E4,
    max_stop_x1e4: int = QUALITY_MAX_STOP_X1E4,
) -> DataFrame:
    """The quality GATE itself: documents surviving the standard cheap
    pretraining filters (length band, minimum uniqueness, maximum
    stopword density), with their stats attached.  One narrow pass — the
    predicate is a pure column expression over :func:`quality_stats`, so
    Catalyst pushes the whole gate into the scan at any scale."""
    q = quality_stats(documents)
    return q.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("uniq_ratio_x1e4") >= min_uniq_x1e4)
        & (F.col("stop_ratio_x1e4") <= max_stop_x1e4)
    )


#: repetition-signal n-gram sizes (Gopher-style quality heuristics) —
#: part of the operator contract, replicated literally in the SQL oracle
REP_TOP_N = 2        # "top-2-gram fraction"
REP_DUP_N = 5        # "duplicate-5-gram fraction"


def _grams(toks, n: int):
    """Positional n-gram strings of a token array (empty when < n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_2grams, top_2gram_x1e4, n_5grams, dup_5gram_x1e4) —
    within-document repetition signals: the fraction of 2-gram mass held
    by the single most frequent 2-gram, and the fraction of 5-gram
    occurrences that are repeats (count > 1).  The standard
    repetitious-text quality gates of a pretraining pipeline (boilerplate,
    keyword stuffing, template spam score high on both).

    One explode + one (doc_id, n, gram) aggregation + one per-doc
    aggregation — two shuffles keyed by doc, linear in token count, no
    per-doc quadratic array work, so the plan is the same at 100 TB.
    Docs too short to have any n-gram keep their row with 0 fractions."""
    toks = F.col("toks")
    tagged = F.concat(
        F.transform(_grams(toks, REP_TOP_N),
                    lambda g: F.struct(F.lit(REP_TOP_N).alias("n"), g.alias("g"))),
        F.transform(_grams(toks, REP_DUP_N),
                    lambda g: F.struct(F.lit(REP_DUP_N).alias("n"), g.alias("g"))),
    )
    ex = _toks_frame(documents).select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g")
    )
    cnt = ex.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias("c"))
    per = cnt.groupBy("doc_id").agg(
        F.sum(F.when(F.col("n") == REP_TOP_N, F.col("c"))).alias("tot2"),
        F.max(F.when(F.col("n") == REP_TOP_N, F.col("c"))).alias("max2"),
        F.sum(F.when(F.col("n") == REP_DUP_N, F.col("c"))).alias("tot5"),
        F.sum(
            F.when((F.col("n") == REP_DUP_N) & (F.col("c") > 1), F.col("c"))
        ).alias("dup5"),
    )

    def _x1e4(num, den):
        return (
            F.when(den > 0, F.floor(num / den * 10000 + F.lit(0.5)))
            .otherwise(F.lit(0))
            .cast("long")
        )

    stats = per.select(
        "doc_id",
        F.coalesce("tot2", F.lit(0)).cast("long").alias("n_2grams"),
        _x1e4(F.coalesce("max2", F.lit(0)), F.coalesce("tot2", F.lit(0))).alias(
            "top_2gram_x1e4"
        ),
        F.coalesce("tot5", F.lit(0)).cast("long").alias("n_5grams"),
        _x1e4(F.coalesce("dup5", F.lit(0)), F.coalesce("tot5", F.lit(0))).alias(
            "dup_5gram_x1e4"
        ),
    )
    return (
        documents.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            *[
                F.coalesce(c, F.lit(0)).cast("long").alias(c)
                for c in ("n_2grams", "top_2gram_x1e4", "n_5grams", "dup_5gram_x1e4")
            ],
        )
    )


#: decontamination n-gram size.  Public pipelines use 8–13-token grams
#: against benchmark eval sets; the module default follows suit, and the
#: tiny synthetic corpora pin a smaller k so the gate actually fires.
DECON_K = 8


def _decon_grams(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, g) — distinct k-token grams per doc (whole doc when < k),
    the contamination matching unit."""
    toks = F.col("toks")
    g = F.when(
        F.size(toks) >= k, _grams(toks, k)
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return _toks_frame(documents).select(
        "doc_id", F.explode(F.array_distinct(g)).alias("g")
    )


def _decon_hash_grams(documents: DataFrame, k: int) -> DataFrame:
    """(doc_id, hg) — distinct xxhash64 of each k-token window (the token
    ARRAY slice is hashed directly; no gram string is built).  Equal
    token windows always hash equal, so a hash match is a superset of a
    string-gram match: this is the candidate PREFILTER for
    :func:`contamination_hits` — false positives possible (hash
    collision), false negatives impossible."""
    toks = F.col("toks")
    hg = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            # k element_at calls instead of one slice(): xxhash64 chains
            # its arguments, so equal windows still always hash equal,
            # and skipping the per-window array allocation measured ~16%
            # faster (HOF lambdas evaluate interpreted, so per-window
            # constants dominate this pass)
            lambda i: F.xxhash64(
                *[F.element_at(toks, i + j + 1) for j in range(k)]
            ),
        ),
    ).otherwise(F.array(F.xxhash64(toks)))
    return _toks_frame(documents).select(
        "doc_id", F.explode(F.array_distinct(hg)).alias("hg")
    )


def contamination_hits(
    train: DataFrame, eval_docs: DataFrame, k: int = DECON_K
) -> DataFrame:
    """(doc_id, n_hit_ngrams) — training docs sharing at least one
    k-token gram with the eval/benchmark set (train/test leakage), with
    the count of DISTINCT contaminated grams.

    Two passes (r6 optimization, guide §2.3 — shuffle/compute on an
    8-byte proxy, pay the string work only where it can matter):

    1. **Hash prefilter.**  Both sides hash each k-token window with
       ``xxhash64`` over the token-array slice — no gram STRING is
       materialized for the bulk of the corpus.  A doc whose windows
       never hash-match the eval set provably shares no gram (equal
       windows hash equal), so only hash-candidate docs move on.
    2. **Exact string verify.**  The original gram-string join runs
       over the candidate docs only; a hash collision is therefore a
       false POSITIVE that this pass discards — the output is
       bit-identical to the single-pass string join on every input.

    The eval side is a benchmark suite — thousands of docs against a
    100 TB corpus — so its distinct-gram/hash sets ride broadcasts and
    both train-side scans stay shuffle-free; only the per-doc count
    aggregation shuffles, keyed by doc_id.  For an unusually large eval
    set, drop the ``F.broadcast`` hints and the same plan becomes a
    shuffle hash join."""
    ev_h = _decon_hash_grams(eval_docs, k).select("hg").distinct()
    cand_ids = (
        _decon_hash_grams(train, k)
        .join(F.broadcast(ev_h), "hg")
        .select("doc_id")
        .distinct()
    )
    ev = _decon_grams(eval_docs, k).select("g").distinct()
    return (
        _decon_grams(train.join(F.broadcast(cand_ids), "doc_id", "left_semi"), k)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
    )


def decontaminate(
    train: DataFrame, eval_docs: DataFrame, k: int = DECON_K
) -> DataFrame:
    """The decontamination GATE: training docs with NO k-gram overlap
    with the eval set (left-anti join against :func:`contamination_hits`)."""
    return train.join(contamination_hits(train, eval_docs, k), "doc_id", "left_anti")


#: sequence packing defaults — part of the operator contract
PACK_SEQ_LEN = 2048
PACK_BUCKET = 4096   # docs per prefix-sum bucket


def pack_sequences(
    documents: DataFrame,
    seq_len: int = PACK_SEQ_LEN,
    bucket: int = PACK_BUCKET,
) -> DataFrame:
    """(doc_id, n_tokens, tok_start, seq_first, seq_last) — assign every
    document its token offset in the doc_id-ordered concatenated token
    stream and the fixed-length training sequences it lands in (the
    standard concat-and-chunk packing of a pretraining data loader).

    A naive ``Window.orderBy(doc_id)`` prefix sum is ONE task at any
    scale.  This uses the two-phase distributed prefix sum instead:
    per-bucket token totals (a tiny aggregate, one row per ~``bucket``
    docs) get a cumulative offset on the single-partition side — at
    100 TB that frame is |corpus|/4096 rows, trivially one task — and
    the offset rides a broadcast back onto a window partitioned BY
    bucket, so the wide data only ever sees bucket-local windows.

    Zero-token documents are excluded (they occupy no span; they also
    contribute nothing to any offset)."""
    t = (
        documents.select(
            "doc_id",
            F.size(_tokens()).cast("long").alias("n_tokens"),
            F.floor(F.col("doc_id") / F.lit(bucket)).cast("long").alias("b"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    per_bucket = t.groupBy("b").agg(F.sum("n_tokens").alias("btot"))
    wb = Window.orderBy("b")  # one row per bucket: tiny by construction
    offsets = per_bucket.select(
        "b", (F.sum("btot").over(wb) - F.col("btot")).alias("boff")
    )
    w = Window.partitionBy("b").orderBy("doc_id")
    packed = (
        t.join(F.broadcast(offsets), "b")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("boff") + F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
                "tok_start"
            ),
        )
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "tok_start",
        F.floor(F.col("tok_start") / seq_len).cast("long").alias("seq_first"),
        F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / seq_len)
        .cast("long")
        .alias("seq_last"),
    )


CHUNK_TOKENS = 64   # tokens per chunk — operator contract
CHUNK_OVERLAP = 8   # tokens shared between consecutive chunks


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """(doc_id, chunk_id, tok_start, n_tokens, chunk) — fixed-size
    overlapping token-window chunking, the standard document splitter for
    RAG/embedding pipelines over long documents.  Chunk i covers tokens
    ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the final chunk is the remainder
    (never empty, never duplicated: a doc whose tail is already covered
    emits no extra chunk).

    All JVM-side (split/sequence/posexplode/slice/array_join — one narrow
    pass, no shuffle, codegen-eligible), so it runs at scan speed on
    100 TB and the DuckDB oracle replicates it literally."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # tokenize once: size() reads the projected array, not a second split
    t = _toks_frame(documents).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n")
    ).filter(F.col("n") > 0)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.col("n") - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("long")
    return (
        t.select(
            "doc_id",
            "n",
            "toks",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("long").alias("tok_start"),
            F.least(
                F.lit(chunk_tokens).cast("long"),
                F.col("n") - F.col("chunk_id") * stride,
            ).alias("n_tokens"),
            F.array_join(
                F.slice(
                    "toks",
                    (F.col("chunk_id") * stride + 1).cast("int"),
                    chunk_tokens,
                ),
                " ",
            ).alias("chunk"),
        )
    )


SEG_TOKENS = 16     # tokens per boilerplate segment — operator contract
SEG_MIN_DOCS = 2    # a segment in >= this many DISTINCT docs is boilerplate


def segment_dedup(
    documents: DataFrame,
    seg_tokens: int = SEG_TOKENS,
    min_docs: int = SEG_MIN_DOCS,
) -> DataFrame:
    """(doc_id, text_clean, n_segments, n_dropped) — cross-document
    boilerplate removal, the intra-corpus repetition filter of the
    MassiveText/RefinedWeb pretraining recipes: every non-overlapping
    ``seg_tokens``-token segment (final segment = remainder) whose EXACT
    text occurs in >= ``min_docs`` distinct documents is dropped from ALL
    of them; surviving segments rejoin in order (single spaces — the
    corpus tokenizer's normal form).  Docs whose every segment is
    boilerplate survive with ``text_clean = ''`` (removal is a content
    edit, never a doc filter — chain :func:`filter_corpus` for that).

    100-TB shape: segment construction is the :func:`chunk_documents`
    narrow pass (split/sequence/posexplode/slice — no shuffle); the
    boilerplate census shuffles sha256(segment) keys (32-byte digests,
    never full segment text, exact-dedup discipline of
    extras/dedup.py:84-101); the rebuild re-keys by doc_id.  No driver
    collect anywhere, no window over the corpus."""
    t = _toks_frame(documents).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n")
    ).filter(F.col("n") > 0)
    n_segs = F.ceil(F.col("n") / F.lit(seg_tokens)).cast("long")
    segs = (
        t.select(
            "doc_id",
            "toks",
            F.posexplode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_id", "_i"),
        )
        .select(
            "doc_id",
            F.col("seg_id").cast("long").alias("seg_id"),
            F.array_join(
                F.slice(
                    "toks",
                    (F.col("seg_id") * seg_tokens + 1).cast("int"),
                    seg_tokens,
                ),
                " ",
            ).alias("seg"),
        )
        .withColumn("seg_sha", F.sha2(F.col("seg"), 256))
    )
    boiler = (
        segs.groupBy("seg_sha")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("seg_sha")
    )
    totals = segs.groupBy("doc_id").agg(F.count("*").alias("n_segments"))
    keep = segs.join(boiler, "seg_sha", "left_anti")
    rebuilt = keep.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_id", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        F.col("n_segments"),
        (F.col("n_segments") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


# PII patterns — operator contract.  Deliberately restricted to syntax
# shared by Java regex (Spark) and RE2 (DuckDB oracle): no \b word
# boundaries, no lookaround.  Order matters: URLs first (an email-looking
# userinfo inside a URL is part of the URL), then emails, then IPv4.
PII_PATTERNS = (
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"(\d{1,3}\.){3}\d{1,3}", "<IP>"),
)


def redact_pii(documents: DataFrame) -> DataFrame:
    """(doc_id, text_redacted, n_url, n_email, n_ipv4) — the pretraining
    PII scrub: URLs, email addresses, and IPv4 literals are replaced by
    typed placeholder tokens, with per-doc counts (taken BEFORE each
    replacement, on the text as the previous stage left it).

    100-TB shape: three chained ``regexp_replace`` + ``regexp_extract_all``
    expressions — one narrow JVM pass at scan speed, codegen-eligible, no
    shuffle, no Python."""
    text = F.col("text")
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        text = F.regexp_replace(text, pat, repl)
    return documents.select(
        "doc_id", text.alias("text_redacted"), *counts
    )


def mixture_sample(
    documents: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    default_rate: float = 0.0,
    seed: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mixture resampling: keep each doc with a PER-GROUP rate
    (e.g. upweight books, downweight web) using the same keyed-md5 band
    as :func:`deterministic_sample` — reproducible across engines,
    partitionings, and retries, and consistent with any band already
    drawn with the same seed (a doc kept at rate r stays kept at r' > r).

    Pure column predicate over the scan: no shuffle, no UDF, pushes into
    the parquet read at any scale."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col))), 1, 8),
        16, 10,
    ).cast("long")
    band = F.lit(int(default_rate * (1 << 32)))
    for g in sorted(rates):  # deterministic order
        band = F.when(
            F.col(group_col) == g, F.lit(int(rates[g] * (1 << 32)))
        ).otherwise(band)
    return documents.filter(h < band)


def deterministic_sample(
    documents: DataFrame, rate: float, seed: int = 1, id_col: str = "doc_id"
) -> DataFrame:
    """Reproducible corpus sampling: keep a doc iff the first 8 hex chars
    of ``md5(seed || ':' || doc_id)`` fall under ``rate`` of the 32-bit
    space.  Unlike ``DataFrame.sample`` this is a pure function of the
    row KEY — stable across engines, partitionings, retries, and re-runs
    (the property a training pipeline needs for auditable held-out
    splits), and the exact split is reproducible in any engine with md5.
    Disjoint splits: complementary rate bands of the SAME hash (e.g.
    train = hash < 0.9, eval = hash >= 0.9) never overlap."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col))), 1, 8),
        16, 10,
    ).cast("long")
    return documents.filter(h < F.lit(int(rate * (1 << 32))))
