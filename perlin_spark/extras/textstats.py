"""Text analysis for training-data pipelines: quality scoring, language-ID,
token counting, document fingerprinting.

All native Spark SQL expressions (codegen-eligible, no Python in the hot
path) with exact DuckDB oracles.  Pinned constants below are part of the
operator contract — the SQL oracles replicate them literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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


def quality_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, uniq_ratio_x1e4, stop_ratio_x1e4).

    Length/uniqueness/stopword-density heuristics — the standard cheap
    quality gates of a pretraining pipeline."""
    toks = _tokens()
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(list(STOPWORDS))))
    return documents.select(
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
    toks = _tokens()

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
    return documents.select("doc_id", best_lang.alias("pred_lang"))


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
    toks = _tokens()
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
    return documents.select("doc_id", F.array_min(hashes).alias("fingerprint"))


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
