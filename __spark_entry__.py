"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Every operator family from SURVEY.md §2 that is SQL-expressible has an
oracle here; engine-internal operators (codec, WAND, stemming, golden
rank-identity) are gated by ``python -m pytest -x -q`` instead.

Floating-point columns are scaled+rounded to BIGINT (``floor(x*1e4+0.5)``)
in BOTH engines so value-hashes compare exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from perlin_spark import FieldSpec, Must, MustNot, PerlinEngine, QueryPipeline, Range
from perlin_spark import codec
from perlin_spark.extras import dedup, events, fusion, similarity, textstats

SF_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# engine cache (one documents index per sf_dir per session)
# ---------------------------------------------------------------------------

_ENGINES: dict[str, PerlinEngine] = {}

DOC_SPEC = FieldSpec(field="text", source="text", tokenizer="whitespace", lowercase=True)


def _engine(spark: SparkSession, sf_dir: str) -> PerlinEngine:
    eng = _ENGINES.get(sf_dir)
    if eng is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        eng = PerlinEngine.build(
            spark,
            docs,
            [DOC_SPEC],
            pipeline=QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"),
            content_col="text",
            n_shards=4,
            positions=True,  # ft_phrase_search gates the index-only path
        ).cache()
        _ENGINES[sf_dir] = eng
    return eng


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _score_x1e4(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id", F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("long").alias("score_x1e4")
    )


# ---------------------------------------------------------------------------
# core engine queries (documents table; whitespace+lowercase pipeline so the
# oracle is SQL-expressible — stemming/number-routing are pytest-gated)
# ---------------------------------------------------------------------------

POSTINGS_FLAT_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("doc_id", LongType()),
        StructField("tf", LongType()),
    ]
)


def q_postings_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the ENTIRE compressed index back to (term, doc_id, tf) —
    end-to-end validation of tokenize -> shuffle -> merge -> codec."""
    eng = _engine(spark, sf_dir)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for term, blob in zip(pdf["term"], pdf["blob"]):
                docs, tfs = codec.decode_postings(bytes(blob))
                frames.append(pd.DataFrame({"term": term, "doc_id": docs, "tf": tfs}))
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame({"term": pd.Series([], dtype=str),
                                   "doc_id": pd.Series([], dtype="int64"),
                                   "tf": pd.Series([], dtype="int64")})
            )

    return eng.index.postings.select("term", "blob").mapInPandas(explode, POSTINGS_FLAT_SCHEMA)


def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.index.vocabulary.select(
        "term",
        "df",
        F.floor(F.col("idf") * 1_000_000 + F.lit(0.5)).cast("long").alias("idf_x1e6"),
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl, sha) — doc lengths from the index + the sha256
    per-row invariant (BASELINE.json input_hint)."""
    eng = _engine(spark, sf_dir)

    schema = StructType([StructField("doc_id", LongType()), StructField("dl", LongType())])

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for blob in pdf["blob"]:
                docs, dls = codec.decode_postings(bytes(blob))
                frames.append(pd.DataFrame({"doc_id": docs, "dl": dls}))
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                   "dl": pd.Series([], dtype="int64")})
            )

    dl = eng.index.doc_lens.select("blob").mapInPandas(explode, schema)
    return dl.join(eng.index.docs.select("doc_id", "sha256"), "doc_id").select(
        "doc_id", "dl", F.col("sha256").alias("sha")
    )


def q_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.frequent_terms("text", 10)


def q_bm25_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _score_x1e4(_engine(spark, sf_dir).search("hash join", k=10))


def q_bm25_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    pl = QueryPipeline(text_spec=DOC_SPEC, text_combinator="any")
    return _score_x1e4(eng.search("dup stream vector", k=10, pipeline=pl))


def q_bm25_may(spark: SparkSession, sf_dir: str) -> DataFrame:
    from perlin_spark.engine import May

    eng = _engine(spark, sf_dir)
    return _score_x1e4(eng.search("merge", k=10, filters=[May("text", "dup")]))


def q_must_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _score_x1e4(eng.search("merge", k=10, filters=[Must("text", "dup")]))


def q_must_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _score_x1e4(eng.search("scan", k=10, filters=[MustNot("text", "dup")]))


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour per-type event stats — the batch twin of the
    streaming windowed aggregation (perlin_spark.streaming)."""
    return events.windowed_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet"), hours=1
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (>30 min silence starts a session)."""
    return events.sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_events_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram with a CALENDAR interval (day buckets, UTC
    wall-clock alignment) — calendar-aligned unlike the fixed-width
    epoch buckets of events_windowed_stats."""
    return events.date_histogram(
        spark.read.parquet(f"{sf_dir}/events.parquet"), unit="day"
    )


def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON probe of the props column, per event type."""
    return events.props_key_stats(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_bm25_mixed_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-group + Must + May + MustNot in ONE query — the role
    interaction path (query.py candidate gen -> chained filters -> May
    scoring) that single-role oracles never cross-exercise."""
    from perlin_spark.engine import May

    eng = _engine(spark, sf_dir)
    return _score_x1e4(
        eng.search(
            "sort merge",
            k=10,
            filters=[
                Must("text", "window"),
                May("text", "dup"),
                MustNot("text", "vector"),
            ],
        )
    )


def q_boolean_and_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure boolean conjunction result set (no limit) — the And operator."""
    eng = _engine(spark, sf_dir)
    hits = eng.search("sort merge window", k=None)
    return hits.select("doc_id")


# ---------------------------------------------------------------------------
# training-data pipeline extras
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_stats(_docs(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.12)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.12)


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. token-k-gram form): maximal
    cross-document duplicated token spans, k=8, min_docs=2."""
    return dedup.duplicate_substring_spans(_docs(spark, sf_dir))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE-PASS Arrow signature path (scale default) against the
    SQL-derivation oracle — the SQL-form ``dedup.simhash`` is the
    oracle-parity reference, equality additionally property-tested."""
    return dedup.simhash_arrow(_docs(spark, sf_dir))


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the exact n-gram
    Jaccard pair graph (threshold 0.12), every doc labeled with the
    smallest reachable doc_id; pair-free docs are their own component."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.12)
    return dedup.dedup_components(pairs, docs).select("doc_id", "component")


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup decision itself: one canonical doc per component."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.12)
    return dedup.dedup_keep_canonical(docs, pairs).select("doc_id", "component")


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slice-by-slice ingestion dedup: the corpus is split at the median
    doc_id into an immutable OLD half and a NEW batch; a new doc
    survives iff its near-dup component contains no old doc and it is
    the lowest-id new member.  Exercises the union pair graph, the
    contamination test, and canonical selection in one op."""
    docs = _docs(spark, sf_dir)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    split = (int(lo) + int(hi) + 1) // 2
    old = docs.filter(F.col("doc_id") < split)
    new = docs.filter(F.col("doc_id") >= split)
    return dedup.incremental_survivors(
        old, new, threshold=0.12, use_lsh=False
    ).select("doc_id")


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return similarity.cosine_topk(emb, list(qv), k=10, exclude_id=0)


def q_ann_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantized ANN: global-scale quantizer, integer-dot
    candidate pass (k*4 wide), exact cosine rerank."""
    emb = _embeddings(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return similarity.sq_topk(emb, list(qv), k=10, exclude_id=0)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_stats(_docs(spark, sf_dir))


def q_filter_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality gate itself (length band, uniqueness floor,
    stopword-density ceiling) — thresholds chosen so the gate actually
    REJECTS part of this corpus; an all-pass filter would be untested."""
    return textstats.filter_corpus(
        _docs(spark, sf_dir),
        min_tokens=20, min_uniq_x1e4=3500, max_stop_x1e4=1000,
    )


def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% held-out split by keyed md5 — stable across
    engines/partitionings/retries, which DataFrame.sample is not."""
    return textstats.deterministic_sample(
        _docs(spark, sf_dir), rate=0.1, seed=7
    ).select("doc_id")


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM pseudo-perplexity per document — the cheap LM
    quality signal (gate on both tails)."""
    return textstats.unigram_logprob(_docs(spark, sf_dir))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.langid(_docs(spark, sf_dir))


def q_subword_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.subword_counts(_docs(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprint(_docs(spark, sf_dir))


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition signals (top-2-gram mass,
    duplicate-5-gram mass)."""
    return textstats.repetition_stats(_docs(spark, sf_dir))


DECON_QUERY_K = 4   # module default is 8; the tiny synthetic corpus needs
                    # 4-grams for the gate to actually fire (65 hits at sf0.01)
DECON_TRAIN_RATE = 0.9  # train = seed-7 band < 0.9, eval = the complement


def _train_eval(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = _docs(spark, sf_dir)
    train = textstats.deterministic_sample(docs, DECON_TRAIN_RATE, seed=7)
    ev = docs.join(train.select("doc_id"), "doc_id", "left_anti")
    return train, ev


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram leakage detection: training docs sharing a
    4-gram with the held-out split, with distinct-gram hit counts."""
    train, ev = _train_eval(spark, sf_dir)
    return textstats.contamination_hits(train, ev, k=DECON_QUERY_K)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination gate: training docs surviving the anti-join."""
    train, ev = _train_eval(spark, sf_dir)
    return textstats.decontaminate(train, ev, k=DECON_QUERY_K).select("doc_id")


PACK_SEQ_LEN = 256  # pinned small so sf0.01 docs actually straddle sequences
PACK_BUCKET = 64    # ~8 buckets at sf0.01 — exercises the two-phase prefix sum


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing offsets via the distributed
    two-phase prefix sum (no global single-task window)."""
    return textstats.pack_sequences(
        _docs(spark, sf_dir), seq_len=PACK_SEQ_LEN, bucket=PACK_BUCKET
    )


CHUNK_TOKENS = 24  # pinned small so sf0.01 docs emit multi-chunk output
CHUNK_OVERLAP = 4


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the RAG/embedding document
    splitter) — one narrow JVM pass, chunk text hash-gated."""
    return textstats.chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic synthetic PII (the corpus has none):
    emails on doc_id%3, URLs on %4, IPv4 on %5 — the oracle applies the
    identical concatenation."""
    d = F.col("doc_id")
    ds = d.cast("string")
    return _docs(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(d % 3 == 0, F.concat(F.lit(" user"), ds, F.lit("@example.com")))
            .otherwise(F.lit("")),
            F.when(d % 4 == 0, F.concat(F.lit(" https://ex.io/p/"), ds))
            .otherwise(F.lit("")),
            F.when(d % 5 == 0, F.concat(F.lit(" 10.0.0."), (d % 256).cast("string")))
            .otherwise(F.lit("")),
        ),
    )


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: URL -> email -> IPv4 replacement with per-stage counts,
    all chained regexp expressions in one narrow JVM pass."""
    return textstats.redact_pii(_pii_docs(spark, sf_dir))


def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate segment removal (the MassiveText /
    RefinedWeb intra-corpus repetition filter): non-overlapping 16-token
    segments repeated across >= 2 distinct docs are dropped from all of
    them; the corpus' exact-duplicate docs guarantee the gate is
    non-trivial (their every segment is boilerplate)."""
    return textstats.segment_dedup(_docs(spark, sf_dir))


MIXTURE_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
MIXTURE_DEFAULT = 0.1


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: per-source keep rates over the same
    keyed md5 band as text_sample."""
    return textstats.mixture_sample(
        _docs(spark, sf_dir), MIXTURE_RATES, default_rate=MIXTURE_DEFAULT, seed=3
    ).select("doc_id", "source")


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval: BM25 top-10 (OR query) fused with
    embedding-cosine top-10 by reciprocal-rank fusion.  Convention: the
    embeddings table's vec_id IS the documents table's doc_id."""
    bm25 = q_bm25_or(spark, sf_dir)
    ann = q_ann_cosine(spark, sf_dir).withColumnRenamed("vec_id", "doc_id")
    return fusion.rrf_fuse({"bm25": bm25, "ann": ann}, id_col="doc_id", topk=10)


ANN_LSH_PLANES = 6  # pinned for the driver oracle (64 buckets at sf0.01)
EMB_PAIR_THRESHOLD = 0.45  # sf0.01 corpus tops out at cos ~0.51
EMB_PAIR_PLANES = 4  # pinned for the driver oracle


IVF_CENTROIDS = 16  # pinned for the driver oracle
IVF_NPROBE = 4


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return similarity.ivf_topk(
        emb, list(qv), k=10, n_centroids=IVF_CENTROIDS, nprobe=IVF_NPROBE,
        exclude_id=0,
    )


def q_emb_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_pairs_exact(
        _embeddings(spark, sf_dir), threshold=EMB_PAIR_THRESHOLD
    )


def q_emb_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_pairs(
        _embeddings(spark, sf_dir),
        threshold=EMB_PAIR_THRESHOLD,
        n_planes=EMB_PAIR_PLANES,
        probe_hamming=1,
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return similarity.lsh_cosine_topk(
        emb, list(qv), k=10, exclude_id=0, n_planes=ANN_LSH_PLANES, probe_hamming=1
    )


def q_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    # radius 3: the pigeonhole tables (4 x 15-bit blocks) guarantee full
    # recall, so the result EQUALS the exact hamming self-join the oracle runs
    return dedup.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3)


# --- code-corpus pipeline (BASELINE.json input_hint analyzers), driver-gated --

CODE_DOC_SPEC = FieldSpec(
    field="content", source="text", tokenizer="alphanumeric",
    lowercase=True, number_field="number",
)


def _code_engine(spark: SparkSession, sf_dir: str) -> PerlinEngine:
    key = f"code:{sf_dir}"
    eng = _ENGINES.get(key)
    if eng is None:
        # the documents corpus has no digits; derive deterministic numeric
        # tokens ("<id>" and "0<id>") so u64 routing + canonicalization get
        # real work — the oracle applies the identical concatenation
        docs = _docs(spark, sf_dir).withColumn(
            "text",
            F.concat_ws(
                " ",
                F.col("text"),
                F.col("doc_id").cast("string"),
                F.concat(F.lit("0"), F.col("doc_id").cast("string")),
            ),
        )
        eng = PerlinEngine.build(
            spark, docs, [CODE_DOC_SPEC],
            pipeline=QueryPipeline(
                text_spec=CODE_DOC_SPEC, text_combinator="all", number_combinator="any"
            ),
            n_shards=4,
        ).cache()
        _ENGINES[key] = eng
    return eng


IDENT_SPEC = FieldSpec(field="ident", source="text", tokenizer="code", lowercase=True)


def _ident_engine(spark: SparkSession, sf_dir: str) -> PerlinEngine:
    """Engine over identifier-bearing content: the 'code' tokenizer splits
    camelCase/snake_case, so querying the identifier `readFileAsync` finds
    documents mentioning its parts — the classic code-search feature."""
    key = f"ident:{sf_dir}"
    eng = _ENGINES.get(key)
    if eng is None:
        docs = _docs(spark, sf_dir).withColumn(
            "text",
            F.concat(
                F.lit("HTTPServer parseConfig "),
                F.when(F.col("doc_id") % 3 == 0, F.lit("readFileAsync "))
                .otherwise(F.lit("")),
                F.col("text"),
            ),
        )
        eng = PerlinEngine.build(
            spark, docs, [IDENT_SPEC],
            pipeline=QueryPipeline(text_spec=IDENT_SPEC, text_combinator="all"),
            n_shards=4,
        ).cache()
        _ENGINES[key] = eng
    return eng


def q_code_ident_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    # query BY IDENTIFIER: 'readFileAsync' analyzes to [read, file, async]
    # through the same pipeline, AND-combined, BM25-ranked
    return _score_x1e4(_ident_engine(spark, sf_dir).search("readFileAsync", k=10))


def q_code_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(field, term, df) under the code pipeline — gates the alphanumeric
    tokenizer + lowercase + u64 canonical routing end-to-end."""
    eng = _code_engine(spark, sf_dir)
    return eng.index.vocabulary.select("field", "term", "df")


def q_code_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _score_x1e4(_code_engine(spark, sf_dir).search("hash join", k=10))


def q_code_must_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with a Must filter on the routed number field."""
    eng = _code_engine(spark, sf_dir)
    return _score_x1e4(eng.search("merge", k=10, filters=[Must("number", "42")]))


FIELDED_BOOSTS = {"text": 1.0, "head": 2.5}


def _fielded_engine(spark: SparkSession, sf_dir: str) -> PerlinEngine:
    """Two-field engine: full text plus a 'head' field (first 120 chars) —
    the lead-boost shape (title/abstract weighting) with a SQL-derivable
    second field so search_fields is hash-gatable end-to-end."""
    key = f"fielded:{sf_dir}"
    eng = _ENGINES.get(key)
    if eng is None:
        docs = _docs(spark, sf_dir).withColumn("head", F.substring("text", 1, 120))
        specs = [
            FieldSpec(field="text", source="text"),
            FieldSpec(field="head", source="head"),
        ]
        eng = PerlinEngine.build(
            spark, docs, specs,
            pipeline=QueryPipeline(text_spec=specs[0]), n_shards=4,
        ).cache()
        _ENGINES[key] = eng
    return eng


def q_fielded_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-weighted multi-field search (engine.search_fields): one Any
    group spanning (text, head) with per-field boosts — gates the
    field-aware MaxScore path plus per-field dl normalization/idf."""
    eng = _fielded_engine(spark, sf_dir)
    return _score_x1e4(eng.search_fields("dup stream vector", FIELDED_BOOSTS, k=10))


def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with a numeric Range filter: vocabulary expansion of the
    in-range u64 values -> one zero-weight Any group (engine.Range).
    Gates both the decimal(20,0) vocabulary expansion and the must_any
    score-invariance (scores must equal the unfiltered query's)."""
    eng = _code_engine(spark, sf_dir)
    return _score_x1e4(eng.search("merge", k=10, filters=[Range("number", 100, 300)]))


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN, pure ADC over seeded codebooks (m=8, ks=16): the whole
    pipeline — unit-normalize, per-subspace nearest-centroid encode,
    lookup-table scoring — is deterministic and SQL-derivable, so the
    compressed-domain scores themselves are oracle-gated (rerank and
    k-means codebooks are pytest-gated on top)."""
    emb = _embeddings(spark, sf_dir)
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    return similarity.pq_topk(emb, qv, k=10, exclude_id=0)


IVFPQ_RERANK = 50  # pinned ADC shortlist size for the driver oracle
_IVFPQ_WRITTEN: set[str] = set()


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed IVF+PQ serving index (r3 verdict item 2), exercised
    exactly as deployed: ``write_ivf_pq_cells`` materializes the
    cell-partitioned codes plus the ``_centroids``/``_codebooks`` side
    tables, then ``ivf_pq_topk_from_cells`` reopens the index COLD (both
    side tables loaded back from parquet — no in-memory state passed),
    prunes to nprobe cell directories, ADC-scans the codes column
    JVM-side, and exact-reranks the top-``IVFPQ_RERANK`` shortlist."""
    import re

    emb = _embeddings(spark, sf_dir)
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    path = "/tmp/perlin_entry_ivfpq_" + re.sub(r"\W+", "_", sf_dir.rstrip("/"))
    if path not in _IVFPQ_WRITTEN:
        similarity.write_ivf_pq_cells(emb, path, n_centroids=IVF_CENTROIDS)
        _IVFPQ_WRITTEN.add(path)
    return similarity.ivf_pq_topk_from_cells(
        spark, path, qv, k=10, nprobe=IVF_NPROBE, rerank=IVFPQ_RERANK, exclude_id=0
    )


# taxonomy for the hierarchy-expanded search gate: seed + descendants are
# real corpus terms; the (join -> hash) subtree is a distractor that the
# expansion must NOT pick up
HIERARCHY_ROWS: list[tuple[str, str | None]] = [
    ("scan", None),
    ("filter", "scan"),
    ("sort", "scan"),
    ("merge", "sort"),
    ("dup", "merge"),
    ("join", None),
    ("hash", "join"),
]
HIERARCHY_SEED = "scan"


ANN_FILTER_MOD = 7  # pinned metadata predicate for the filtered-ANN oracle


def q_ann_ivf_pq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search over the composed index: the metadata
    predicate (here ``vec_id % 7 != 0``) is applied INSIDE the pruned
    scan, so non-qualifying rows are never ADC-scored and the rerank
    shortlist is drawn from qualifying rows only — top-k WHERE
    <predicate>, not post-filtered top-k."""
    import re

    emb = _embeddings(spark, sf_dir)
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    path = "/tmp/perlin_entry_ivfpq_" + re.sub(r"\W+", "_", sf_dir.rstrip("/"))
    if path not in _IVFPQ_WRITTEN:
        similarity.write_ivf_pq_cells(emb, path, n_centroids=IVF_CENTROIDS)
        _IVFPQ_WRITTEN.add(path)
    return similarity.ivf_pq_topk_from_cells(
        spark, path, qv, k=10, nprobe=IVF_NPROBE, rerank=IVFPQ_RERANK,
        exclude_id=0, predicate=F.col("vec_id") % ANN_FILTER_MOD != 0,
    )


IVFPQ_KMEANS_NPROBE = 10  # pruning still real (10 of 16 cells)
IVFPQ_KMEANS_RERANK = 200


def q_ann_ivf_pq_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DOCUMENTED DEFAULT ANN build (r4 verdict item 7):
    ``build_ann_index`` trains k-means-refined centroids AND codebooks
    (not the SQL-derivable low-id seeds), writes the composed
    cell-partitioned layout, and the query reopens it COLD.  k-means
    training is iterative and not reasonably SQL-expressible, so the
    oracle is the strongest statement available: EXACT brute-force
    cosine top-k.  At these pinned settings (nprobe=10 of 16 cells,
    rerank=200 on a few-hundred-vector sf0.01 corpus) the ADC shortlist
    must contain the true top-10, so the served result equals ground
    truth — gating encode, cell assignment, pruned scan, ADC, and
    rerank of the default build end-to-end.  A recall miss here is a
    real defect, not oracle noise (guarded by
    ``tests/test_extras.py::test_kmeans_build_exact_at_oracle_settings``)."""
    import re

    emb = _embeddings(spark, sf_dir)
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    path = "/tmp/perlin_entry_ivfpq_km_" + re.sub(r"\W+", "_", sf_dir.rstrip("/"))
    if path not in _IVFPQ_WRITTEN:
        similarity.build_ann_index(emb, path, n_centroids=IVF_CENTROIDS)
        _IVFPQ_WRITTEN.add(path)
    return similarity.ivf_pq_topk_from_cells(
        spark, path, qv, k=10, nprobe=IVFPQ_KMEANS_NPROBE,
        rerank=IVFPQ_KMEANS_RERANK, exclude_id=0,
    )


def q_hierarchy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy-expanded search (r3 verdict item 3): the seed plus all
    taxonomy descendants via the distributed DataFrame BFS
    (``Hierarchy.expand_terms``), then ONE Any-combinator BM25 query over
    the expanded set — the reference's query-expansion intent
    (``/root/reference/src/field/hierarchy.rs:5-42``).  The oracle
    repeats the expansion with a recursive CTE, so both the BFS and the
    scoring are hash-gated end-to-end."""
    from perlin_spark.hierarchy import HIERARCHY_SCHEMA, Hierarchy

    eng = _engine(spark, sf_dir)
    hdf = spark.createDataFrame(HIERARCHY_ROWS, HIERARCHY_SCHEMA)
    exp = Hierarchy.expand_terms(hdf, [HIERARCHY_SEED])
    expanded = sorted(r["term"] for r in exp.collect())
    exp.unpersist()  # expand_terms returns its result persisted
    pl = QueryPipeline(text_spec=DOC_SPEC, text_combinator="any")
    return _score_x1e4(eng.search(" ".join(expanded), k=10, pipeline=pl))


PREFIX_QUERY = "s"       # expands to 6 vocabulary terms at sf0.01
FUZZY_QUERY = "gro"      # -> {row, group} at max_edits=2 (the multi-term
FUZZY_EDITS = 2          #    spelling-correction case)


def q_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix search: vocabulary expansion (df desc, term asc, capped)
    -> one Any-combinator BM25 query."""
    return _score_x1e4(
        _engine(spark, sf_dir).search_prefix(PREFIX_QUERY, k=10, field="text")
    )


def q_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy search: length-banded Levenshtein vocabulary expansion
    (dist asc, df desc, term asc, capped) -> one Any-combinator BM25
    query."""
    return _score_x1e4(
        _engine(spark, sf_dir).search_fuzzy(
            FUZZY_QUERY, k=10, field="text", max_edits=FUZZY_EDITS
        )
    )


WILDCARD_QUERY = "s?a*"  # -> {scan, small, spark} at sf0.01 (probed) —
                         # exercises both glob wildcards in one pattern


def q_wildcard_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard search: */? glob -> LIKE predicate on the vocabulary
    (df desc, term asc, capped) -> one Any-combinator BM25 query."""
    return _score_x1e4(
        _engine(spark, sf_dir).search_wildcard(WILDCARD_QUERY, k=10, field="text")
    )


PHRASE_QUERY = "merge sort"   # 32 adjacency hits at sf0.01 (probed)
FACET_QUERY = "scan"          # df 398 at sf0.01 — a wide match set
FACET_BY = "source"


DELETED_IDS = [292, 59]   # the ft_bm25_and_topk top-2 at sf0.01 — the
                          # tombstone gate must visibly refill the top-k


def q_bm25_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time tombstones (Lucene live-docs semantics): the AND query
    with its top-2 docs deleted — excluded from candidacy in the scorer
    closure, survivors keep their as-built (stale-stats) scores, top-k
    refills.  A fresh engine key: tombstones are installed on THIS
    handle only."""
    key = f"del:{sf_dir}"
    eng = _ENGINES.get(key)
    if eng is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        eng = PerlinEngine.build(
            spark, docs, [DOC_SPEC],
            pipeline=QueryPipeline(text_spec=DOC_SPEC), n_shards=4,
        ).cache()
        eng.index.set_deleted(
            spark.createDataFrame([(i,) for i in DELETED_IDS], "doc_id long")
        )
        _ENGINES[key] = eng
    return _score_x1e4(eng.search("hash join", k=10))


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search: conjunctive index candidates, adjacency verified on
    candidates only via the build-time Arrow analyzer, conj-BM25 ranks."""
    return _score_x1e4(_engine(spark, sf_dir).search_phrase(PHRASE_QUERY, k=10))


NEAR_QUERY = "hash join"   # at sf0.01 w=3: 322 AND-candidates -> 144
NEAR_WINDOW = 3            # unordered / 77 ordered (probed — discriminating)


def q_near_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity (span-near) search over the positional sidecar, BOTH
    modes in one gate: top-10 of the unordered (any-order witness within
    the window) and ordered (strictly increasing slot chain) variants,
    tagged by a mode column.  Scores are the conjunctive BM25 the phrase
    contract uses."""
    eng = _engine(spark, sf_dir)
    u = _score_x1e4(eng.search_near(NEAR_QUERY, NEAR_WINDOW, k=10)).withColumn(
        "mode", F.lit("unordered")
    )
    o = _score_x1e4(
        eng.search_near(NEAR_QUERY, NEAR_WINDOW, k=10, ordered=True)
    ).withColumn("mode", F.lit("ordered"))
    return u.unionAll(o)


MLT_DOC_ID = 7
MLT_MAX_TERMS = 5


def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar docs to a seed doc: its top tf*idf terms as an Any-BM25
    query, seed excluded."""
    return _score_x1e4(
        _engine(spark, sf_dir).more_like_this(MLT_DOC_ID, k=10, max_terms=MLT_MAX_TERMS)
    )


def q_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-engine faceting: matching-doc counts per source over the
    full match set of one term query."""
    return _engine(spark, sf_dir).facet_counts(FACET_QUERY, by=FACET_BY)


def q_facet_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality sub-aggregation, exact mode: per lang bucket of the
    FACET_QUERY match set, the number of matching docs and of DISTINCT
    sources.  (The approx=True HLL++ path is pytest-gated against this
    exact path in test_facet_cardinality_exact_and_approx.)"""
    return _engine(spark, sf_dir).facet_cardinality(
        FACET_QUERY, by="lang", value=FACET_BY
    )


def q_facet_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation: first two keyset pages (size 4) of the
    (lang, source) bucket set of the FACET_QUERY match set, tagged by
    page.  Page 2 resumes from page 1's last key via ``after`` — the
    export-all-buckets shape; the page-1/page-2 split gates the
    lexicographic after-key predicate itself."""
    eng = _engine(spark, sf_dir)
    by = ["lang", FACET_BY]
    p1 = eng.facet_composite(FACET_QUERY, by=by, size=4)
    last = p1.collect()[-1]
    p2 = eng.facet_composite(
        FACET_QUERY, by=by, size=4, after=(last["lang"], last[FACET_BY])
    )

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("page"), "lang", FACET_BY, "n_docs"
        )

    return tag(p1, "p1").unionAll(tag(p2, "p2"))


def q_parent_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_child over the source->document parent axis, BOTH score
    compositions in one gate: sum (with the min_children=2 floor) and
    max, tagged by mode.  Parents ranked by folded child BM25."""
    eng = _engine(spark, sf_dir)

    def shape(df, mode):
        return df.select(
            F.lit(mode).alias("mode"),
            F.col(FACET_BY).alias("parent"),
            F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("long").alias("score_x1e4"),
            "n_children",
        )

    s = shape(
        eng.search_parents(FACET_QUERY, child_key=FACET_BY, k=10,
                           score_mode="sum", min_children=2),
        "sum",
    )
    m = shape(
        eng.search_parents(FACET_QUERY, child_key=FACET_BY, k=10,
                           score_mode="max"),
        "max",
    )
    return s.unionByName(m)


def q_collapse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field collapsing, BOTH physical paths in one gate: top-10 of the
    FACET_QUERY match set keeping the best 1 (max_by aggregate path) and
    best 2 (row_number window path) docs per source, tagged by mode."""
    eng = _engine(spark, sf_dir)

    def shape(df, mode):
        return df.select(
            F.lit(mode).alias("mode"),
            "doc_id",
            F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("long").alias("score_x1e4"),
            FACET_BY,
        )

    one = shape(eng.search_collapse(FACET_QUERY, by=FACET_BY, k=10), "agg1")
    two = shape(
        eng.search_collapse(FACET_QUERY, by=FACET_BY, k=10, per_group=2), "win2"
    )
    return one.unionAll(two)


SIGNIFICANT_K = 20

TV_DOC_IDS = [3, 7, 11, 19]   # pinned for the term-vectors oracle
HIST_INTERVAL = 50            # n_chars bucket width for the histogram gate


def q_facet_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation: FACET_QUERY match set bucketed by
    floor(n_chars/50)*50."""
    return _engine(spark, sf_dir).facet_histogram(
        FACET_QUERY, value="n_chars", interval=HIST_INTERVAL
    )


def q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term-vectors: per-doc tf for four pinned docs, re-analyzed
    candidates-only (never a postings decode)."""
    return _engine(spark, sf_dir).term_vectors(TV_DOC_IDS)

#: registered saved-search set for the percolator gate (query 3 is a
#: no-hit probe; query 4 is 4-term — the min_match=2 mode discriminates)
PERC_QUERIES = [
    (0, "hash join sort"),
    (1, "vector stream"),
    (2, "dup window merge"),
    (3, "zzzqqq"),
    (4, "scan filter batch spark"),
]


def q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search (Lucene/ES percolator): which registered queries
    match each document — conjunctive mode AND min_match=2 mode in one
    gate, tagged by a mode column."""
    from perlin_spark.percolate import percolate

    qs = spark.createDataFrame(PERC_QUERIES, "query_id long, query string")
    docs = _docs(spark, sf_dir)
    conj = percolate(qs, docs, DOC_SPEC).withColumn("mode", F.lit("all"))
    min2 = percolate(qs, docs, DOC_SPEC, min_match=2).withColumn(
        "mode", F.lit("min2")
    )
    return conj.unionAll(min2).select(
        "mode", "doc_id", "query_id", "n_matched", "n_terms"
    )


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant-terms (JLH) over the FACET_QUERY foreground:
    candidates-only re-analysis for fg_df, stored vocabulary for bg_df."""
    eng = _engine(spark, sf_dir)
    out = eng.significant_terms(FACET_QUERY, k=SIGNIFICANT_K)
    return out.select(
        "term", "fg_df", "bg_df",
        F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("long").alias("score_x1e4"),
    )


SNIPPET_TERMS = ["dup", "stream", "vector"]   # the ft_bm25_or query


def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highlighting: first query-term position (1-based, analyzed
    stream) + a ±3-token context snippet for each OR-query top-10 hit."""
    eng = _engine(spark, sf_dir)
    pl = QueryPipeline(text_spec=DOC_SPEC, text_combinator="any")
    out = eng.snippets(" ".join(SNIPPET_TERMS), k=10, pipeline=pl)
    return out.select(
        "doc_id",
        F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("long").alias("score_x1e4"),
        "pos",
        "snippet",
    )


SUBSTRING_NEEDLE = "ream merge"   # spans a token boundary ('stREAM MERGE')
REGEX_PATTERN = "stream [a-z]+ [a-z]+ merge"   # literal runs: 'stream ', ' merge'


def _tri_engine(spark: SparkSession, sf_dir: str) -> PerlinEngine:
    """Documents index + the trigram sidecar FIELD (tokenizer='trigram') —
    substring/regex search (perlin_spark.trigram, Cox's trigram index)."""
    key = f"tri:{sf_dir}"
    eng = _ENGINES.get(key)
    if eng is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        specs = [
            DOC_SPEC,
            FieldSpec(field="tri3", source="text", tokenizer="trigram",
                      lowercase=False),
        ]
        eng = PerlinEngine.build(
            spark, docs, specs,
            pipeline=QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"),
            content_col="text", n_shards=4,
        ).cache()
        _ENGINES[key] = eng
    return eng


def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grep-for-a-fixed-string over raw content: AND over the needle's
    rarest trigrams (stock conjunctive match set on the trigram field),
    then contains() verification on candidate rows only.  The needle
    crosses a token boundary, so no term-level query can fake this."""
    return _tri_engine(spark, sf_dir).search_substring(SUBSTRING_NEEDLE)


def q_regex_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex search, trigram-pruned via the pattern's mandatory literal
    runs (conservative Cox analysis), rlike-verified on candidates."""
    return _tri_engine(spark, sf_dir).search_regex(REGEX_PATTERN)


SUGGEST_QUERY = "streem windoq merge"   # two misspellings + one exact term
SUGGEST_K = 3

#: 'slow' is a real corpus term (the alternate contributes candidacy and
#: score); 'quick' is absent (df 0 — must be a no-op, not an error)
SYNONYMS = {"fast": ("slow", "quick")}


def q_synonym_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time synonym expansion under the conjunctive combinator:
    'fast join' with fast->(slow|quick) = (fast|slow|quick) AND join,
    scores summing over matched alternates — the Lucene SynonymGraph
    shape as intersecting Any-groups."""
    return _score_x1e4(
        _engine(spark, sf_dir).search("fast join", k=10, synonyms=SYNONYMS)
    )


def q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did-you-mean: per-token top-k corrections (dist asc, df desc, term
    asc) via ONE SymSpell-probed job; exact tokens surface as dist-0."""
    return _engine(spark, sf_dir).suggest(SUGGEST_QUERY, k=SUGGEST_K)


def _suggest_oracle() -> str:
    toks = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(SUGGEST_QUERY.split())
    )
    return f"""
WITH {_TOK},
qt AS (SELECT * FROM (VALUES {toks}) AS t(token_pos, token)),
v AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tfv GROUP BY 1),
cand AS (
  SELECT q.token_pos::INT AS token_pos, q.token, v.term, v.df,
         levenshtein(v.term, q.token)::INT AS dist
  FROM v CROSS JOIN qt q
  WHERE levenshtein(v.term, q.token) <= 2)
SELECT token_pos, token, term, df, dist
FROM cand
QUALIFY row_number() OVER (
  PARTITION BY token_pos ORDER BY dist, df DESC, term) <= {SUGGEST_K}
ORDER BY token_pos, dist, df DESC, term
"""


def q_facet_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric sub-aggregation per facet bucket (ES terms-agg + stats):
    n_chars stats per source over the full one-term match set."""
    eng = _engine(spark, sf_dir)
    out = eng.facet_stats(FACET_QUERY, by=FACET_BY, value="n_chars")
    return out.select(
        FACET_BY, "n_docs", "min_value", "max_value",
        F.floor(F.col("avg_value") * 10000 + F.lit(0.5)).cast("long").alias("avg_x1e4"),
        "sum_value",
    )


QSTRING = "dup +stream -vector"   # scored term + Must + MustNot clauses


def q_query_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The query-string mini-language (perlin_spark.qparser): one string
    carrying a scored term, a +must and a -not clause, assembled into
    the same ops the dedicated operators execute."""
    eng = _engine(spark, sf_dir)
    pl = QueryPipeline(text_spec=DOC_SPEC, text_combinator="any")
    return _score_x1e4(eng.query(QSTRING, k=10, pipeline=pl))


BOOSTS = {"stream": 2.5}


def q_boosted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term score boosts (Lucene term^w): the OR query with one term's
    contribution scaled 2.5x — candidacy untouched, ranking re-weighted."""
    eng = _engine(spark, sf_dir)
    pl = QueryPipeline(text_spec=DOC_SPEC, text_combinator="any")
    return _score_x1e4(
        eng.search("dup stream vector", k=10, pipeline=pl, boosts=BOOSTS)
    )


def q_min_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-should-match (the ES dial between OR and AND): the 3-term
    disjunction tightened to >= 2 distinct matching terms — a NEW
    candidacy branch in the scorer (per-doc distinct-term counting),
    scores still summing over all matched terms."""
    eng = _engine(spark, sf_dir)
    pl = QueryPipeline(text_spec=DOC_SPEC, text_combinator="any")
    return _score_x1e4(
        eng.search("dup stream vector", k=10, pipeline=pl, min_match=2)
    )


def q_sorted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-by-stored-field: the conjunctive match set ordered by the
    docs-table n_chars column (desc, doc_id tiebreak) — Lucene's
    sort-by-field, as match-set join + TakeOrdered."""
    return _engine(spark, sf_dir).search_sorted("hash join", by="n_chars", k=10)


def q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score (field_value_factor): BM25 of the conjunctive
    match set multiplied by ln(1 + n_chars) — relevance blended with a
    stored popularity/length signal, one docs join + TakeOrdered."""
    out = _engine(spark, sf_dir).search_function_score(
        "hash join", field="n_chars", k=10,
        factor=1.0, modifier="log1p", boost_mode="multiply",
    )
    return _score_x1e4(out)


RESCORE_WINDOW = 30


def q_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rescore window: top-30 of conjunctive 'hash join' re-scored by
    conjunctive 'sort merge' at weight 2 — the second query runs as the
    same single-stage scorer with the window ids as an inclusion filter
    (the tombstone machinery's twin), so out-of-window docs cost nothing."""
    out = _engine(spark, sf_dir).search_rescore(
        "hash join", "sort merge", k=10, window=RESCORE_WINDOW,
        query_weight=1.0, rescore_weight=2.0,
    )
    return _score_x1e4(out)


def q_facet_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles sub-aggregation per facet bucket (the ES
    percentiles agg with percentile_cont interpolation semantics)."""
    eng = _engine(spark, sf_dir)
    out = eng.facet_percentiles(
        FACET_QUERY, by=FACET_BY, value="n_chars", percentiles=(0.5, 0.95)
    )
    return out.select(
        FACET_BY,
        "n_docs",
        F.floor(F.col("p50_value") * 10000 + F.lit(0.5)).cast("long").alias("p50_x1e4"),
        F.floor(F.col("p95_value") * 10000 + F.lit(0.5)).cast("long").alias("p95_x1e4"),
    )


def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document tf-idf keyword extraction over the committed index:
    idf broadcast onto compressed postings, one Arrow decode pass, per-doc
    row_number top-3 (score desc, term asc)."""
    out = _engine(spark, sf_dir).keywords(k_per_doc=3)
    return out.select(
        "doc_id",
        "term",
        "tf",
        F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("long").alias("score_x1e4"),
    )


PAGE_K = 5


def q_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep pagination (search_after cursor): serve page 1 (k=5) of the
    OR query, feed its last served (score, doc_id) back as the cursor,
    return page 2.  Shard heaps stay size k at ANY page depth — an
    OFFSET plan would buffer offset+k rows per shard — so the oracle is
    the same full ranking with LIMIT 5 OFFSET 5.  Gates the cursor mask
    in both scorer paths plus the θ-seed cursor filter (query.py)."""
    eng = _engine(spark, sf_dir)
    pl = QueryPipeline(text_spec=DOC_SPEC, text_combinator="any")
    q = " ".join(SNIPPET_TERMS)
    p1 = eng.search(q, k=PAGE_K, pipeline=pl).collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    return _score_x1e4(eng.search(q, k=PAGE_K, pipeline=pl, after=cursor))


def _engine_dl_fallback(spark: SparkSession, sf_dir: str) -> PerlinEngine:
    """Same documents index as :func:`_engine`, but with the doc-length
    broadcast cap forced to 0 on THIS instance, so every search takes the
    broadcast-free (field, shard) equi-join path (query.py fallback)."""
    key = f"dlfb:{sf_dir}"
    eng = _ENGINES.get(key)
    if eng is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        eng = PerlinEngine.build(
            spark,
            docs,
            [DOC_SPEC],
            pipeline=QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"),
            content_col="text",
            n_shards=4,
        ).cache()
        eng.index.DL_BROADCAST_MAX = 0  # instance attr shadows the class cap
        _ENGINES[key] = eng
    return eng


def q_bm25_and_dl_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The over-cap doc-length path end-to-end (r3 verdict item 4):
    identical query and oracle as ``ft_bm25_and_topk``, but served by an
    index whose dl blobs exceed the (forced-to-0) broadcast cap — the
    scorer must produce identical scores through the join fallback."""
    return _score_x1e4(_engine_dl_fallback(spark, sf_dir).search("hash join", k=10))


def _engine_resharded(spark: SparkSession, sf_dir: str) -> PerlinEngine:
    """Build at n_shards=5, then reshard_index to 3 — chunk changes, so
    posting blobs genuinely split/merge across the new range boundaries
    (the pass-through fast path alone would be an empty gate)."""
    key = f"reshard:{sf_dir}"
    eng = _ENGINES.get(key)
    if eng is None:
        from perlin_spark.build import reshard_index

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        eng0 = PerlinEngine.build(
            spark,
            docs,
            [DOC_SPEC],
            pipeline=QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"),
            content_col="text",
            n_shards=5,
        )
        eng = PerlinEngine(
            index=reshard_index(eng0.index, 3), pipeline=eng0.pipeline
        ).cache()
        _ENGINES[key] = eng
    return eng


def q_bm25_resharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-count migration end-to-end: the index is REBUILT at a
    different geometry purely by posting-blob surgery (reshard_index),
    and BM25 over it must still equal the from-text oracle exactly —
    scores, ranks, and ties."""
    return _score_x1e4(_engine_resharded(spark, sf_dir).search("merge scan", k=10))


BATCH_QUERIES = {"hj": "hash join", "ms": "merge sort"}


def q_batch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval (search_many): two conjunctive queries scored in
    ONE Spark job — one postings scan over the union of terms, per-query
    shard-local top-k, window head.  The offline hard-negative-mining /
    decontamination shape."""
    out = _engine(spark, sf_dir).search_many(BATCH_QUERIES, k=10)
    return out.select(
        "query_id", "doc_id",
        F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("long").alias("score_x1e4"),
    )


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pluggable classic TF-IDF similarity (idf^2 * sqrt(tf) /
    sqrt(dl)) on the shared documents index: similarity is a runtime
    handle attribute, so the same cached index serves both rankings —
    dataclasses.replace shares every frame/cache, only the scorer
    closure changes."""
    import dataclasses

    base = _engine(spark, sf_dir)
    eng = PerlinEngine(
        dataclasses.replace(base.index, similarity="tfidf"), base.pipeline
    )
    return _score_x1e4(eng.search("hash join", k=10))


def q_lmdir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pluggable LM-Dirichlet similarity (Lucene LMDirichletSimilarity
    shape, mu=2000): per-term max(0, ln(1 + tf/(mu*p(t|C))) +
    ln(mu/(dl+mu))) with p(t|C) = cttf/total_terms from the driver-cached
    collection-frequency lookup."""
    import dataclasses

    base = _engine(spark, sf_dir)
    eng = PerlinEngine(
        dataclasses.replace(base.index, similarity="lmdir"), base.pipeline
    )
    return _score_x1e4(eng.search("hash join", k=10))


def q_golden_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own golden queries end-to-end (stemmed, number-routed
    pipeline over the 3-doc corpus): (query_id, doc_id) match matrix."""
    from perlin_spark.analysis import reference_specs
    from perlin_spark.fixtures import GOLDEN_QUERIES, golden_corpus

    eng = PerlinEngine.build(
        spark, golden_corpus(spark), reference_specs(), n_shards=2, block_size=4
    )
    pl_a = QueryPipeline(
        text_spec=FieldSpec(field="text", source="text", stem=True, number_field="number"),
        text_combinator="all",
        number_combinator="any",
    )
    pl_b = QueryPipeline(
        text_spec=FieldSpec(field="title", source="text", stem=True, number_field="number"),
        text_combinator="any",
        number_combinator="any",
    )
    rows = []
    for qid, (pipeline, qstr, expected, gating) in enumerate(GOLDEN_QUERIES):
        pl = pl_b if pipeline == "B" else pl_a
        got = [r["doc_id"] for r in eng.search(qstr, k=10, pipeline=pl).collect()]
        want = expected if gating else got
        rows.append((qid, qstr, got == want, ",".join(map(str, got))))
    schema = "query_id long, query string, matches boolean, doc_ids string"
    return spark.createDataFrame(rows, schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_bm25_and(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness harness records exactly the
    # FIRST 50 entries in insertion order.  Positions 1-50 are the operator
    # gates (one per distinct code path); entries after position 50 are
    # intentionally rotated out — each is a near-twin of an in-cap gate and
    # its consolidation argument + last driver-green round is documented in
    # FIXTURES.md ("Oracle registry rotation").  Do not append new entries
    # at the end: insert them inside the cap and rotate a documented twin.
    return {
        # -- reference-surface gates (SURVEY §2) ---------------------------
        "golden_reference_suite": q_golden_reference,
        "ft_postings_flat": q_postings_flat,
        "ft_vocabulary": q_vocabulary,
        "ft_doc_stats": q_doc_stats,
        "ft_bm25_and_topk": q_bm25_and,
        "ft_bm25_mixed_roles": q_bm25_mixed_roles,
        "ft_lmdir_topk": q_lmdir_topk,
        "ft_batch_search": q_batch_search,
        "ft_bm25_and_dl_fallback": q_bm25_and_dl_fallback,
        "ft_bm25_resharded": q_bm25_resharded,
        "ft_hierarchy_search": q_hierarchy_search,
        # -- code-corpus gates (AlphaNumericTokenizer + u64 router) --------
        "ft_code_ident_bm25": q_code_ident_bm25,
        "ft_code_vocabulary": q_code_vocabulary,
        "ft_code_bm25_topk": q_code_bm25,
        "ft_code_must_number": q_code_must_number,
        "ft_range_filter": q_range_filter,
        "ft_fielded_bm25": q_fielded_bm25,
        # -- search features ------------------------------------------------
        "ft_fuzzy_search": q_fuzzy_search,
        "ft_function_score": q_function_score,
        "ft_phrase_search": q_phrase_search,
        "ft_substring_search": q_substring_search,
        "ft_more_like_this": q_more_like_this,
        "ft_snippets": q_snippets,
        "ft_bm25_deleted": q_bm25_deleted,
        "ft_collapse_search": q_collapse_search,
        "ft_parent_child": q_parent_child,
        "ft_significant_terms": q_significant_terms,
        "ft_percolate": q_percolate,
        "ft_facet_cardinality": q_facet_cardinality,
        # -- dedup ----------------------------------------------------------
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_minhash_lsh,
        "dedup_simhash_near": q_simhash_near,
        "dedup_components": q_dedup_components,
        "dedup_substring_spans": q_dedup_substring,
        "dedup_embedding_lsh": q_emb_pairs_lsh,
        # -- ANN ------------------------------------------------------------
        "ann_ivf_pq_topk": q_ann_ivf_pq,
        "ft_rescore": q_rescore,
        "ann_ivf_pq_kmeans": q_ann_ivf_pq_kmeans,
        "ann_sq_topk": q_ann_sq,
        # -- pretraining text ops -------------------------------------------
        "text_quality": q_text_quality,
        "text_langid": q_langid,
        "text_unigram_logprob": q_unigram_logprob,
        "text_subword_counts": q_subword_counts,
        "text_repetition": q_repetition,
        "text_decontaminate": q_decontaminate,
        "text_pack_sequences": q_pack_sequences,
        "text_segment_dedup": q_segment_dedup,
        "text_redact_pii": q_redact_pii,
        "text_mixture_sample": q_mixture_sample,
        # -- events ----------------------------------------------------------
        "events_sessions": q_events_sessions,
        # ==== cap boundary: entries below are ROTATED OUT (see FIXTURES.md) =
        "search_hybrid_rrf": q_hybrid_rrf,
        "ft_facet_composite": q_facet_composite,
        "ft_frequent_terms": q_frequent_terms,
        "ft_tfidf_topk": q_tfidf_topk,
        "text_fingerprint": q_fingerprint,
        "ft_min_match": q_min_match,
        "ft_search_after": q_search_after,
        "ft_wildcard_search": q_wildcard_search,
        "ann_ivf_pq_filtered": q_ann_ivf_pq_filtered,
        "ft_facet_percentiles": q_facet_percentiles,
        "text_keywords": q_text_keywords,
        "dedup_simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine,
        "dedup_incremental": q_dedup_incremental,
        "ft_facet_histogram": q_facet_histogram,
        "ft_term_vectors": q_term_vectors,
        "events_windowed_stats": q_events_windowed,
        "events_date_histogram": q_events_date_histogram,
        "ft_regex_search": q_regex_search,
        "ft_suggest": q_suggest,
        "ft_synonym_search": q_synonym_search,
        "ft_sorted_search": q_sorted_search,
        "ft_boosted_search": q_boosted_search,
        "ft_facet_stats": q_facet_stats,
        "ft_query_language": q_query_language,
        "ft_facet_counts": q_facet_counts,
        "ft_must_filter": q_must_filter,
        "ft_near_search": q_near_search,
        "text_chunk_documents": q_chunk_documents,
        "ft_prefix_search": q_prefix_search,
        "events_props_stats": q_events_props,
        "ann_ivf_topk": q_ann_ivf,
        "ft_boolean_and_set": q_boolean_and_set,
        "ft_must_not": q_must_not,
        "ft_bm25_or_topk": q_bm25_or,
        "ann_lsh_topk": q_ann_lsh,
        "ft_bm25_may": q_bm25_may,
        "dedup_survivors": q_dedup_survivors,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_embedding_exact": q_emb_pairs_exact,
        "ann_pq_topk": q_ann_pq,
        "text_filter_corpus": q_filter_corpus,
        "text_sample": q_sample,
        "text_contamination": q_contamination,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# shared n-gram Jaccard pair CTEs (threshold applied by the consumer):
# MUST match extras.dedup.shingles_df / ngram_jaccard_pairs
_NGRAM_PAIR_CTES = """tokarr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, sh FROM tokarr, unnest(
    CASE WHEN len(toks) >= 3
         THEN list_transform(generate_series(1, len(toks) - 2),
                             i -> array_to_string(toks[i:i+2], ' '))
         ELSE [array_to_string(toks, ' ')] END) AS u(sh)),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
jacc AS (
  SELECT doc_a, doc_b, i::DOUBLE / (sa.sz + sb.sz - i) AS j
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b)"""

# shared tokenization CTEs: MUST match FieldSpec(text, whitespace, lowercase)
_TOK = """
tok AS (
  SELECT doc_id, lower(t.tok) AS term
  FROM documents, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS t(tok)
),
tfv AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dlv AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
stv AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
               (SELECT avg(dl) FROM dlv)::DOUBLE AS avgdl)
"""


def _bm25_oracle(terms: list[str], conj: bool, k: int = 10,
                 must: list[str] | None = None, must_not: list[str] | None = None,
                 may: list[str] | None = None,
                 exclude_ids: list[int] | None = None,
                 offset: int = 0) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    # May terms score (same BM25 formula) but never gate candidacy
    slist = ", ".join(f"'{t}'" for t in sorted(set(terms) | set(may or [])))
    having = (
        "HAVING count(DISTINCT term) = (SELECT count(DISTINCT term) FROM qt)" if conj else ""
    )
    must_sql = ""
    if must:
        mlist = ", ".join(f"'{t}'" for t in must)
        must_sql += f"""
  AND doc_id IN (SELECT doc_id FROM tfv WHERE term IN ({mlist})
                 GROUP BY doc_id HAVING count(DISTINCT term) = {len(set(must))})"""
    if must_not:
        nlist = ", ".join(f"'{t}'" for t in must_not)
        must_sql += f"""
  AND doc_id NOT IN (SELECT doc_id FROM tfv WHERE term IN ({nlist}))"""
    excl_sql = ""
    if exclude_ids:
        excl_sql = f"\n  AND doc_id NOT IN ({', '.join(str(i) for i in exclude_ids)})"
    return f"""
WITH {_TOK},
qt AS (SELECT unnest([{tlist}]) AS term),
qs AS (SELECT unnest([{slist}]) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qs USING (term) GROUP BY 1),
cand AS (SELECT doc_id FROM tfv JOIN qt USING (term) GROUP BY doc_id {having}),
cand2 AS (SELECT doc_id FROM cand WHERE TRUE {must_sql}{excl_sql}),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand2)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}{f" OFFSET {offset}" if offset else ""}
"""


def _facet_stats_oracle() -> str:
    """Twin of q_facet_stats: per-bucket numeric stats over the match set."""
    return f"""
WITH {_TOK},
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term = '{FACET_QUERY}')
SELECT d.{FACET_BY} AS {FACET_BY}, count(*)::BIGINT AS n_docs,
       min(d.n_chars) AS min_value, max(d.n_chars) AS max_value,
       CAST(floor(avg(d.n_chars) * 10000 + 0.5) AS BIGINT) AS avg_x1e4,
       sum(d.n_chars)::BIGINT AS sum_value
FROM documents d JOIN cand USING (doc_id)
GROUP BY 1 ORDER BY n_docs DESC, {FACET_BY}"""


def _bm25_groups_oracle(groups: list[list[str]], k: int = 10,
                        mins: list[int] | None = None) -> str:
    """BM25 over intersecting Any-groups (the synonym-expansion and
    minimum-should-match shapes): candidacy = docs matching >= mins[i]
    DISTINCT terms of EVERY group i (default 1); score = sum over all
    matched group terms (each term weighted by its own idf)."""
    mins = mins or [1] * len(groups)
    union = sorted({t for g in groups for t in g})
    ulist = ", ".join(f"'{t}'" for t in union)
    having = " AND ".join(
        "count(DISTINCT CASE WHEN term IN ({0}) THEN term END) >= {1}".format(
            ", ".join(f"'{t}'" for t in g), m
        )
        for g, m in zip(groups, mins)
    )
    return f"""
WITH {_TOK},
qs AS (SELECT unnest([{ulist}]) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qs USING (term) GROUP BY 1),
cand AS (
  SELECT doc_id FROM tfv WHERE term IN ({ulist})
  GROUP BY doc_id HAVING {having}),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


# code-pipeline tokenization CTEs: MUST match CODE_DOC_SPEC (alphanumeric
# tokenizer via RE2 letter/number classes, lowercase, u64 canonical routing)
_TOK_CODE = r"""
ctok AS (
  SELECT doc_id, t.tok FROM documents,
       unnest(regexp_extract_all(text || ' ' || doc_id || ' 0' || doc_id,
                                 '[\p{L}\p{N}]+')) AS t(tok)
),
crouted AS (
  SELECT doc_id,
         CASE WHEN is_num THEN 'number' ELSE 'content' END AS field,
         CASE WHEN is_num THEN canon ELSE lower(tok) END AS term
  FROM (
    SELECT doc_id, tok,
           coalesce(nullif(ltrim(tok, '0'), ''), '0') AS canon,
           regexp_full_match(tok, '[0-9]+')
             AND (length(ltrim(tok, '0')) < 20
                  OR (length(ltrim(tok, '0')) = 20
                      AND ltrim(tok, '0') <= '18446744073709551615')) AS is_num
    FROM ctok)
),
ctf AS (SELECT doc_id, field, term, count(*)::BIGINT AS tf FROM crouted GROUP BY 1,2,3),
cdl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM ctf WHERE field = 'content' GROUP BY 1),
cst AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
               (SELECT avg(dl) FROM cdl)::DOUBLE AS avgdl)
"""


def _fielded_oracle(terms: list[str], k: int = 10) -> str:
    """Replicates q_fielded_bm25: per-field tokenize (text + its first-120
    chars 'head'), per-field df/idf/avgdl, boosted contributions summed —
    candidacy is ANY (field, term) match."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    tb, hb = FIELDED_BOOSTS["text"], FIELDED_BOOSTS["head"]
    return f"""
WITH docs2 AS (SELECT doc_id, text, substr(text, 1, 120) AS head FROM documents),
ttok AS (SELECT doc_id, lower(t.tok) AS term
         FROM docs2, unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS t(tok)),
htok AS (SELECT doc_id, lower(t.tok) AS term
         FROM docs2, unnest(list_filter(regexp_split_to_array(head, '\\s+'), x -> x <> '')) AS t(tok)),
ttf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM ttok GROUP BY 1, 2),
htf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM htok GROUP BY 1, 2),
tdl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM ttok GROUP BY 1),
hdl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM htok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
              (SELECT avg(dl) FROM tdl)::DOUBLE AS t_avgdl,
              (SELECT avg(dl) FROM hdl)::DOUBLE AS h_avgdl),
qt AS (SELECT unnest([{tlist}]) AS term),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM ttf JOIN qt USING (term) GROUP BY 1),
hdf AS (SELECT term, count(*)::BIGINT AS df FROM htf JOIN qt USING (term) GROUP BY 1),
tsc AS (SELECT m.doc_id,
               sum({tb} * ln(1 + ((SELECT n FROM st) - q.df + 0.5) / (q.df + 0.5))
                   * m.tf * 2.2
                   / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT t_avgdl FROM st)))) AS s
        FROM ttf m JOIN tdf q USING (term) JOIN tdl d USING (doc_id) GROUP BY 1),
hsc AS (SELECT m.doc_id,
               sum({hb} * ln(1 + ((SELECT n FROM st) - q.df + 0.5) / (q.df + 0.5))
                   * m.tf * 2.2
                   / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT h_avgdl FROM st)))) AS s
        FROM htf m JOIN hdf q USING (term) JOIN hdl d USING (doc_id) GROUP BY 1),
allsc AS (SELECT doc_id, sum(s) AS score
          FROM (SELECT * FROM tsc UNION ALL SELECT * FROM hsc) GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM allsc ORDER BY score DESC, doc_id LIMIT {k}
"""


def _bm25_code_oracle(terms: list[str], k: int = 10,
                      must_number: str | None = None,
                      must_range: tuple[int, int] | None = None) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    must_sql = ""
    if must_number is not None:
        must_sql = f"""
  AND doc_id IN (SELECT doc_id FROM ctf WHERE field = 'number' AND term = '{must_number}')"""
    if must_range is not None:
        lo, hi = must_range
        must_sql += f"""
  AND doc_id IN (SELECT doc_id FROM ctf WHERE field = 'number'
                 AND TRY_CAST(term AS UBIGINT) BETWEEN {lo} AND {hi})"""
    return f"""
WITH {_TOK_CODE},
qt AS (SELECT unnest([{tlist}]) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df
        FROM ctf JOIN qt USING (term) WHERE field = 'content' GROUP BY 1),
cand AS (SELECT doc_id FROM ctf JOIN qt USING (term) WHERE field = 'content'
         GROUP BY doc_id HAVING count(DISTINCT term) = (SELECT count(DISTINCT term) FROM qt)),
cand2 AS (SELECT doc_id FROM cand WHERE TRUE {must_sql}),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM cst) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM cst)))) AS score
  FROM ctf m JOIN qdf q USING (term) JOIN cdl d USING (doc_id)
  WHERE m.field = 'content' AND m.doc_id IN (SELECT doc_id FROM cand2)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


def _ident_bm25_oracle(k: int = 10) -> str:
    """Replicates q_code_ident_bm25: the SAME two camel-boundary regexes
    as analysis._split_arrow('code') run in DuckDB (both are RE2), then
    alphanumeric extraction + lowercase; query 'readFileAsync' splits to
    [read, file, async], AND-combined, BM25-ranked."""
    return rf"""
WITH src AS (
  SELECT doc_id,
         'HTTPServer parseConfig ' ||
         CASE WHEN doc_id % 3 = 0 THEN 'readFileAsync ' ELSE '' END ||
         text AS content
  FROM documents),
itok AS (
  SELECT doc_id, lower(t.tok) AS term
  FROM src, unnest(regexp_extract_all(
         regexp_replace(
           regexp_replace(content, '([a-z0-9])([A-Z])', '\1 \2', 'g'),
           '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'),
         '[\p{{L}}\p{{N}}]+')) AS t(tok)),
itf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM itok GROUP BY 1, 2),
idl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM itf GROUP BY 1),
ist AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
               (SELECT avg(dl) FROM idl)::DOUBLE AS avgdl),
qt AS (SELECT unnest(['read', 'file', 'async']) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM itf JOIN qt USING (term) GROUP BY 1),
cand AS (SELECT doc_id FROM itf JOIN qt USING (term)
         GROUP BY doc_id HAVING count(DISTINCT term) = 3),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM ist) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM ist)))) AS score
  FROM itf m JOIN qdf q USING (term) JOIN idl d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}"""


def _ann_lsh_oracle(dim: int = 64, k: int = 10) -> str:
    """Replicates lsh_cosine_topk: the hyperplanes are seeded constants,
    inlined as literals; multiprobe = query bucket + hamming-1 neighbors."""
    planes = similarity._hyperplanes(dim, ANN_LSH_PLANES, similarity.LSH_SEED)

    def bucket_expr(col: str) -> str:
        parts = []
        for i in range(ANN_LSH_PLANES):
            lits = ", ".join(repr(float(x)) for x in planes[i])
            parts.append(
                f"(CASE WHEN list_inner_product({col}, [{lits}]) > 0 THEN {1 << i} ELSE 0 END)"
            )
        return " + ".join(parts)

    flips = ", ".join(f"({1 << i})" for i in range(ANN_LSH_PLANES))
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {bucket_expr("(SELECT qv FROM q)")} AS b),
probes AS (SELECT (SELECT b FROM qb) AS pb
           UNION ALL
           SELECT xor((SELECT b FROM qb), v) FROM (VALUES {flips}) t(v)),
be AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id <> 0),
bb AS (SELECT vec_id, e, {bucket_expr("e")} AS b FROM be),
c AS (SELECT vec_id, list_cosine_similarity(e, (SELECT qv FROM q)) AS cos
      FROM bb WHERE b IN (SELECT pb FROM probes))
SELECT vec_id, CAST(floor(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM c ORDER BY cos DESC, vec_id LIMIT {k}
"""


def _ann_ivf_oracle(k: int = 10) -> str:
    """Replicates ivf_topk: centroids are the vec_id < K rows of the SAME
    table (fully derivable in SQL — no inlined constants), assignment is
    the per-vector argmax (cos desc, cid asc), probes are the nprobe
    nearest centroids to the query, exact rescore inside probed cells."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {IVF_CENTROIDS}),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
asg AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY list_cosine_similarity(v, c) DESC, cid ASC) AS rn
  FROM e, cent),
cells AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
probes AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_cosine_similarity(c, (SELECT qv FROM q)) DESC, cid ASC) AS rn
    FROM cent) t
  WHERE rn <= {IVF_NPROBE}),
c AS (SELECT vec_id, list_cosine_similarity(v, (SELECT qv FROM q)) AS cos
      FROM cells WHERE cell IN (SELECT cid FROM probes) AND vec_id <> 0)
SELECT vec_id, CAST(floor(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM c ORDER BY cos DESC, vec_id LIMIT {k}"""


def _ann_pq_oracle(k: int = 10) -> str:
    """Replicates pq_topk with seeded codebooks: unit-normalize, slice
    into m subspaces, per-subspace nearest-centroid code (L2 asc, code
    asc — numpy argmin first-match), ADC = sum of per-subspace inner
    products between the normalized query slice and the coded centroid.
    Codebooks are the vec_id < ks rows of the SAME table, so nothing is
    inlined."""
    from perlin_spark.extras.similarity import PQ_KS, PQ_M

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
en AS (SELECT vec_id,
              list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS v
       FROM e),
q AS (SELECT v AS qv FROM en WHERE vec_id = 0),
ds AS (SELECT len(qv) // {PQ_M} AS d FROM q),
cb AS (
  SELECT s.i AS m, en.vec_id AS code,
         list_slice(en.v, s.i * (SELECT d FROM ds) + 1,
                    (s.i + 1) * (SELECT d FROM ds)) AS cent
  FROM en, unnest(generate_series(0, {PQ_M - 1})) AS s(i)
  WHERE en.vec_id < {PQ_KS}),
asg AS (
  SELECT en.vec_id, cb.m, cb.code,
         row_number() OVER (PARTITION BY en.vec_id, cb.m
           ORDER BY list_distance(
                      list_slice(en.v, cb.m * (SELECT d FROM ds) + 1,
                                 (cb.m + 1) * (SELECT d FROM ds)),
                      cb.cent) ASC, cb.code ASC) AS rn
  FROM en, cb),
codes AS (SELECT vec_id, m, code FROM asg WHERE rn = 1),
lut AS (SELECT cb.m, cb.code,
               list_inner_product(
                 list_slice((SELECT qv FROM q),
                            cb.m * (SELECT d FROM ds) + 1,
                            (cb.m + 1) * (SELECT d FROM ds)),
                 cb.cent) AS val
        FROM cb),
adc AS (SELECT c.vec_id, sum(l.val) AS s
        FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
        WHERE c.vec_id <> 0 GROUP BY 1)
SELECT vec_id, CAST(floor(s * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM adc ORDER BY s DESC, vec_id LIMIT {k}"""


def _ann_sq_oracle(k: int = 10) -> str:
    """Twin of q_ann_sq (similarity.sq_topk): the pinned int8 scalar
    quantizer — one global scale = max over rows of (max |x_i|/||x||)/127,
    code_i = clamp(floor(x_i/(||x||*scale) + 0.5), -127, 127) — then the
    integer-dot candidate pass cut at k*SQ_RERANK by (adot DESC, vec_id
    ASC), then EXACT cosine rerank of the survivors.  Every arithmetic
    step mirrors the Spark expression order (abs-max fold, sum-of-squares
    norm, x/(nrm*scale)) so the codes agree bit-for-bit."""
    from perlin_spark.extras.similarity import SQ_RERANK

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
sc AS (SELECT max(list_max(list_transform(v, x -> abs(x))) / nrm) / 127.0 AS s
       FROM n),
codes AS (
  SELECT vec_id,
         list_transform(v, x -> greatest(-127.0, least(127.0,
             floor(x / (nrm * sc.s) + 0.5)))) AS c
  FROM n, sc),
qc AS (SELECT c AS qcodes FROM codes WHERE vec_id = 0),
cand AS (SELECT vec_id FROM (
           SELECT vec_id, row_number() OVER (
             ORDER BY list_inner_product(c, (SELECT qcodes FROM qc)) DESC,
                      vec_id ASC) AS rn
           FROM codes WHERE vec_id <> 0) t
         WHERE rn <= {k * SQ_RERANK}),
rr AS (SELECT e.vec_id,
              list_cosine_similarity(e.v, (SELECT v FROM e WHERE vec_id = 0)) AS cos
       FROM e JOIN cand USING (vec_id))
SELECT vec_id, CAST(floor(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM rr ORDER BY cos DESC, vec_id LIMIT {k}"""


def _ann_ivf_pq_oracle(k: int = 10, pred_sql: str = "") -> str:
    """Replicates the composed ivf_pq_topk_from_cells serving path: IVF
    cell assignment + query probes exactly as :func:`_ann_ivf_oracle`,
    PQ codes + ADC lookup over the probed cells exactly as
    :func:`_ann_pq_oracle`, then the top-``IVFPQ_RERANK`` ADC shortlist
    (ties: vec_id asc) reranked by exact cosine.  ``pred_sql`` adds the
    filtered-search predicate to the scan CTE (the same place the Spark
    path applies it — before ADC, so the shortlist is drawn from
    qualifying rows only)."""
    from perlin_spark.extras.similarity import PQ_KS, PQ_M

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {IVF_CENTROIDS}),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
asg0 AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY list_cosine_similarity(v, c) DESC, cid ASC) AS rn
  FROM e, cent),
cells AS (SELECT vec_id, cid AS cell FROM asg0 WHERE rn = 1),
probes AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY list_cosine_similarity(c, (SELECT qv FROM q)) DESC, cid ASC) AS rn
    FROM cent) t
  WHERE rn <= {IVF_NPROBE}),
en AS (SELECT vec_id,
              list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nv
       FROM e),
qn AS (SELECT nv AS qnv FROM en WHERE vec_id = 0),
ds AS (SELECT len(qnv) // {PQ_M} AS d FROM qn),
cb AS (
  SELECT s.i AS m, en.vec_id AS code,
         list_slice(en.nv, s.i * (SELECT d FROM ds) + 1,
                    (s.i + 1) * (SELECT d FROM ds)) AS cent
  FROM en, unnest(generate_series(0, {PQ_M - 1})) AS s(i)
  WHERE en.vec_id < {PQ_KS}),
scan AS (SELECT en.vec_id, en.nv FROM en
         JOIN cells ON cells.vec_id = en.vec_id
         WHERE cells.cell IN (SELECT cid FROM probes) AND en.vec_id <> 0
         {pred_sql}),
asg AS (
  SELECT scan.vec_id, cb.m, cb.code,
         row_number() OVER (PARTITION BY scan.vec_id, cb.m
           ORDER BY list_distance(
                      list_slice(scan.nv, cb.m * (SELECT d FROM ds) + 1,
                                 (cb.m + 1) * (SELECT d FROM ds)),
                      cb.cent) ASC, cb.code ASC) AS rn
  FROM scan, cb),
codes AS (SELECT vec_id, m, code FROM asg WHERE rn = 1),
lut AS (SELECT cb.m, cb.code,
               list_inner_product(
                 list_slice((SELECT qnv FROM qn),
                            cb.m * (SELECT d FROM ds) + 1,
                            (cb.m + 1) * (SELECT d FROM ds)),
                 cb.cent) AS val
        FROM cb),
adc AS (SELECT c.vec_id, sum(l.val) AS s
        FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code GROUP BY 1),
short AS (SELECT vec_id FROM (
            SELECT vec_id, row_number() OVER (ORDER BY s DESC, vec_id ASC) AS rn
            FROM adc) t
          WHERE rn <= {IVFPQ_RERANK}),
rr AS (SELECT e.vec_id, list_cosine_similarity(e.v, (SELECT qv FROM q)) AS cos
       FROM e JOIN short USING (vec_id))
SELECT vec_id, CAST(floor(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM rr ORDER BY cos DESC, vec_id LIMIT {k}"""


def _hierarchy_search_oracle(k: int = 10) -> str:
    """Recursive-CTE twin of q_hierarchy_search: expand the seed through
    the same (term, parent) taxonomy, then disjunctive BM25 over the
    expanded term set (the _bm25_oracle 'any' body with qt/qs sourced
    from the expansion instead of literals)."""
    vals = ", ".join(
        f"('{t}', {'NULL' if p is None else repr(p)})" for t, p in HIERARCHY_ROWS
    )
    return f"""
WITH RECURSIVE {_TOK},
hier(term, parent) AS (SELECT * FROM (VALUES {vals}) t(term, parent)),
expt(term) AS (
  SELECT '{HIERARCHY_SEED}'
  UNION ALL
  SELECT h.term FROM hier h JOIN expt e ON h.parent = e.term),
qt AS (SELECT DISTINCT term FROM expt),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt USING (term) GROUP BY 1),
cand AS (SELECT doc_id FROM tfv JOIN qt USING (term) GROUP BY doc_id),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


def _expansion_bm25_body(exp_select: str, k: int = 10, where_extra: str = "") -> str:
    """The `_bm25_oracle` Any body with qt sourced from an expansion
    subquery instead of literal terms (the `_hierarchy_search_oracle`
    shape, shared by the prefix/fuzzy oracles).  ``exp_select`` must
    yield a single ``term`` column; `voc` (term, df over the whole
    tokenized corpus) is in scope for it."""
    return f"""
WITH {_TOK},
voc AS (SELECT term, count(*)::BIGINT AS df FROM tfv GROUP BY 1),
qt AS ({exp_select}),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt USING (term) GROUP BY 1),
cand AS (SELECT doc_id FROM tfv JOIN qt USING (term) GROUP BY doc_id),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand) {where_extra}
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


def _prefix_search_oracle(k: int = 10) -> str:
    """Twin of q_prefix_search: same df-desc/term-asc capped expansion
    over the recomputed vocabulary, then disjunctive BM25."""
    from perlin_spark.engine import PerlinEngine

    cap = PerlinEngine.EXPAND_MAX_TERMS
    exp = (
        f"SELECT term FROM (SELECT term FROM voc WHERE term LIKE '{PREFIX_QUERY}%' "
        f"ORDER BY df DESC, term LIMIT {cap})"
    )
    return _expansion_bm25_body(exp, k)


def _fuzzy_search_oracle(k: int = 10) -> str:
    """Twin of q_fuzzy_search: length-banded levenshtein expansion
    (dist asc, df desc, term asc, capped), then disjunctive BM25."""
    from perlin_spark.engine import PerlinEngine

    cap = PerlinEngine.EXPAND_MAX_TERMS
    lo, hi = len(FUZZY_QUERY) - FUZZY_EDITS, len(FUZZY_QUERY) + FUZZY_EDITS
    exp = (
        f"SELECT term FROM (SELECT term FROM voc "
        f"WHERE length(term) BETWEEN {lo} AND {hi} "
        f"AND levenshtein(term, '{FUZZY_QUERY}') <= {FUZZY_EDITS} "
        f"ORDER BY levenshtein(term, '{FUZZY_QUERY}'), df DESC, term LIMIT {cap})"
    )
    return _expansion_bm25_body(exp, k)


def _batch_search_oracle(k: int = 10) -> str:
    """Twin of q_batch_search: each batch query's conjunctive-BM25 body
    (nested-WITH reuse, the _snippets_oracle pattern) tagged with its
    query_id and unioned."""
    parts = []
    for qid, q in BATCH_QUERIES.items():
        body = _bm25_oracle(q.lower().split(), conj=True, k=k)
        parts.append(
            f"SELECT '{qid}' AS query_id, doc_id, score_x1e4 FROM ({body})"
        )
    return "\nUNION ALL\n".join(parts)


def _tfidf_oracle(terms: list[str], k: int = 10) -> str:
    """Twin of q_tfidf_topk: conjunctive candidacy (same as the BM25 AND
    body), scored by the pinned classic formula
    idf^2 * sqrt(tf) / sqrt(max(dl, 1)) with BM25's ln idf."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOK},
qt AS (SELECT unnest([{tlist}]) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt USING (term) GROUP BY 1),
cand AS (SELECT doc_id FROM tfv JOIN qt USING (term) GROUP BY doc_id
         HAVING count(DISTINCT term) = (SELECT count(*) FROM qt)),
sc AS (
  SELECT m.doc_id,
         sum(pow(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5)), 2)
             * sqrt(m.tf) / sqrt(greatest(d.dl, 1))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


def _lmdir_oracle(terms: list[str], k: int = 10) -> str:
    """Twin of q_lmdir_topk: conjunctive candidacy (the BM25 AND body),
    scored by the pinned LM-Dirichlet formula max(0, ln(1 + tf/(mu*p)) +
    ln(mu/(dl+mu))), mu=2000, p = sum(tf over collection)/sum(dl)."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {_TOK},
qt AS (SELECT unnest([{tlist}]) AS term),
ct AS (SELECT term, sum(tf)::DOUBLE AS cttf FROM tfv JOIN qt USING (term) GROUP BY 1),
tot AS (SELECT sum(dl)::DOUBLE AS total FROM dlv),
cand AS (SELECT doc_id FROM tfv JOIN qt USING (term) GROUP BY doc_id
         HAVING count(DISTINCT term) = (SELECT count(*) FROM qt)),
sc AS (
  SELECT m.doc_id,
         sum(greatest(0.0, ln(1 + m.tf / (2000.0 * (c.cttf / (SELECT total FROM tot))))
                           + ln(2000.0 / (d.dl + 2000.0)))) AS score
  FROM tfv m JOIN ct c USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


def _wildcard_search_oracle(k: int = 10) -> str:
    """Twin of q_wildcard_search: the same glob compiled to SQL LIKE
    (dialect-identical in Spark and DuckDB), df-desc/term-asc capped
    expansion, then disjunctive BM25."""
    from perlin_spark.engine import PerlinEngine

    cap = PerlinEngine.EXPAND_MAX_TERMS
    like = PerlinEngine._glob_to_like(WILDCARD_QUERY)
    exp = (
        f"SELECT term FROM (SELECT term FROM voc WHERE term LIKE '{like}' "
        f"ORDER BY df DESC, term LIMIT {cap})"
    )
    return _expansion_bm25_body(exp, k)


def _phrase_search_oracle(k: int = 10) -> str:
    """Twin of q_phrase_search: adjacency on the space-joined analyzed
    token stream (space-delimited substring == consecutive tokens), then
    the conjunctive-BM25 body restricted to verified docs (the verified
    set is a subset of the AND candidates by construction)."""
    terms = PHRASE_QUERY.lower().split()
    tlist = ", ".join(f"'{t}'" for t in dict.fromkeys(terms))
    needle = " " + " ".join(terms) + " "
    return f"""
WITH {_TOK},
ver AS (
  SELECT doc_id FROM documents
  WHERE instr(' ' || array_to_string(
                list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''),
              ' ') || ' ', '{needle}') > 0),
qt AS (SELECT unnest([{tlist}]) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt USING (term) GROUP BY 1),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM ver)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


def _near_search_oracle(k: int = 10) -> str:
    """Twin of q_near_search: positions from WITH-ORDINALITY-style
    unnest over the analyzed token array; unordered = an EXISTS witness
    per term inside [start, start+W] for some occurrence start, ordered
    = a join with strictly increasing positions and the same span bound;
    each mode's verified set then ranks by the conjunctive BM25 body."""
    t1, t2 = NEAR_QUERY.lower().split()
    w = NEAR_WINDOW
    return f"""
WITH {_TOK},
tokarr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
p AS (SELECT doc_id, g.i AS pos, toks[g.i] AS term
      FROM tokarr, unnest(generate_series(1, len(toks))) AS g(i)
      WHERE toks[g.i] IN ('{t1}', '{t2}')),
ver_u AS (
  SELECT DISTINCT s.doc_id FROM p s
  WHERE EXISTS (SELECT 1 FROM p o WHERE o.doc_id = s.doc_id AND o.term = '{t1}'
                AND o.pos BETWEEN s.pos AND s.pos + {w})
    AND EXISTS (SELECT 1 FROM p o WHERE o.doc_id = s.doc_id AND o.term = '{t2}'
                AND o.pos BETWEEN s.pos AND s.pos + {w})),
ver_o AS (
  SELECT DISTINCT a.doc_id FROM p a JOIN p b
    ON b.doc_id = a.doc_id AND a.term = '{t1}' AND b.term = '{t2}'
   AND b.pos > a.pos AND b.pos <= a.pos + {w}),
qt AS (SELECT unnest(['{t1}', '{t2}']) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt USING (term) GROUP BY 1),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  GROUP BY 1)
SELECT 'unordered' AS mode, doc_id, score_x1e4 FROM (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
  FROM sc JOIN ver_u USING (doc_id) ORDER BY score DESC, doc_id LIMIT {k})
UNION ALL
SELECT 'ordered', doc_id, score_x1e4 FROM (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
  FROM sc JOIN ver_o USING (doc_id) ORDER BY score DESC, doc_id LIMIT {k})
"""


def _more_like_this_oracle(k: int = 10) -> str:
    """Twin of q_more_like_this: the seed doc's top tf*idf terms (same
    idf formula the index's vocabulary stores), (weight desc, term asc)
    capped, then the Any body with the seed excluded from results."""
    exp = (
        f"SELECT term FROM ("
        f"SELECT s.term, s.tf * ln(1 + ((SELECT n FROM stv) - v.df + 0.5) / (v.df + 0.5)) AS w "
        f"FROM (SELECT term, count(*)::BIGINT AS tf FROM tok WHERE doc_id = {MLT_DOC_ID} GROUP BY 1) s "
        f"JOIN voc v USING (term) "
        f"ORDER BY w DESC, term LIMIT {MLT_MAX_TERMS})"
    )
    return _expansion_bm25_body(exp, k, where_extra=f"AND m.doc_id <> {MLT_DOC_ID}")


def _snippets_oracle(window: int = 3) -> str:
    """Twin of q_snippets: the OR-query top-10 (nested-WITH reuse of the
    _bm25_oracle body), joined with 1-based first-occurrence position via
    list_position and the same ±window token slice."""
    top = _bm25_oracle(SNIPPET_TERMS, conj=False)
    first = ", ".join(
        f"coalesce(nullif(list_position(toks, '{t}'), 0), 999999999)" for t in SNIPPET_TERMS
    )
    return f"""
WITH top AS ({top}),
t2 AS (SELECT doc_id,
              list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
       FROM documents),
p AS (SELECT top.doc_id, top.score_x1e4, toks,
             least({first}) AS rawpos
      FROM top JOIN t2 USING (doc_id))
SELECT doc_id, score_x1e4,
       (CASE WHEN rawpos = 999999999 THEN 0 ELSE rawpos END)::BIGINT AS pos,
       CASE WHEN rawpos = 999999999 THEN ''
            ELSE array_to_string(toks[greatest(1, rawpos - {window}):rawpos + {window}], ' ')
       END AS snippet
FROM p"""


def _facet_counts_oracle() -> str:
    """Twin of q_facet_counts: distinct matching docs of the term query,
    counted per facet value."""
    return f"""
WITH {_TOK},
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term = '{FACET_QUERY}')
SELECT d.{FACET_BY} AS {FACET_BY}, count(*)::BIGINT AS n_docs
FROM documents d JOIN cand USING (doc_id)
GROUP BY 1 ORDER BY n_docs DESC, {FACET_BY}"""


def _facet_cardinality_oracle() -> str:
    """Twin of q_facet_cardinality: per-lang matching-doc counts and
    distinct-source counts over the term query's match set."""
    return f"""
WITH {_TOK},
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term = '{FACET_QUERY}')
SELECT d.lang AS lang, count(*)::BIGINT AS n_docs,
       count(DISTINCT d.{FACET_BY})::BIGINT AS n_distinct
FROM documents d JOIN cand USING (doc_id)
GROUP BY 1 ORDER BY n_docs DESC, lang"""


def _facet_composite_oracle() -> str:
    """Twin of q_facet_composite: keyset page 2 of the (lang, source)
    bucket walk equals OFFSET size in key order, so the two tagged pages
    are LIMIT 4 and LIMIT 4 OFFSET 4 of the ordered bucket set."""
    return f"""
WITH {_TOK},
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term = '{FACET_QUERY}'),
b AS (SELECT d.lang AS lang, d.{FACET_BY} AS {FACET_BY},
             count(*)::BIGINT AS n_docs
      FROM documents d JOIN cand USING (doc_id) GROUP BY 1, 2),
p1 AS (SELECT 'p1' AS page, * FROM b ORDER BY lang, {FACET_BY} LIMIT 4),
p2 AS (SELECT 'p2' AS page, * FROM b ORDER BY lang, {FACET_BY} LIMIT 4 OFFSET 4)
SELECT * FROM p1 UNION ALL SELECT * FROM p2"""


def _parent_child_oracle() -> str:
    """Twin of q_parent_child: fold the FACET_QUERY match set's per-doc
    BM25 scores per parent (documents.{FACET_BY}) — sum with the
    min_children=2 floor and max — each globally top-10 by
    (folded score desc, parent asc)."""
    return f"""
WITH {_TOK},
qdf AS (SELECT count(DISTINCT doc_id)::BIGINT AS df FROM tfv WHERE term = '{FACET_QUERY}'),
sc AS (
  SELECT m.doc_id,
         ln(1 + ((SELECT n FROM stv) - (SELECT df FROM qdf) + 0.5) / ((SELECT df FROM qdf) + 0.5))
         * m.tf * 2.2
         / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv))) AS score
  FROM tfv m JOIN dlv d USING (doc_id) WHERE m.term = '{FACET_QUERY}'),
fold AS (
  SELECT doc.{FACET_BY} AS parent, sum(s.score) AS ssum, max(s.score) AS smax,
         count(*)::BIGINT AS n_children
  FROM sc s JOIN documents doc USING (doc_id) GROUP BY 1),
sums AS (
  SELECT 'sum' AS mode, parent,
         CAST(floor(ssum * 10000 + 0.5) AS BIGINT) AS score_x1e4, n_children
  FROM fold WHERE n_children >= 2 ORDER BY ssum DESC, parent LIMIT 10),
maxs AS (
  SELECT 'max' AS mode, parent,
         CAST(floor(smax * 10000 + 0.5) AS BIGINT) AS score_x1e4, n_children
  FROM fold ORDER BY smax DESC, parent LIMIT 10)
SELECT * FROM sums UNION ALL SELECT * FROM maxs"""


def _collapse_oracle() -> str:
    """Twin of q_collapse_search: per-source row_number over the BM25
    scores of the FACET_QUERY match set, keeping rn<=1 (mode agg1) and
    rn<=2 (mode win2), each globally top-10."""
    return f"""
WITH {_TOK},
qdf AS (SELECT count(DISTINCT doc_id)::BIGINT AS df FROM tfv WHERE term = '{FACET_QUERY}'),
sc AS (
  SELECT m.doc_id,
         ln(1 + ((SELECT n FROM stv) - (SELECT df FROM qdf) + 0.5) / ((SELECT df FROM qdf) + 0.5))
         * m.tf * 2.2
         / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv))) AS score
  FROM tfv m JOIN dlv d USING (doc_id) WHERE m.term = '{FACET_QUERY}'),
rn AS (
  SELECT s.doc_id, s.score, doc.{FACET_BY} AS {FACET_BY},
         row_number() OVER (PARTITION BY doc.{FACET_BY}
                            ORDER BY s.score DESC, s.doc_id) AS rn
  FROM sc s JOIN documents doc USING (doc_id)),
shaped AS (
  SELECT 'agg1' AS mode, doc_id,
         CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4, {FACET_BY},
         score
  FROM rn WHERE rn <= 1 ORDER BY score DESC, doc_id LIMIT 10),
shaped2 AS (
  SELECT 'win2' AS mode, doc_id,
         CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4, {FACET_BY},
         score
  FROM rn WHERE rn <= 2 ORDER BY score DESC, doc_id LIMIT 10)
SELECT mode, doc_id, score_x1e4, {FACET_BY} FROM shaped
UNION ALL
SELECT mode, doc_id, score_x1e4, {FACET_BY} FROM shaped2"""


def _significant_terms_oracle() -> str:
    """Twin of q_significant_terms: JLH over the FACET_QUERY foreground
    (fg_df from re-tokenized matching docs, bg_df from corpus doc
    frequencies), min_fg=3, fg_pct>bg_pct, top-{SIGNIFICANT_K}."""
    return f"""
WITH {_TOK},
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term = '{FACET_QUERY}'),
nfg AS (SELECT count(*)::BIGINT AS n FROM cand),
fg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_df
       FROM tok JOIN cand USING (doc_id) GROUP BY 1),
bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_df FROM tok GROUP BY 1),
sc AS (
  SELECT f.term, f.fg_df, b.bg_df,
         f.fg_df::DOUBLE / (SELECT n FROM nfg) AS fg_pct,
         b.bg_df::DOUBLE / (SELECT n FROM stv) AS bg_pct
  FROM fg f JOIN bg b USING (term)
  WHERE f.fg_df >= 3)
SELECT term, fg_df, bg_df,
       CAST(floor((fg_pct - bg_pct) * (fg_pct / bg_pct) * 10000 + 0.5) AS BIGINT)
         AS score_x1e4
FROM sc WHERE fg_pct > bg_pct
ORDER BY (fg_pct - bg_pct) * (fg_pct / bg_pct) DESC, term
LIMIT {SIGNIFICANT_K}"""


def _facet_histogram_oracle() -> str:
    """Twin of q_facet_histogram."""
    return f"""
WITH {_TOK},
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term = '{FACET_QUERY}')
SELECT (floor(d.n_chars / {HIST_INTERVAL}) * {HIST_INTERVAL})::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs
FROM documents d JOIN cand USING (doc_id)
GROUP BY 1 ORDER BY bucket"""


def _term_vectors_oracle() -> str:
    """Twin of q_term_vectors: per-doc tf of the pinned ids."""
    ids = ", ".join(str(i) for i in TV_DOC_IDS)
    return f"""
WITH {_TOK}
SELECT doc_id, term, tf FROM tfv
WHERE doc_id IN ({ids}) ORDER BY doc_id, term"""


def _percolate_oracle() -> str:
    """Twin of q_percolate: distinct doc terms x the literal query-term
    table, distinct-match counting per (doc, query), both modes."""
    vals = ", ".join(
        "({}, [{}])".format(
            qid, ", ".join(f"'{t}'" for t in sorted(set(qs.lower().split())))
        )
        for qid, qs in PERC_QUERIES
        if qs.strip()
    ) or "(0, []::VARCHAR[])"
    return f"""
WITH {_TOK},
dterms AS (SELECT DISTINCT doc_id, term FROM tok),
qt AS (SELECT * FROM (VALUES {vals}) AS v(query_id, terms)),
qq AS (SELECT query_id, unnest(terms) AS term FROM qt),
qs AS (SELECT query_id, count(*)::BIGINT AS n_terms FROM qq GROUP BY 1),
m AS (
  SELECT d.doc_id, q.query_id, count(*)::BIGINT AS n_matched
  FROM dterms d JOIN qq q USING (term) GROUP BY 1, 2)
SELECT 'all' AS mode, doc_id, query_id, n_matched, n_terms
FROM m JOIN qs USING (query_id) WHERE n_matched = n_terms
UNION ALL
SELECT 'min2' AS mode, doc_id, query_id, n_matched, n_terms
FROM m JOIN qs USING (query_id) WHERE n_matched >= 2"""


def _emb_pairs_oracle(
    threshold: float, lsh: bool, dim: int = 64, probe_hamming: int = 1
) -> str:
    """Replicates embedding_near_pairs(_exact): for the LSH variant the
    hyperplanes are seeded constants inlined as literals, and a pair is a
    candidate iff its buckets differ in <= probe_hamming planes (mask
    expansion on the a-side, identical to the Spark plan)."""
    if not lsh:
        return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(a.v, b.v) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, CAST(floor(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM c WHERE cos >= {threshold!r} ORDER BY cos_x1e4 DESC, vec_a, vec_b"""
    planes = similarity._hyperplanes(dim, EMB_PAIR_PLANES, similarity.LSH_SEED)
    parts = []
    for i in range(EMB_PAIR_PLANES):
        lits = ", ".join(repr(float(x)) for x in planes[i])
        parts.append(
            f"(CASE WHEN list_inner_product(v, [{lits}]) > 0 THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(parts)
    masks = ", ".join(
        f"({m})" for m in similarity.probe_masks(EMB_PAIR_PLANES, probe_hamming)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bb AS (SELECT vec_id, v, {bucket} AS b FROM e),
a AS (SELECT vec_id AS vec_a, v AS va, xor(b, m.m) AS key
      FROM bb, (VALUES {masks}) m(m)),
c AS (SELECT vec_a, vec_b, list_cosine_similarity(va, vb) AS cos
      FROM a JOIN (SELECT vec_id AS vec_b, v AS vb, b AS key FROM bb) bside
      USING (key)
      WHERE vec_a < vec_b)
SELECT vec_a, vec_b, CAST(floor(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM c WHERE cos >= {threshold!r} ORDER BY cos_x1e4 DESC, vec_a, vec_b"""


def _golden_oracle() -> str:
    """Expected-constant oracle: the engine must reproduce the reference's
    golden expectations (adjusted per FIXTURES.md for the two documented
    reference-internal inconsistencies)."""
    from perlin_spark.fixtures import GOLDEN_QUERIES

    rows = []
    for qid, (pipeline, qstr, expected, gating) in enumerate(GOLDEN_QUERIES):
        ids = ",".join(str(d) for d in expected)
        rows.append(
            f"(CAST({qid} AS BIGINT), '{qstr}', TRUE, '{ids}')"
        )
    values = ",\n  ".join(rows)
    return f"""
SELECT * FROM (VALUES
  {values}
) AS t(query_id, query, matches, doc_ids)
"""


def _minhash_oracle(threshold: float) -> str:
    p = dedup.MINHASH_P
    sig_cols = ",\n    ".join(
        f"min((x * {dedup.MINHASH_AS[i]} + {dedup.MINHASH_BS[i]}) % {p}) AS s{i}"
        for i in range(dedup.N_HASHES)
    )
    band_joins = []
    for j in range(dedup.BANDS):
        conds = " AND ".join(
            f"a.s{j * dedup.ROWS_PER_BAND + r} = b.s{j * dedup.ROWS_PER_BAND + r}"
            for r in range(dedup.ROWS_PER_BAND)
        )
        band_joins.append(
            f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sig a JOIN sig b ON {conds} AND a.doc_id < b.doc_id"
        )
    bands_sql = "\nUNION\n".join(band_joins)
    thr = int(threshold * 10000)
    return f"""
WITH tokarr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, sh FROM tokarr, unnest(
    CASE WHEN len(toks) >= 3
         THEN list_transform(generate_series(1, len(toks) - 2),
                             i -> array_to_string(toks[i:i+2], ' '))
         ELSE [array_to_string(toks, ' ')] END) AS u(sh)),
shx AS (SELECT doc_id, CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT) % {p} AS x FROM sh),
sig AS (SELECT doc_id, {sig_cols} FROM shx GROUP BY doc_id),
cands AS ({bands_sql}),
sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS i
  FROM cands c JOIN sh x ON x.doc_id = c.doc_a JOIN sh y ON y.doc_id = c.doc_b AND y.sh = x.sh
  GROUP BY 1, 2),
verified AS (
  SELECT i.doc_a, i.doc_b,
         CAST(floor(i.i / (sa.sz + sb.sz - i.i) * 10000 + 0.5) AS BIGINT) AS jacc_x1e4
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b)
SELECT doc_a, doc_b, jacc_x1e4 FROM verified WHERE jacc_x1e4 >= {thr}
"""


def oracle_sql() -> dict[str, str]:
    stop_list = ", ".join(f"'{s}'" for s in textstats.STOPWORDS)

    return {
        "ft_postings_flat": f"WITH {_TOK} SELECT term, doc_id, tf FROM tfv",
        "ft_vocabulary": f"""
WITH {_TOK}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
       CAST(floor(ln(1 + ((SELECT n FROM stv) - count(DISTINCT doc_id) + 0.5)
                         / (count(DISTINCT doc_id) + 0.5)) * 1000000 + 0.5) AS BIGINT) AS idf_x1e6
FROM tok GROUP BY term""",
        "ft_doc_stats": f"""
WITH {_TOK}
SELECT d.doc_id, dlv.dl, sha256(d.text) AS sha
FROM documents d JOIN dlv ON d.doc_id = dlv.doc_id""",
        "ft_frequent_terms": f"""
WITH {_TOK}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df
FROM tok GROUP BY term ORDER BY df DESC, term ASC LIMIT 10""",
        "ft_bm25_and_topk": _bm25_oracle(["hash", "join"], conj=True),
        "ft_bm25_or_topk": _bm25_oracle(["dup", "stream", "vector"], conj=False),
        "ft_must_filter": _bm25_oracle(["merge"], conj=True, must=["dup"]),
        # page 2 (rows 6-10) of the OR ranking: pagination correctness IS
        # "pages concatenate to the full ranking", so the oracle is
        # LIMIT/OFFSET over the same exact ordering
        "ft_search_after": _bm25_oracle(
            ["dup", "stream", "vector"], conj=False, k=PAGE_K, offset=PAGE_K
        ),
        # substring/regex search: the trigram index is a pruning layer
        # only — the exact semantics ARE the scan predicate, so the oracle
        # is the direct full-scan filter
        "ft_substring_search": f"""
SELECT doc_id FROM documents WHERE contains(text, '{SUBSTRING_NEEDLE}')
ORDER BY doc_id""",
        "ft_regex_search": f"""
SELECT doc_id FROM documents WHERE regexp_matches(text, '{REGEX_PATTERN}')
ORDER BY doc_id""",
        "ft_suggest": _suggest_oracle(),
        "ft_synonym_search": _bm25_groups_oracle(
            [["fast", "slow", "quick"], ["join"]]
        ),
        "ft_sorted_search": f"""
WITH {_TOK},
cand AS (SELECT doc_id FROM tfv WHERE term IN ('hash', 'join')
         GROUP BY doc_id HAVING count(DISTINCT term) = 2)
SELECT d.doc_id, d.n_chars FROM documents d JOIN cand USING (doc_id)
ORDER BY n_chars DESC, doc_id LIMIT 10""",
        "ft_min_match": _bm25_groups_oracle(
            [["dup", "stream", "vector"]], mins=[2]
        ),
        "ft_boosted_search": f"""
WITH {_TOK},
qt AS (SELECT * FROM (VALUES ('dup', 1.0), ('stream', {BOOSTS['stream']}),
                             ('vector', 1.0)) AS t(term, boost)),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv
        WHERE term IN (SELECT term FROM qt) GROUP BY 1),
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term IN (SELECT term FROM qt)),
sc AS (
  SELECT m.doc_id,
         sum(b.boost
             * ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN qt b USING (term)
       JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY 1)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc ORDER BY score DESC, doc_id LIMIT 10""",
        "ft_function_score": f"""
WITH {_TOK},
qt AS (SELECT unnest(['hash', 'join']) AS term),
qdf AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt USING (term) GROUP BY 1),
cand AS (SELECT doc_id FROM tfv JOIN qt USING (term) GROUP BY doc_id
         HAVING count(DISTINCT term) = 2),
sc AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY 1)
SELECT s.doc_id,
       CAST(floor(s.score * ln(1 + d.n_chars) * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc s JOIN documents d USING (doc_id)
ORDER BY s.score * ln(1 + d.n_chars) DESC, s.doc_id LIMIT 10""",
        "ft_rescore": f"""
WITH {_TOK},
qt1 AS (SELECT unnest(['hash', 'join']) AS term),
qdf1 AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt1 USING (term) GROUP BY 1),
cand1 AS (SELECT doc_id FROM tfv JOIN qt1 USING (term) GROUP BY doc_id
          HAVING count(DISTINCT term) = 2),
sc1 AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf1 q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand1)
  GROUP BY 1),
win AS (SELECT doc_id, score FROM sc1 ORDER BY score DESC, doc_id LIMIT {RESCORE_WINDOW}),
qt2 AS (SELECT unnest(['sort', 'merge']) AS term),
qdf2 AS (SELECT term, count(*)::BIGINT AS df FROM tfv JOIN qt2 USING (term) GROUP BY 1),
cand2 AS (SELECT doc_id FROM tfv JOIN qt2 USING (term)
          WHERE doc_id IN (SELECT doc_id FROM win)
          GROUP BY doc_id HAVING count(DISTINCT term) = 2),
sc2 AS (
  SELECT m.doc_id,
         sum(ln(1 + ((SELECT n FROM stv) - q.df + 0.5) / (q.df + 0.5))
             * m.tf * 2.2
             / (m.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / (SELECT avgdl FROM stv)))) AS score
  FROM tfv m JOIN qdf2 q USING (term) JOIN dlv d USING (doc_id)
  WHERE m.doc_id IN (SELECT doc_id FROM cand2)
  GROUP BY 1)
SELECT w.doc_id,
       CAST(floor((1.0 * w.score + 2.0 * coalesce(s.score, 0)) * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM win w LEFT JOIN sc2 s USING (doc_id)
ORDER BY (1.0 * w.score + 2.0 * coalesce(s.score, 0)) DESC, w.doc_id LIMIT 10""",
        "ft_facet_percentiles": f"""
WITH {_TOK},
cand AS (SELECT DISTINCT doc_id FROM tfv WHERE term = '{FACET_QUERY}')
SELECT d.{FACET_BY} AS {FACET_BY}, count(*)::BIGINT AS n_docs,
       CAST(floor(quantile_cont(d.n_chars, 0.5) * 10000 + 0.5) AS BIGINT) AS p50_x1e4,
       CAST(floor(quantile_cont(d.n_chars, 0.95) * 10000 + 0.5) AS BIGINT) AS p95_x1e4
FROM documents d JOIN cand USING (doc_id)
GROUP BY 1 ORDER BY n_docs DESC, {FACET_BY}""",
        "text_keywords": f"""
WITH {_TOK},
idf AS (SELECT term, ln(1 + ((SELECT n FROM stv) - count(DISTINCT doc_id) + 0.5)
                            / (count(DISTINCT doc_id) + 0.5)) AS idf
        FROM tok GROUP BY term),
sc AS (SELECT f.doc_id, f.term, f.tf, f.tf * i.idf AS score,
              row_number() OVER (PARTITION BY f.doc_id
                                 ORDER BY f.tf * i.idf DESC, f.term) AS rn
       FROM tfv f JOIN idf i USING (term))
SELECT doc_id, term, tf,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_x1e4
FROM sc WHERE rn <= 3""",
        "ft_bm25_may": _bm25_oracle(["merge"], conj=True, may=["dup"]),
        "ft_must_not": _bm25_oracle(["scan"], conj=True, must_not=["dup"]),
        "ft_bm25_mixed_roles": _bm25_oracle(
            ["sort", "merge"], conj=True,
            must=["window"], must_not=["vector"], may=["dup"],
        ),
        "ft_tfidf_topk": _tfidf_oracle(["hash", "join"]),
        "ft_lmdir_topk": _lmdir_oracle(["hash", "join"]),
        "ft_batch_search": _batch_search_oracle(),
        "ft_boolean_and_set": f"""
WITH {_TOK}
SELECT doc_id FROM tfv WHERE term IN ('sort', 'merge', 'window')
GROUP BY doc_id HAVING count(DISTINCT term) = 3""",
        "dedup_exact": """
SELECT count(*)::BIGINT AS n_docs,
       count(DISTINCT sha256(text))::BIGINT AS n_distinct,
       (count(*) - count(DISTINCT sha256(text)))::BIGINT AS n_dup_docs
FROM documents""",
        "dedup_ngram_jaccard": f"""
WITH {_NGRAM_PAIR_CTES}
SELECT doc_a, doc_b, CAST(floor(j * 10000 + 0.5) AS BIGINT) AS jacc_x1e4
FROM jacc WHERE j >= 0.12""",
        # connected components of the same pair graph: DuckDB's recursive
        # CTE computes the transitive closure; component = min reachable
        # doc_id, pair-free docs are their own singleton component —
        # independent semantics from the Spark label-propagation loop
        "dedup_components": f"""
WITH RECURSIVE {_NGRAM_PAIR_CTES},
pairs AS (SELECT doc_a, doc_b FROM jacc WHERE j >= 0.12),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(doc_id, comp) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.doc_id),
comp AS (SELECT doc_id, min(comp) AS component FROM reach GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
FROM documents d LEFT JOIN comp c USING (doc_id)""",
        "events_windowed_stats": """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start_s,
       event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS sum_value_x100
FROM events GROUP BY 1, 2""",
        "events_date_histogram": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS sum_value_x100
FROM events GROUP BY 1, 2""",
        "events_sessions": """
WITH o AS (
  SELECT user_id, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events),
t AS (
  SELECT user_id, value, sec, event_id,
         CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM o),
s AS (
  SELECT user_id, value, sec,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM t)
SELECT user_id, session_no::BIGINT AS session_no,
       min(sec) AS sess_start_s,
       count(*)::BIGINT AS n_events,
       (max(sec) - min(sec))::BIGINT AS duration_s,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS sum_value_x100
FROM s GROUP BY 1, 2""",
        "events_props_stats": """
SELECT event_type,
       count(*)::BIGINT AS n_events,
       count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS n_with_key,
       count(DISTINCT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS n_distinct_vals,
       sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_vals
FROM events GROUP BY 1""",
        "dedup_survivors": f"""
WITH RECURSIVE {_NGRAM_PAIR_CTES},
pairs AS (SELECT doc_a, doc_b FROM jacc WHERE j >= 0.12),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(doc_id, comp) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.doc_id),
comp AS (SELECT doc_id, min(comp) AS component FROM reach GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
FROM documents d LEFT JOIN comp c USING (doc_id)
WHERE d.doc_id = coalesce(c.component, d.doc_id)""",
        "dedup_incremental": f"""
WITH RECURSIVE {_NGRAM_PAIR_CTES},
pairs AS (SELECT doc_a, doc_b FROM jacc WHERE j >= 0.12),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(doc_id, comp) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.doc_id),
comp AS (SELECT doc_id, min(comp) AS component FROM reach GROUP BY doc_id),
split AS (SELECT CAST(floor((min(doc_id) + max(doc_id) + 1) / 2) AS BIGINT) AS s
          FROM documents),
lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
               d.doc_id < (SELECT s FROM split) AS is_old
        FROM documents d LEFT JOIN comp c USING (doc_id)),
g AS (SELECT component,
             max(CASE WHEN is_old THEN 1 ELSE 0 END) AS has_old,
             min(CASE WHEN NOT is_old THEN doc_id END) AS min_new
      FROM lab GROUP BY 1)
SELECT min_new AS doc_id FROM g
WHERE has_old = 0 AND min_new IS NOT NULL""",
        "dedup_minhash_lsh": _minhash_oracle(0.12),
        # exact-substring dedup: positional k-grams -> cross-doc dup grams
        # -> gaps-and-islands span merge (twin of duplicate_substring_spans)
        "dedup_substring_spans": """
WITH tokarr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
grams AS (
  SELECT doc_id, g.i - 1 AS pos,
         array_to_string(toks[g.i : g.i + 7], ' ') AS gram
  FROM tokarr, unnest(generate_series(1, len(toks) - 7)) AS g(i)
  WHERE len(toks) >= 8),
dup AS (SELECT gram FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM grams WHERE gram IN (SELECT gram FROM dup)),
brk AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
             THEN 0 ELSE 1 END AS b FROM hits),
grp AS (SELECT doc_id, pos, sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM brk)
SELECT doc_id, min(pos)::INT AS start_pos, (max(pos) + 8)::INT AS end_pos,
       count(*)::BIGINT AS n_grams
FROM grp GROUP BY doc_id, isl""",
        "dedup_simhash": f"""
WITH {_TOK},
h AS (SELECT doc_id, term, tf,
             CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h FROM tfv),
bits AS (
  SELECT doc_id, g.i, sum(tf * (2 * ((h >> g.i) & 1) - 1)) AS s
  FROM h, unnest(generate_series(0, 59)) AS g(i)
  GROUP BY 1, 2)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id""",
        "ann_cosine_topk": _ANN_COSINE_SQL,
        "text_quality": f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars,
       CAST(floor(len(list_distinct(toks))::DOUBLE / len(toks) * 10000 + 0.5) AS BIGINT) AS uniq_ratio_x1e4,
       CAST(floor(len(list_filter(toks, x -> x IN ({stop_list})))::DOUBLE / len(toks) * 10000 + 0.5) AS BIGINT) AS stop_ratio_x1e4
FROM t""",
        "text_filter_corpus": f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
q AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars,
         CAST(floor(len(list_distinct(toks))::DOUBLE / len(toks) * 10000 + 0.5) AS BIGINT) AS uniq_ratio_x1e4,
         CAST(floor(len(list_filter(toks, x -> x IN ({stop_list})))::DOUBLE / len(toks) * 10000 + 0.5) AS BIGINT) AS stop_ratio_x1e4
  FROM t)
SELECT * FROM q
WHERE n_tokens >= 20
  AND n_tokens <= {textstats.QUALITY_MAX_TOKENS}
  AND uniq_ratio_x1e4 >= 3500
  AND stop_ratio_x1e4 <= 1000""",
        "text_sample": f"""
SELECT doc_id FROM documents
WHERE CAST(('0x' || substr(md5('7:' || doc_id), 1, 8)) AS BIGINT)
      < CAST(floor(0.1 * 4294967296) AS BIGINT)""",
        "text_unigram_logprob": f"""
WITH {_TOK},
cnt AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n FROM tok)
SELECT t.doc_id,
       sum(t.tf)::BIGINT AS n_tokens,
       CAST(floor(sum(t.tf * ln(c.c / (SELECT n FROM tot))) / sum(t.tf)
                  * 10000 + 0.5) AS BIGINT) AS avg_logprob_x1e4
FROM tfv t JOIN cnt c USING (term)
GROUP BY 1""",
        "text_langid": f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
s AS (SELECT doc_id,
  {", ".join(f"len(list_filter(toks, x -> x IN ({', '.join(chr(39) + m + chr(39) for m in markers)}))) AS s_{lang}" for lang, markers in textstats.LANG_MARKERS.items())}
  FROM t)
SELECT doc_id, {_langid_case_sql()} AS pred_lang FROM s""",
        "text_subword_counts": """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_subwords
FROM documents""",
        "text_fingerprint": """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
sh AS (
  SELECT doc_id, CASE WHEN len(toks) >= 5
         THEN list_transform(generate_series(1, len(toks) - 4),
                             i -> array_to_string(toks[i:i+4], ' '))
         ELSE [array_to_string(toks, ' ')] END AS shs
  FROM t)
SELECT doc_id,
       list_min(list_transform(shs, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT))) AS fingerprint
FROM sh""",
        "text_repetition": _REPETITION_SQL,
        "text_contamination": f"WITH {_DECON_CTES}\nSELECT doc_id, n_hit_ngrams FROM hits",
        "text_decontaminate": f"""WITH {_DECON_CTES}
SELECT b.doc_id FROM band b
WHERE b.h < CAST(floor({DECON_TRAIN_RATE} * 4294967296) AS BIGINT)
  AND NOT EXISTS (SELECT 1 FROM hits x WHERE x.doc_id = b.doc_id)""",
        "text_pack_sequences": _PACK_SQL,
        "text_chunk_documents": _chunk_documents_oracle(),
        "text_segment_dedup": _segment_dedup_oracle(),
        "text_redact_pii": _redact_pii_oracle(),
        "text_mixture_sample": _mixture_oracle(),
        "search_hybrid_rrf": _hybrid_rrf_oracle(),
        "ann_lsh_topk": _ann_lsh_oracle(),
        "dedup_simhash_near": f"""
WITH {_TOK},
h AS (SELECT doc_id, term, tf,
             CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h FROM tfv),
bits AS (
  SELECT doc_id, g.i, sum(tf * (2 * ((h >> g.i) & 1) - 1)) AS s
  FROM h, unnest(generate_series(0, 59)) AS g(i)
  GROUP BY 1, 2),
sims AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)::BIGINT AS simhash
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "ann_ivf_topk": _ann_ivf_oracle(),
        "ann_pq_topk": _ann_pq_oracle(),
        "ann_ivf_pq_topk": _ann_ivf_pq_oracle(),
        "ann_ivf_pq_filtered": _ann_ivf_pq_oracle(
            pred_sql=f"AND (en.vec_id % {ANN_FILTER_MOD}) <> 0"
        ),
        # k-means training is iterative (not SQL-expressible); the gate is
        # stronger instead: the default build served at the pinned
        # nprobe/rerank must EQUAL exact brute-force cosine (see
        # q_ann_ivf_pq_kmeans docstring)
        "ann_ivf_pq_kmeans": _ANN_COSINE_SQL,
        "ann_sq_topk": _ann_sq_oracle(),
        "ft_hierarchy_search": _hierarchy_search_oracle(),
        "ft_prefix_search": _prefix_search_oracle(),
        "ft_fuzzy_search": _fuzzy_search_oracle(),
        "ft_wildcard_search": _wildcard_search_oracle(),
        "ft_bm25_deleted": _bm25_oracle(
            ["hash", "join"], conj=True, exclude_ids=DELETED_IDS
        ),
        "ft_phrase_search": _phrase_search_oracle(),
        "ft_near_search": _near_search_oracle(),
        "ft_facet_counts": _facet_counts_oracle(),
        "ft_facet_stats": _facet_stats_oracle(),
        "ft_facet_cardinality": _facet_cardinality_oracle(),
        "ft_facet_composite": _facet_composite_oracle(),
        "ft_collapse_search": _collapse_oracle(),
        "ft_parent_child": _parent_child_oracle(),
        "ft_significant_terms": _significant_terms_oracle(),
        "ft_percolate": _percolate_oracle(),
        "ft_facet_histogram": _facet_histogram_oracle(),
        "ft_term_vectors": _term_vectors_oracle(),
        # the parser maps 'dup +stream -vector' onto exactly the
        # single-term-scored / Must / MustNot oracle shape
        "ft_query_language": _bm25_oracle(
            ["dup"], conj=False, must=["stream"], must_not=["vector"]
        ),
        "ft_more_like_this": _more_like_this_oracle(),
        "ft_snippets": _snippets_oracle(),
        "ft_bm25_and_dl_fallback": _bm25_oracle(["hash", "join"], conj=True),
        "ft_bm25_resharded": _bm25_oracle(["merge", "scan"], conj=True),
        "dedup_embedding_exact": _emb_pairs_oracle(EMB_PAIR_THRESHOLD, lsh=False),
        "dedup_embedding_lsh": _emb_pairs_oracle(EMB_PAIR_THRESHOLD, lsh=True),
        "golden_reference_suite": _golden_oracle(),
        "ft_code_vocabulary": f"""
WITH {_TOK_CODE}
SELECT field, term, count(DISTINCT doc_id)::BIGINT AS df
FROM crouted GROUP BY 1, 2""",
        "ft_code_ident_bm25": _ident_bm25_oracle(),
        "ft_code_bm25_topk": _bm25_code_oracle(["hash", "join"]),
        "ft_code_must_number": _bm25_code_oracle(["merge"], must_number="42"),
        "ft_range_filter": _bm25_code_oracle(["merge"], must_range=(100, 300)),
        "ft_fielded_bm25": _fielded_oracle(["dup", "stream", "vector"]),
    }


_ANN_COSINE_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id,
             list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) AS cos
      FROM embeddings WHERE vec_id <> 0)
SELECT vec_id, CAST(floor(cos * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM c ORDER BY cos DESC, vec_id LIMIT 10"""


def _hybrid_rrf_oracle() -> str:
    """RRF fusion of the BM25-OR oracle and the cosine oracle — MUST
    mirror extras.fusion.rrf_fuse: ranks by (score DESC, id ASC), runs
    folded in sorted-name order ('ann' then 'bm25'), 1/(60+rank) doubles."""
    bm = _bm25_oracle(["dup", "stream", "vector"], conj=False)
    return f"""
WITH rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_x1e4 DESC, doc_id) AS r
  FROM ({bm}) bm),
ra AS (
  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos_x1e4 DESC, vec_id) AS r
  FROM ({_ANN_COSINE_SQL}) an),
f AS (
  SELECT coalesce(rb.doc_id, ra.doc_id) AS doc_id,
         coalesce((1::DOUBLE) / ({fusion.RRF_K} + ra.r), 0)
         + coalesce((1::DOUBLE) / ({fusion.RRF_K} + rb.r), 0) AS rrf
  FROM rb FULL OUTER JOIN ra ON rb.doc_id = ra.doc_id)
SELECT doc_id, CAST(floor(rrf * 1000000 + 0.5) AS BIGINT) AS rrf_x1e6
FROM f ORDER BY rrf_x1e6 DESC, doc_id LIMIT 10"""


#: k-gram CTE shared by the contamination oracles — MUST match
#: textstats._decon_grams at k=DECON_QUERY_K and the seed-7 train band
_DECON_CTES = f"""t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
band AS (
  SELECT doc_id, CAST(('0x' || substr(md5('7:' || doc_id), 1, 8)) AS BIGINT) AS h
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id, g FROM t, unnest(
    CASE WHEN len(toks) >= {DECON_QUERY_K}
         THEN list_transform(generate_series(1, len(toks) - {DECON_QUERY_K - 1}),
                             i -> array_to_string(toks[i:i+{DECON_QUERY_K - 1}], ' '))
         ELSE [array_to_string(toks, ' ')] END) AS u(g)),
ev AS (SELECT DISTINCT g FROM grams JOIN band USING (doc_id)
       WHERE h >= CAST(floor({DECON_TRAIN_RATE} * 4294967296) AS BIGINT)),
tr AS (SELECT doc_id, g FROM grams JOIN band USING (doc_id)
       WHERE h < CAST(floor({DECON_TRAIN_RATE} * 4294967296) AS BIGINT)),
hits AS (SELECT doc_id, count(*)::BIGINT AS n_hit_ngrams
         FROM tr JOIN ev USING (g) GROUP BY 1)"""


#: MUST mirror textstats.repetition_stats: top-2-gram mass fraction and
#: duplicate-5-gram mass fraction, 0 rows kept for gram-less docs
_REPETITION_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, {textstats.REP_TOP_N} AS n,
         unnest(list_transform(generate_series(1, len(toks) - {textstats.REP_TOP_N - 1}),
                               i -> array_to_string(toks[i:i+{textstats.REP_TOP_N - 1}], ' '))) AS g
  FROM t WHERE len(toks) >= {textstats.REP_TOP_N}
  UNION ALL
  SELECT doc_id, {textstats.REP_DUP_N} AS n,
         unnest(list_transform(generate_series(1, len(toks) - {textstats.REP_DUP_N - 1}),
                               i -> array_to_string(toks[i:i+{textstats.REP_DUP_N - 1}], ' '))) AS g
  FROM t WHERE len(toks) >= {textstats.REP_DUP_N}),
cnt AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
per AS (
  SELECT doc_id,
         sum(CASE WHEN n = {textstats.REP_TOP_N} THEN c END) AS tot2,
         max(CASE WHEN n = {textstats.REP_TOP_N} THEN c END) AS max2,
         sum(CASE WHEN n = {textstats.REP_DUP_N} THEN c END) AS tot5,
         sum(CASE WHEN n = {textstats.REP_DUP_N} AND c > 1 THEN c END) AS dup5
  FROM cnt GROUP BY 1)
SELECT d.doc_id,
       coalesce(tot2, 0)::BIGINT AS n_2grams,
       CASE WHEN coalesce(tot2, 0) > 0
            THEN CAST(floor(coalesce(max2, 0) / tot2 * 10000 + 0.5) AS BIGINT)
            ELSE 0 END AS top_2gram_x1e4,
       coalesce(tot5, 0)::BIGINT AS n_5grams,
       CASE WHEN coalesce(tot5, 0) > 0
            THEN CAST(floor(coalesce(dup5, 0) / tot5 * 10000 + 0.5) AS BIGINT)
            ELSE 0 END AS dup_5gram_x1e4
FROM documents d LEFT JOIN per USING (doc_id)"""


#: MUST mirror textstats.pack_sequences at the query's pinned
#: seq_len/bucket — the bucketed two-phase prefix sum equals this naive
#: doc_id-ordered cumulative sum because bucket = doc_id // BUCKET is
#: monotone in doc_id
_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))::BIGINT AS n_tokens
  FROM documents),
p AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)::BIGINT AS tok_start
  FROM t WHERE n_tokens > 0)
SELECT doc_id, n_tokens, tok_start,
       CAST(floor(tok_start / {PACK_SEQ_LEN}) AS BIGINT) AS seq_first,
       CAST(floor((tok_start + n_tokens - 1) / {PACK_SEQ_LEN}) AS BIGINT) AS seq_last
FROM p"""


def _chunk_documents_oracle() -> str:
    """Twin of textstats.chunk_documents at the pinned CHUNK_TOKENS /
    CHUNK_OVERLAP: stride = tokens - overlap, chunk i = toks[i*stride :
    i*stride + tokens], count = 1 + ceil(max(n - tokens, 0)/stride)."""
    c, s = CHUNK_TOKENS, CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
n AS (SELECT doc_id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id, toks, n, g.i::BIGINT AS chunk_id
  FROM n, unnest(generate_series(
    0, CAST(ceil(greatest(n - {c}, 0) / {s}.0) AS BIGINT))) AS g(i))
SELECT doc_id, chunk_id,
       (chunk_id * {s})::BIGINT AS tok_start,
       least({c}, n - chunk_id * {s})::BIGINT AS n_tokens,
       array_to_string(toks[chunk_id * {s} + 1 : chunk_id * {s} + {c}], ' ') AS chunk
FROM c"""


def _redact_pii_oracle() -> str:
    """Twin of textstats.redact_pii over the _pii_docs synthesis: the SAME
    three patterns (PII_PATTERNS is restricted to Java-regex/RE2 shared
    syntax), applied in the same order, counts taken before each stage's
    replacement."""
    (u_n, u_p, u_r), (e_n, e_p, e_r), (i_n, i_p, i_r) = textstats.PII_PATTERNS
    return f"""
WITH src AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN ' user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ' https://ex.io/p/' || doc_id ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' 10.0.0.' || (doc_id % 256) ELSE '' END AS text
  FROM documents),
s1 AS (SELECT doc_id,
              len(regexp_extract_all(text, '{u_p}'))::BIGINT AS n_{u_n},
              regexp_replace(text, '{u_p}', '{u_r}', 'g') AS t FROM src),
s2 AS (SELECT doc_id, n_{u_n},
              len(regexp_extract_all(t, '{e_p}'))::BIGINT AS n_{e_n},
              regexp_replace(t, '{e_p}', '{e_r}', 'g') AS t FROM s1),
s3 AS (SELECT doc_id, n_{u_n}, n_{e_n},
              len(regexp_extract_all(t, '{i_p}'))::BIGINT AS n_{i_n},
              regexp_replace(t, '{i_p}', '{i_r}', 'g') AS t FROM s2)
SELECT doc_id, t AS text_redacted, n_{u_n}, n_{e_n}, n_{i_n} FROM s3"""


def _segment_dedup_oracle() -> str:
    """Twin of textstats.segment_dedup at the pinned SEG_TOKENS /
    SEG_MIN_DOCS: non-overlapping segments, boilerplate = segment text in
    >= min_docs distinct docs, survivors rejoin in seg_id order (grouping
    on the segment TEXT here is equivalent to the Spark side's sha256
    keys)."""
    w, m = textstats.SEG_TOKENS, textstats.SEG_MIN_DOCS
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
n AS (SELECT doc_id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0),
segs AS (
  SELECT doc_id, g.i::BIGINT AS seg_id,
         array_to_string(toks[g.i * {w} + 1 : g.i * {w} + {w}], ' ') AS seg
  FROM n, unnest(generate_series(0, CAST(ceil(n / {w}.0) AS BIGINT) - 1)) AS g(i)),
boiler AS (SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= {m}),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_segments FROM segs GROUP BY 1),
keep AS (SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM boiler)),
reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(seg, ' ' ORDER BY seg_id) AS text_clean
        FROM keep GROUP BY 1)
SELECT t.doc_id, coalesce(r.text_clean, '') AS text_clean, t.n_segments,
       (t.n_segments - coalesce(r.n_kept, 0))::BIGINT AS n_dropped
FROM tot t LEFT JOIN reb r USING (doc_id)"""


def _mixture_oracle() -> str:
    """Per-source keep-band CASE replicating textstats.mixture_sample:
    seed 3, int-truncated 32-bit bands, same keyed-md5 hash as text_sample."""
    band = str(int(MIXTURE_DEFAULT * (1 << 32)))
    for g in sorted(MIXTURE_RATES):
        band = (
            f"CASE WHEN source = '{g}' THEN "
            f"{int(MIXTURE_RATES[g] * (1 << 32))} ELSE {band} END"
        )
    return f"""
SELECT doc_id, source FROM documents
WHERE CAST(('0x' || substr(md5('3:' || doc_id), 1, 8)) AS BIGINT) < ({band})"""


def _langid_case_sql() -> str:
    """CASE chain replicating textstats.langid's deterministic argmax."""
    expr = "'und'"
    best = "0"
    for lang in sorted(textstats.LANG_MARKERS):
        expr = f"CASE WHEN s_{lang} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest({best}, s_{lang})"
    return expr
