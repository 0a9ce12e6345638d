"""Distributed inverted-index build (the ``add_document`` -> ``commit`` path).

Re-expresses the reference's indexing lifecycle (SURVEY.md §3.1;
``add_document`` at ``/root/reference/src/document_index.rs:98-102``,
``commit`` at ``/root/reference/src/field/mod.rs:30-37``) as ONE Spark job
with exactly ONE wide shuffle:

    corpus
      -> mapInPandas(analyze)          # tokenize/normalize/route, tf per doc
                                       # (map-side combine: a doc's tokens all
                                       #  live in its own row, so tf is final;
                                       #  per-(doc,field) lengths are emitted
                                       #  as a reserved pseudo-term so they
                                       #  ride the same shuffle)
      -> shard = doc_id div chunk      # contiguous doc-range shards
      -> repartition(field, term, shard)   # THE shuffle (term-hash merge)
      -> sortWithinPartitions + streaming group encode (mapInPandas)
      -> postings(field, term, shard, df, max_tf, blob)

**Skew / salting.** The ``shard`` column is the explicit, deterministic
salt the north_star demands for corpus-scale terms like ``return`` /
``import``: a heavy term's postings are split into ``n_shards`` bounded,
disjoint doc-id ranges that hash to different reducers.  No reducer ever
materializes more than ``ceil(n_docs / n_shards)`` postings for one key,
regardless of term skew — and the salt is seeded by doc ranges, so a
resumed job re-plans identically (SURVEY.md §7 risk 4).  Shards are kept
as separate physical rows (never re-merged into one corpus-sized blob):
the query side scores shards independently and unions per-shard top-k,
replacing the "second-stage unsalted merge" with a cheap k-row union.

Doc-id assignment is rank-stable without a single-partition window:
``repartitionByRange`` + ``sortWithinPartitions`` + per-partition offsets
(zipWithIndex-style), per SURVEY.md §7 risk 5.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import codec
from .analysis import FieldSpec, analyze_pandas

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

#: Reserved pseudo-term carrying per-(doc, field) token counts through the
#: build shuffle; real terms cannot contain NUL after tokenization.
DL_MARKER = "\x00dl"

FLAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("field", StringType()),
        StructField("term", StringType()),
        StructField("tf", LongType()),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("field", StringType()),
        StructField("term", StringType()),
        StructField("shard", LongType()),
        StructField("df", LongType()),
        StructField("max_tf", LongType()),
        StructField("blob", BinaryType()),
    ]
)

#: number of term-hash buckets a persisted epoch's postings are split into;
#: the bucket is the checkpoint/resume unit (epochs.py)
DEFAULT_BUCKETS = 8


def assign_doc_ids(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Deterministic, rank-stable doc ids without a global window.

    ``row_number() over (order by ...)`` would collapse to one partition;
    instead: range-partition on the order key, sort within partitions,
    count rows per partition, and add driver-computed offsets.  The result
    equals the global ``row_number() - 1`` (ids start at 0, like the
    reference's ``doc_counter``, ``perlin-derive/src/index_struct.rs:16``).
    """
    from pyspark.sql.window import Window

    cols = [F.col(c) for c in order_cols]
    if num_partitions:
        parts = df.repartitionByRange(num_partitions, *cols)
    else:
        parts = df.repartitionByRange(*cols)
    # persist so the offset-count job and the numbering job see the same
    # physical partitioning (range boundaries come from sampling)
    parts = parts.withColumn("_pid", F.spark_partition_id()).persist()

    counts = {int(r["_pid"]): int(r["count"]) for r in parts.groupBy("_pid").count().collect()}
    offsets, total = [], 0
    for pid in sorted(counts):
        offsets.append((pid, total))
        total += counts[pid]
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _offset long")

    # row_number is windowed PER RANGE PARTITION (parallel, never a global
    # single-partition sort); order_cols must be a unique key for the ids
    # to be rank-stable
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn("doc_id", F.row_number().over(w) - 1 + F.col("_offset"))
        .drop("_pid", "_offset")
    )
    return out.select("doc_id", *df.columns)


@dataclass
class IndexData:
    """A built index epoch: plain DataFrames + pinned scoring params.

    The moral equivalent of the reference's generated ``…Index`` struct
    (``perlin-derive/src/index_struct.rs:12-40``) — but every component is
    an ordinary table, directly queryable (the ``Deref`` escape hatch of
    ``src/field/mod.rs:49-60`` comes for free).
    """

    spark: SparkSession
    specs: list[FieldSpec]
    postings: DataFrame      # (field, term, shard, df, max_tf, blob)
    vocabulary: DataFrame    # (field, term, df, idf)
    docs: DataFrame          # (doc_id, ..., sha256?)
    doc_lens: DataFrame      # (field, shard, n_docs, blob of (doc_id, dl))
    stats: DataFrame         # (field, n_docs, avgdl, mindl, total_terms)
    n_docs: int
    chunk: int
    n_shards: int
    block_size: int
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    #: pre-aggregation df rows (field, term, df) — for persisted indexes a
    #: small materialized table per epoch, so per-query idf lookups never
    #: scan the postings table
    vocab_source: DataFrame | None = None
    #: term-hash bucket count of a persisted index (postings dirs are
    #: partitioned by bucket, enabling per-query partition pruning)
    buckets: int | None = None
    _stats_map: dict | None = None

    def cache(self) -> "IndexData":
        for df in (self.postings, self.vocabulary, self.docs, self.doc_lens, self.stats):
            df.cache()
        return self

    def unpersist(self) -> None:
        for df in (self.postings, self.vocabulary, self.docs, self.doc_lens, self.stats):
            df.unpersist()

    def stats_map(self) -> dict:
        if self._stats_map is None:
            self._stats_map = {
                r["field"]: {
                    "n_docs": int(r["n_docs"]),
                    "avgdl": float(r["avgdl"]),
                    "mindl": int(r["mindl"]),
                }
                for r in self.stats.collect()
            }
        return self._stats_map

    def vocab_for_terms(self, terms_df: DataFrame) -> DataFrame:
        """(field, term, df_g, idf) for the given term rows only — the join
        with the (broadcast) term list happens BEFORE aggregation, so the
        per-query scan is a pushdown-filtered read of the small vocab table
        (or of cached postings for in-memory builds), never a full-index
        aggregation."""
        src = self.vocab_source if self.vocab_source is not None else self.postings
        return (
            src.join(F.broadcast(terms_df), ["field", "term"])
            .groupBy("field", "term")
            .agg(F.sum("df").alias("df_g"))
            .withColumn(
                "idf",
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(self.n_docs)) - F.col("df_g") + F.lit(0.5))
                    / (F.col("df_g") + F.lit(0.5))
                ),
            )
        )

    def frequent_terms(self, field: str, k: int | None = None) -> DataFrame:
        """df-descending term iteration (``Filter::commit`` supplement,
        ``/root/reference/src/field/filter.rs:10-22``)."""
        out = (
            self.vocabulary.filter(F.col("field") == field)
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
        )
        return out.limit(k) if k is not None else out


def _encode_groups(key_cols: list[str], block_size: int):
    """Streaming group-encoder for mapInPandas over a sorted partition.

    Arrow batches may split a (field, term, shard) group across batch
    boundaries, so the encoder carries the trailing open group between
    batches and flushes it at end-of-partition.
    """

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            keys = pdf[key_cols]
            eq_last = (keys == keys.iloc[-1]).all(axis=1).to_numpy()
            if eq_last.all():
                carry = pdf  # whole batch is one open group
                continue
            trailing = int(eq_last[::-1].argmin())  # rows of the open group
            ready, carry = pdf.iloc[: len(pdf) - trailing], pdf.iloc[len(pdf) - trailing :]
            yield _encode_ready(ready, key_cols, block_size)
        if carry is not None and len(carry):
            yield _encode_ready(carry, key_cols, block_size)

    return encode


def _encode_ready(pdf: pd.DataFrame, key_cols: list[str], block_size: int) -> pd.DataFrame:
    """Encode contiguous (already sorted) groups into blobs.

    Group boundaries are found with one vectorized pass (factorize +
    change detection) instead of ``pandas.groupby`` — the reduce partitions
    carry hundreds of thousands of small groups, so per-group overhead is
    the dominant cost of the whole merge stage."""
    n = len(pdf)
    combined = np.zeros(n, dtype=np.int64)
    for c in key_cols:
        codes, uniq = pd.factorize(pdf[c].to_numpy())
        combined = combined * (len(uniq) + 1) + codes
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(combined[1:], combined[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)

    docs_all = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs_all = pdf["tf"].to_numpy(dtype=np.int64)
    # input is sorted by (keys..., doc_id) so groups are ascending already
    blobs = codec.encode_postings_batch(docs_all, tfs_all, starts, ends, block_size)
    max_tfs = np.maximum.reduceat(tfs_all, starts)

    out = pd.DataFrame({c: pdf[c].to_numpy()[starts] for c in key_cols})
    out["df"] = (ends - starts).astype("int64")
    out["max_tf"] = max_tfs.astype("int64")
    out["blob"] = pd.Series(blobs, dtype=object)
    return out


def tokenize_corpus(
    corpus: DataFrame, specs: list[FieldSpec], with_dl: bool = True
) -> DataFrame:
    """corpus -> (doc_id, field, term, tf) via one vectorized Arrow pass.

    With ``with_dl``, per-(doc, field) token counts are appended as
    postings of the reserved :data:`DL_MARKER` term, so doc lengths ride
    the same single shuffle as the postings merge.
    """
    source_cols = sorted({s.source for s in specs if s.source in corpus.columns})
    narrowed = corpus.select("doc_id", *source_cols)

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tf = analyze_pandas(pdf, specs)
            if with_dl and len(tf):
                dl = (
                    tf.groupby(["doc_id", "field"], sort=False)["tf"]
                    .sum()
                    .rename("tf")
                    .reset_index()
                )
                dl["term"] = DL_MARKER
                tf = pd.concat([tf, dl[["doc_id", "field", "term", "tf"]]], ignore_index=True)
            yield tf

    return narrowed.mapInPandas(analyze, FLAT_SCHEMA)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    specs: list[FieldSpec],
    *,
    doc_id_col: str | None = "doc_id",
    order_cols: list[str] | None = None,
    content_col: str | None = None,
    n_shards: int = 8,
    block_size: int = codec.BLOCK_SIZE,
    num_partitions: int | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    epoch: int = 0,
) -> IndexData:
    """Build one index epoch over ``corpus``.

    ``doc_id_col=None`` assigns rank-stable ids ordered by ``order_cols``.
    ``content_col`` adds the per-row sha256 invariant column
    (BASELINE.json ``input_hint``).
    """
    if doc_id_col is None:
        if not order_cols:
            raise ValueError("need order_cols to assign doc ids")
        corpus = assign_doc_ids(corpus, order_cols, num_partitions)
    elif doc_id_col != "doc_id":
        corpus = corpus.withColumnRenamed(doc_id_col, "doc_id")

    docs = corpus
    if content_col is not None:
        docs = docs.withColumn("sha256", F.sha2(F.col(content_col), 256))

    bounds = docs.agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("max_id")
    ).collect()[0]
    n_docs = int(bounds["n"] or 0)
    max_id = int(bounds["max_id"]) if bounds["max_id"] is not None else -1
    chunk = max(1, math.ceil((max_id + 1) / n_shards))

    flat = tokenize_corpus(corpus, specs).withColumn(
        "shard", F.expr(f"doc_id div {chunk}")
    )

    shuffle_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    merged = (
        flat.repartition(shuffle_parts, "field", "term", "shard")
        .sortWithinPartitions("field", "term", "shard", "doc_id")
        .mapInPandas(_encode_groups(["field", "term", "shard"], block_size), POSTINGS_SCHEMA)
        .withColumn("epoch", F.lit(epoch))
    ).persist()  # postings + doc_lens both read this; avoid double compute

    return index_from_merged(
        spark, specs, merged, docs,
        n_docs=n_docs, chunk=chunk, n_shards=n_shards,
        block_size=block_size, k1=k1, b=b,
    )


def index_from_merged(
    spark: SparkSession,
    specs: list[FieldSpec],
    merged: DataFrame,
    docs: DataFrame,
    *,
    n_docs: int,
    chunk: int,
    n_shards: int,
    block_size: int,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    doc_lens: DataFrame | None = None,
    vocab_source: DataFrame | None = None,
) -> IndexData:
    """Assemble an IndexData from a merged postings frame (in-memory build
    or persisted epochs-union) — vocabulary and stats are derived lazily.
    Persisted indexes pass materialized ``doc_lens``/``vocab_source`` tables
    so queries never scan the postings files for them."""
    postings = merged.filter(F.col("term") != DL_MARKER)
    if doc_lens is None:
        doc_lens = merged.filter(F.col("term") == DL_MARKER).select(
            "field", "shard", F.col("df").alias("n_docs"), "blob", "epoch"
        )

    vocab_base = vocab_source if vocab_source is not None else postings
    vocabulary = vocab_base.groupBy("field", "term").agg(F.sum("df").alias("df")).withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
    )

    # Per-field stats from the (tiny) doc_lens rows: decode each shard blob.
    def dl_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                _, dls = codec.decode_postings(bytes(r["blob"]))
                rows.append(
                    (r["field"], int(dls.size), int(dls.sum()), int(dls.min()) if dls.size else 0)
                )
            yield pd.DataFrame(rows, columns=["field", "n", "total", "mn"])

    stats_schema = StructType(
        [
            StructField("field", StringType()),
            StructField("n", LongType()),
            StructField("total", LongType()),
            StructField("mn", LongType()),
        ]
    )
    stats = (
        doc_lens.mapInPandas(dl_stats, stats_schema)
        .groupBy("field")
        .agg(
            F.sum("n").alias("n_docs"),
            (F.sum("total") / F.sum("n")).alias("avgdl"),
            F.min("mn").alias("mindl"),
            F.sum("total").alias("total_terms"),
        )
    )

    return IndexData(
        spark=spark,
        specs=specs,
        postings=postings,
        vocabulary=vocabulary,
        docs=docs,
        doc_lens=doc_lens,
        stats=stats,
        n_docs=n_docs,
        chunk=chunk,
        n_shards=n_shards,
        block_size=block_size,
        k1=k1,
        b=b,
        vocab_source=vocab_source,
    )
