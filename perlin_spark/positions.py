"""Positional postings — the opt-in sidecar that makes phrase search an
index-only operation.

The reference keeps postings as lazy seekable decoder streams
(``/root/reference/src/query/mod.rs:208-216``); within-document positions
are the natural extension of that machinery and the standard fulltext
answer to phrase queries (Lucene stores them inline per posting).  In a
columnar engine the idiomatic shape is a SIBLING TABLE instead: BM25
scoring never pays position I/O (the hot path's parquet scan does not
even list the column), and phrase verification reads ONLY the phrase
terms' position rows — no scan of the corpus text, which is the 100-TB
defect of rank-then-reanalyze (a high-df phrase re-tokenizes an unbounded
candidate slice per query).

Storage, per ``(field, term, shard)`` group (one row of the sidecar):

* ``blob``      — the standard postings blob (docs + tfs,
  :func:`perlin_spark.codec.encode_postings`): self-contained, so the
  sidecar needs no row-alignment contract with the main postings table.
* ``pos_blob``  — varbyte stream of per-document position deltas, docs in
  blob order, ``tf_d`` values per doc: first value of a doc's run is the
  absolute 0-based rank of the first occurrence in the document's
  SURVIVING token stream for the field (stopword/number-routed tokens do
  not occupy slots — identical to the re-analysis semantics), subsequent
  values are gaps.  Decoding needs only the tfs vector, so partials
  byte-CONCATENATE under the same disjoint-doc-range splice as postings.

Build shape = the postings build verbatim: map-side per-batch partials
(already compressed), ONE term-hash shuffle of blobs, reduce-side splice.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import codec
from .analysis import FieldSpec, analyze_record_batch_positions
from .build import field_name_expr, field_names

#: map-side partial: PARTIAL_SCHEMA + the positions payload
PARTIAL_POS_SCHEMA = StructType(
    [
        StructField("fid", IntegerType()),
        StructField("term", StringType()),
        StructField("shard", LongType()),
        StructField("df", LongType()),
        StructField("first_doc", LongType()),
        StructField("last_doc", LongType()),
        StructField("blob", BinaryType()),
        StructField("pos_blob", BinaryType()),
    ]
)

_MERGED_POS_SCHEMA = StructType(
    [
        StructField("fid", IntegerType()),
        StructField("term", StringType()),
        StructField("shard", LongType()),
        StructField("df", LongType()),
        StructField("blob", BinaryType()),
        StructField("pos_blob", BinaryType()),
    ]
)


def encode_positions(positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode one group's position stream (docs in order, ``tfs[i]``
    ascending positions per doc) as per-doc delta varbyte."""
    pos = np.asarray(positions, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if pos.size == 0:
        return b""
    doc_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    deltas = pos.copy()
    deltas[1:] -= pos[:-1]
    deltas[doc_starts] = pos[doc_starts]  # each doc's first value is absolute
    return codec.varbyte_encode(deltas)


def decode_positions(pos_blob: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions`: absolute positions, aligned
    doc-by-doc with ``tfs`` (``tfs[i]`` values for doc i, ascending)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    flat = codec.varbyte_decode(pos_blob, total)
    if total == 0:
        return flat
    doc_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    out = np.cumsum(flat)
    base = out[doc_starts] - flat[doc_starts]  # cumsum before each doc's run
    out -= np.repeat(base, tfs)
    return out


def tokenize_corpus_positions(
    corpus: DataFrame,
    specs: list[FieldSpec],
    chunk: int,
    min_id: int = 0,
    block_size: int = codec.BLOCK_SIZE,
) -> DataFrame:
    """corpus -> per-batch PARTIAL positional postings (map side).

    Mirrors ``build.tokenize_corpus_partial``: one vectorized Arrow pass
    per batch, per-(fid, term, shard) groups encoded to (blob, pos_blob)
    before the shuffle — only compressed partials move.  No DL marker
    rides along (doc lengths live in the main build)."""
    source_cols = sorted({s.source for s in specs if s.source in corpus.columns})
    narrowed = corpus.select("doc_id", *source_cols)
    fields = field_names(specs)
    fid_of = {f: i for i, f in enumerate(fields)}

    def analyze(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .build import _coalesce_batches

        for batch in _coalesce_batches(batches):
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            for fname, doc_pos, tcodes, term_dict, tfs, pos in (
                analyze_record_batch_positions(batch, specs)
            ):
                fid = fid_of[fname]
                docs = doc_ids[doc_pos]
                shard = (docs - min_id) // chunk
                # regroup so docs ascend within (term, shard): analyzer rows
                # are (tcode, doc_pos) sorted, but external doc ids may be
                # unsorted within a partition
                order = np.lexsort((docs, shard, tcodes))
                if not np.array_equal(order, np.arange(order.size)):
                    # reorder the per-doc position runs along with the rows
                    occ_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
                    take = np.concatenate(
                        [np.arange(occ_starts[i], occ_starts[i] + tfs[i]) for i in order]
                    ) if order.size else np.zeros(0, np.int64)
                    pos = pos[take]
                    docs, tfs = docs[order], tfs[order]
                    shard, tcodes = shard[order], tcodes[order]
                n = docs.size
                change = np.empty(n, dtype=bool)
                change[0] = True
                change[1:] = (tcodes[1:] != tcodes[:-1]) | (shard[1:] != shard[:-1])
                starts = np.flatnonzero(change)
                ends = np.append(starts[1:], n)
                values, offsets = codec.encode_postings_column(
                    docs, tfs, starts, ends, block_size
                )
                blob_arr = pa.Array.from_buffers(
                    pa.binary(), starts.size,
                    [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(values)],
                )
                # positions: ONE varbyte pass over the whole batch, then
                # per-group byte slicing (same trick as the postings column)
                occ_bounds = np.concatenate(([0], np.cumsum(tfs)))
                doc_starts = occ_bounds[:-1]
                deltas = pos.copy()
                deltas[1:] -= pos[:-1]
                deltas[doc_starts] = pos[doc_starts]
                p_buf, p_nbytes = codec._varbyte_encode_arr(deltas)
                p_off = np.concatenate(([0], np.cumsum(p_nbytes)))
                g_lo = p_off[occ_bounds[starts]]
                g_hi = p_off[occ_bounds[ends]]
                pos_off = np.concatenate(([0], np.cumsum(g_hi - g_lo))).astype(np.int32)
                pos_vals = np.concatenate(
                    [p_buf[lo:hi] for lo, hi in zip(g_lo, g_hi)]
                ) if starts.size else np.zeros(0, np.uint8)
                pos_arr = pa.Array.from_buffers(
                    pa.binary(), starts.size,
                    [None, pa.py_buffer(pos_off), pa.py_buffer(pos_vals)],
                )
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(starts.size, fid, dtype=np.int32)),
                        pc.take(term_dict, pa.array(tcodes[starts])),
                        pa.array(shard[starts]),
                        pa.array((ends - starts).astype("int64")),
                        pa.array(docs[starts]),
                        pa.array(docs[ends - 1]),
                        blob_arr,
                        pos_arr,
                    ],
                    names=[f.name for f in PARTIAL_POS_SCHEMA.fields],
                )

    return narrowed.mapInArrow(analyze, PARTIAL_POS_SCHEMA)


def merge_position_partials(
    partials: DataFrame,
    fields: list[str],
    shuffle_parts: int,
    block_size: int,
) -> DataFrame:
    """Term-hash shuffle + reduce-side merge of positional partials.

    Disjoint ascending doc ranges (the common case): postings blobs
    byte-splice and position payloads byte-CONCATENATE — per-doc position
    runs are self-delimiting given the tfs, and the doc order of the
    spliced blob equals the concatenation order.  Overlapping ranges fall
    back to decode + resort + re-encode of both payloads."""

    def merge(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        got = [b for b in batches if len(b)]
        if not got:
            return
        tbl = pa.Table.from_batches(got).combine_chunks()
        n = len(tbl)
        fid = tbl.column("fid").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        shard = tbl.column("shard").to_numpy(zero_copy_only=False)
        denc = tbl.column("term").combine_chunks().dictionary_encode()
        tcodes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        dfs = tbl.column("df").to_numpy(zero_copy_only=False)
        first = tbl.column("first_doc").to_numpy(zero_copy_only=False)
        last = tbl.column("last_doc").to_numpy(zero_copy_only=False)

        order = np.lexsort((first, shard, tcodes, fid))
        fid, shard, tcodes = fid[order], shard[order], tcodes[order]
        dfs, first, last = dfs[order], first[order], last[order]
        take = pa.array(order)
        blobs = pc.take(tbl.column("blob").combine_chunks(), take).to_pylist()
        pos_blobs = pc.take(tbl.column("pos_blob").combine_chunks(), take).to_pylist()

        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (
            (fid[1:] != fid[:-1]) | (shard[1:] != shard[:-1]) | (tcodes[1:] != tcodes[:-1])
        )
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        df_out = np.add.reduceat(dfs, starts)
        overlap = np.zeros(n, dtype=bool)
        overlap[1:] = (first[1:] <= last[:-1]) & ~change[1:]

        out_blobs: list[bytes] = []
        out_pos: list[bytes] = []
        for gi in range(starts.size):
            lo, hi = int(starts[gi]), int(ends[gi])
            if hi - lo == 1:
                out_blobs.append(blobs[lo])
                out_pos.append(pos_blobs[lo])
                continue
            group = blobs[lo:hi]
            if overlap[lo:hi].any():
                parts = [codec.decode_postings(b) for b in group]
                ppos = [
                    decode_positions(pb, p[1]) for pb, p in zip(pos_blobs[lo:hi], parts)
                ]
                d = np.concatenate([p[0] for p in parts])
                t = np.concatenate([p[1] for p in parts])
                pflat = np.concatenate(ppos)
                o = np.argsort(d, kind="stable")
                if d.size > 1:
                    ds = d[o]
                    if (ds[1:] == ds[:-1]).any():
                        dup = int(ds[1:][ds[1:] == ds[:-1]][0])
                        raise ValueError(
                            f"duplicate doc_id {dup} across positional partials"
                        )
                occ_starts = np.concatenate(([0], np.cumsum(t)[:-1]))
                ptake = np.concatenate(
                    [np.arange(occ_starts[i], occ_starts[i] + t[i]) for i in o]
                )
                d, t, pflat = d[o], t[o], pflat[ptake]
                out_blobs.append(codec.encode_postings(d, t, block_size))
                out_pos.append(encode_positions(pflat, t))
            else:
                out_blobs.append(codec.splice_blobs(group))
                out_pos.append(b"".join(pos_blobs[lo:hi]))

        yield pa.RecordBatch.from_arrays(
            [
                pa.array(fid[starts].astype(np.int32)),
                pc.take(denc.dictionary, pa.array(tcodes[starts])),
                pa.array(shard[starts]),
                pa.array(df_out.astype("int64")),
                pa.array(out_blobs, type=pa.binary()),
                pa.array(out_pos, type=pa.binary()),
            ],
            names=["fid", "term", "shard", "df", "blob", "pos_blob"],
        )

    return (
        partials.repartition(shuffle_parts, "fid", "term", "shard")
        .mapInArrow(merge, _MERGED_POS_SCHEMA)
        .withColumn("field", field_name_expr(fields))
        .select("field", "term", "shard", "df", "blob", "pos_blob")
    )


def build_positions(
    corpus: DataFrame,
    specs: list[FieldSpec],
    chunk: int,
    min_id: int = 0,
    *,
    shuffle_parts: int | None = None,
    block_size: int = codec.BLOCK_SIZE,
) -> DataFrame:
    """The full sidecar build: corpus -> merged positional postings
    (field, term, shard, df, blob, pos_blob).  Shard geometry (chunk,
    min_id) MUST match the main index so phrase verification stays
    shard-local with the scorer."""
    spark = corpus.sparkSession
    if shuffle_parts is None:
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    partials = tokenize_corpus_positions(corpus, specs, chunk, min_id, block_size)
    return merge_position_partials(
        partials, field_names(specs), shuffle_parts, block_size
    )


def phrase_match_docs(
    positions: DataFrame,
    field: str,
    terms: list[str],
    buckets: int | None = None,
) -> DataFrame:
    """doc_ids whose ``field`` stream contains ``terms`` ADJACENTLY, from
    the positional sidecar alone — the corpus text is never read.

    Plan: filter the sidecar to the phrase's distinct terms (bucket
    partition pruning + term pushdown reach the parquet scan), group by
    shard, and intersect position sets inside one Arrow pass: an
    occurrence of slot i at position p contributes the key
    ``doc*L + (p - i)``; a phrase start is a key present in EVERY slot's
    set, so matches = reduce(np.intersect1d) — fully vectorized,
    duplicate terms handled by construction (each slot shifts the same
    set differently)."""
    n_slots = len(terms)
    uniq = sorted(set(terms))
    pos = positions.filter(
        (F.col("field") == field) & F.col("term").isin(uniq)
    )
    if buckets is not None and "bucket" in positions.columns:
        from .spark_hash import bucket_of

        need = sorted({bucket_of(field, t, buckets) for t in uniq})
        pos = pos.filter(F.col("bucket").isin(need))
    slot_of_term: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        slot_of_term.setdefault(t, []).append(i)
    n_uniq = len(uniq)

    def verify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        for r in pdf.itertuples(index=False):
            docs, tfs = codec.decode_postings(bytes(r.blob))
            p = decode_positions(bytes(r.pos_blob), tfs)
            per_term.setdefault(r.term, []).append((np.repeat(docs, tfs), p))
        if len(per_term) < n_uniq:  # a term absent in this shard: no match
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        max_pos = max(
            (int(p.max()) for runs in per_term.values() for _, p in runs if p.size),
            default=0,
        )
        L = np.int64(max_pos + n_slots + 1)
        keys = None
        for t, runs in per_term.items():
            d = np.concatenate([x[0] for x in runs])
            p = np.concatenate([x[1] for x in runs])
            for i in slot_of_term[t]:
                ok = p >= i  # a slot-i occurrence below position i can't start a phrase at p-i >= 0
                k = d[ok] * L + (p[ok] - i)
                k = np.unique(k)
                keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
                if keys.size == 0:
                    return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        matched = np.unique(keys // L)
        return pd.DataFrame({"doc_id": matched.astype("int64")})

    return pos.groupBy("shard").applyInPandas(verify, "doc_id long")


def near_keys_match(
    slot_keys: list[np.ndarray], window: int, ordered: bool, L: np.int64
) -> np.ndarray:
    """Core proximity matcher over position KEYS (``doc*L + pos``), shared
    by the sidecar path and the re-analysis fallback.

    ``slot_keys[i]`` = sorted unique keys of slot i's term occurrences.
    ``L`` must exceed ``max_pos + window + 1`` so windows can never bleed
    across the doc boundary (a key in the next doc differs by >= L >
    window) — same-doc checks are then implied by the window arithmetic.

    Unordered: a match START is an occurrence of ANY slot; every slot
    must have an occurrence in ``[start, start + window]``.  Ordered: a
    greedy strictly-increasing chain slot0 < slot1 < ... with total span
    ``<= window`` (greedy earliest-next preserves existence).  Returns
    the matching doc_ids (``key // L``), unique ascending."""
    if any(k.size == 0 for k in slot_keys):
        return np.zeros(0, dtype=np.int64)
    if ordered:
        cur = slot_keys[0]
        start = cur
        for ks in slot_keys[1:]:
            idx = np.searchsorted(ks, cur + 1)
            ok = idx < ks.size  # chains with no later occurrence die here
            cur, start, idx = cur[ok], start[ok], idx[ok]
            if cur.size == 0:
                return np.zeros(0, dtype=np.int64)
            cur = ks[idx]
        hit = cur - start <= window  # cross-doc chains differ by >= L > window
        return np.unique(start[hit] // L)
    starts = np.unique(np.concatenate(slot_keys))
    hit = np.ones(starts.size, dtype=bool)
    for ks in slot_keys:
        idx = np.searchsorted(ks, starts)
        ok = idx < ks.size
        nxt = ks[np.minimum(idx, ks.size - 1)]
        hit &= ok & (nxt <= starts + window)
        if not hit.any():
            return np.zeros(0, dtype=np.int64)
    return np.unique(starts[hit] // L)


def near_match_docs(
    positions: DataFrame,
    field: str,
    terms: list[str],
    window: int,
    ordered: bool = False,
    buckets: int | None = None,
) -> DataFrame:
    """doc_ids whose ``field`` stream contains the query terms within a
    ``window``-token span, from the positional sidecar alone (the span /
    proximity query — Lucene's SpanNearQuery shape).

    Same plan as :func:`phrase_match_docs` (term + bucket pushdown into
    the sidecar scan, shard-local Arrow verification); the matcher is
    :func:`near_keys_match`.  Unordered mode operates on the DISTINCT
    terms (one witness occurrence each, any order); ordered mode keeps
    duplicate slots — each needs its own occurrence at a strictly
    increasing position, so ``ordered=True, window=len(terms)-1`` is
    exactly phrase adjacency."""
    slots = list(terms) if ordered else sorted(set(terms))
    uniq = sorted(set(slots))
    pos = positions.filter((F.col("field") == field) & F.col("term").isin(uniq))
    if buckets is not None and "bucket" in positions.columns:
        from .spark_hash import bucket_of

        need = sorted({bucket_of(field, t, buckets) for t in uniq})
        pos = pos.filter(F.col("bucket").isin(need))
    n_uniq = len(uniq)

    def verify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        for r in pdf.itertuples(index=False):
            docs, tfs = codec.decode_postings(bytes(r.blob))
            p = decode_positions(bytes(r.pos_blob), tfs)
            per_term.setdefault(r.term, []).append((np.repeat(docs, tfs), p))
        if len(per_term) < n_uniq:  # a term absent in this shard: no match
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
        max_pos = max(
            (int(p.max()) for runs in per_term.values() for _, p in runs if p.size),
            default=0,
        )
        L = np.int64(max_pos + window + 2)
        keys_of: dict[str, np.ndarray] = {}
        for t, runs in per_term.items():
            d = np.concatenate([x[0] for x in runs])
            p = np.concatenate([x[1] for x in runs])
            keys_of[t] = np.unique(d * L + p)
        matched = near_keys_match([keys_of[t] for t in slots], window, ordered, L)
        return pd.DataFrame({"doc_id": matched.astype("int64")})

    return pos.groupBy("shard").applyInPandas(verify, "doc_id long")
