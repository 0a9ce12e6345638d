"""Ranked retrieval: boolean combinators + BM25 + block-max pruning.

Re-expresses the reference's query side (SURVEY.md §2.3, §3.2):

* ``And`` leapfrog intersection (``/root/reference/src/query/operators.rs:136-183``)
  -> block-granular skipping via the blob headers (``np.searchsorted`` over
  ``first_doc``) + within-block sorted intersection.  The acknowledged-missing
  "sort operands by length" optimization (``src/query/mod.rs:128``) is
  implemented: AND groups intersect df-ascending.
* ``Combinator {All, Any}`` (``src/query/operators.rs:13-17``) -> per-field
  intersection / union of term doc sets; groups combine by intersection
  (strict AND across analyzed query terms, SURVEY.md §2.4).
* ``ChainingOperator {Must, MustNot, May}`` (``src/query/mod.rs:14-19``,
  ``Query::filter_by`` ``:250-261``) -> semi / anti / score-boost sets.
* ``WeightingOperator`` ranked emission (``src/query/mod.rs:32-177``) ->
  BM25 (k1=1.2, b=0.75) [north-star], deterministic tie-break
  ``(score desc, doc_id asc)``.

Execution shape — ONE Spark job per query:

    postings ⋈ broadcast(query-term metadata) ⋈ broadcast(vocab idf rows)
             ⋈ (field,shard) doc-length blobs
      -> groupBy(shard).applyInPandas(score)   # shard-local candidates+BM25
      -> orderBy(score desc, doc_id).limit(k)  # n_shards*k rows at driver

All per-term metadata (role/group/combinator/weight/idf/avgdl) travels as
broadcast-joined COLUMNS, so there is no per-query driver round trip to the
vocabulary table.  Shards partition the doc-id space, so candidate
generation, filtering, and scoring are all shard-local; "a term unknown to
the index" simply contributes no rows, and an All-group checks its
expected term count per shard (an absent term empties that shard — which
is exactly conjunctive semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from . import codec
from .analysis import QuerySpec
from .build import IndexData

RESULT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def bm25_contrib(tf, dl, idf, avgdl, k1, b):
    """BM25 per-term contribution; formula pinned for oracle parity:
    idf = ln(1 + (N - df + .5)/(df + .5)); tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _decode_overlapping(blobs: list[bytes], lo: int, hi: int):
    """Decode only blocks whose doc range intersects [lo, hi] (seek/skip)."""
    ds, ts = [], []
    for blob in blobs:
        headers = codec.read_headers(blob)
        if headers.size == 0:
            continue
        first = headers["first_doc"]
        upper = np.empty(first.size, dtype=np.int64)
        upper[:-1] = first[1:]
        upper[-1] = np.iinfo(np.int64).max
        mask = (upper > lo) & (first <= hi)
        if mask.any():
            d, t = codec.decode_postings(blob, mask)
            ds.append(d)
            ts.append(t)
    return _merge_sorted(ds, ts)


def _merge_sorted(ds: list[np.ndarray], ts: list[np.ndarray]):
    if not ds:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()
    if len(ds) == 1:
        return ds[0], ts[0]
    d = np.concatenate(ds)
    t = np.concatenate(ts)
    order = np.argsort(d, kind="stable")
    return d[order], t[order]


def _membership(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Positions of needles in sorted haystack; -1 where absent."""
    if haystack.size == 0:
        return np.full(needles.size, -1, dtype=np.int64)
    pos = np.searchsorted(haystack, needles)
    pos[pos >= haystack.size] = haystack.size - 1
    return np.where(haystack[pos] == needles, pos, -1)


class _ShardScorer:
    """Scores one shard: candidate generation, filters, BM25, top-k.

    All query metadata arrives as columns of the matched-postings frame.
    """

    def __init__(self, k1: float, b: float, topk: int | None):
        self.k1 = k1
        self.b = b
        self.topk = topk

    @staticmethod
    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")}
        )

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return self._empty()

        # doc-length lookup per field (decoded once per shard)
        dl_lookup: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for field, grp in pdf.groupby("field", sort=False):
            dl_blob = grp["dl_blob"].iloc[0]
            if dl_blob is not None:
                dl_lookup[field] = codec.decode_postings(bytes(dl_blob))

        # one logical "operand" per (role, group, field, term); shards were
        # merged at build so multiple rows per operand are distinct shards
        # of the same posting list (should not happen within one shard, but
        # concatenation keeps it correct either way)
        decoded: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        blobs_by_term: dict[tuple[str, str], list[bytes]] = {}
        seen_blob: set[tuple] = set()
        operands: dict[tuple, dict] = {}
        for r in pdf.itertuples(index=False):
            key = (r.field, r.term)
            # a term used in several roles arrives once per role; collect
            # its (shard-unique) blob exactly once
            blob_key = (r.field, r.term, int(r.shard))
            if blob_key not in seen_blob:
                seen_blob.add(blob_key)
                blobs_by_term.setdefault(key, []).append(bytes(r.blob))
            op_key = (r.role, int(r.group), r.field, r.term)
            if op_key not in operands:
                operands[op_key] = {
                    "field": r.field,
                    "term": r.term,
                    "role": r.role,
                    "group": int(r.group),
                    "comb": r.comb,
                    "gsize": int(r.gsize),
                    "df": int(r.df_g),
                    "idf": float(r.idf),
                    "weight": float(r.weight),
                    "avgdl": max(float(r.avgdl), 1e-9),
                }

        def decode_full(key):
            if key not in decoded:
                parts = [codec.decode_postings(b) for b in blobs_by_term[key]]
                decoded[key] = _merge_sorted([p[0] for p in parts], [p[1] for p in parts])
            return decoded[key]

        def decode_range(key, lo, hi):
            if key in decoded:
                return decoded[key]
            return _decode_overlapping(blobs_by_term[key], lo, hi)

        # --- candidate generation per group ---------------------------------
        groups: dict[int, dict] = {}
        must: list[dict] = []
        must_not: list[dict] = []
        may: list[dict] = []
        for op in operands.values():
            if op["role"] == "group":
                g = groups.setdefault(op["group"], {"comb": op["comb"],
                                                    "gsize": op["gsize"], "terms": []})
                g["terms"].append(op)
            elif op["role"] == "must":
                must.append(op)
            elif op["role"] == "must_not":
                must_not.append(op)
            elif op["role"] == "may":
                may.append(op)

        # a group or Must filter with no postings in this shard empties it
        first = pdf.iloc[0]
        if len(groups) < int(first["n_groups"]) or len(must) < int(first["n_must"]):
            return self._empty()

        cand: np.ndarray | None = None
        for g in groups.values():
            if g["comb"] == "all" and len(g["terms"]) < g["gsize"]:
                return self._empty()  # a conjunctive term is absent here
            terms = sorted(g["terms"], key=lambda t: t["df"])  # df ascending
            if g["comb"] == "all":
                gset = None
                for op in terms:
                    key = (op["field"], op["term"])
                    if gset is None:
                        gset = decode_full(key)[0]
                    else:
                        d, _ = decode_range(key, int(gset[0]), int(gset[-1]))
                        gset = gset[_membership(d, gset) >= 0]
                    if gset.size == 0:
                        return self._empty()
            else:  # any
                parts = [decode_full((op["field"], op["term"]))[0] for op in terms]
                gset = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
            cand = gset if cand is None else np.intersect1d(cand, gset, assume_unique=True)
            if cand is None or cand.size == 0:
                return self._empty()

        if cand is None:
            return self._empty()

        # --- chained filters (Must / MustNot) --------------------------------
        for op in must:
            d, _ = decode_range((op["field"], op["term"]), int(cand[0]), int(cand[-1]))
            cand = cand[_membership(d, cand) >= 0]
            if cand.size == 0:
                return self._empty()
        for op in must_not:
            d, _ = decode_range((op["field"], op["term"]), int(cand[0]), int(cand[-1]))
            cand = cand[_membership(d, cand) < 0]
            if cand.size == 0:
                return self._empty()

        # --- BM25 scoring ------------------------------------------------------
        scores = np.zeros(cand.size, dtype=np.float64)
        lo, hi = int(cand[0]), int(cand[-1])
        scoring_ops = [op for g in groups.values() for op in g["terms"]] + may
        seen_score: set[tuple[str, str]] = set()
        for op in scoring_ops:
            key = (op["field"], op["term"])
            if key in seen_score:
                continue  # a term repeated across roles scores once
            seen_score.add(key)
            d, t = decode_range(key, lo, hi)
            if d.size == 0:
                continue
            pos = _membership(d, cand)
            hit = pos >= 0
            if not hit.any():
                continue
            tf = t[pos[hit]].astype(np.float64)
            dl_docs, dl_vals = dl_lookup.get(op["field"], (np.zeros(0, np.int64),) * 2)
            if dl_docs.size:
                dpos = _membership(dl_docs, cand[hit])
                dl = np.where(dpos >= 0, dl_vals[np.maximum(dpos, 0)], op["avgdl"]).astype(
                    np.float64
                )
            else:
                dl = np.full(int(hit.sum()), op["avgdl"], dtype=np.float64)
            scores[hit] += op["weight"] * bm25_contrib(
                tf, dl, op["idf"], op["avgdl"], self.k1, self.b
            )

        # --- shard-local top-k -------------------------------------------------
        k = cand.size if self.topk is None else min(self.topk, cand.size)
        # order by (-score, doc_id): lexsort keys are last-key-primary
        order = np.lexsort((cand, -scores))[:k]
        return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})


def _terms_meta_pdf(query: QuerySpec, ratios: dict[str, float]) -> pd.DataFrame | None:
    rows: list[tuple] = []
    n_groups = 0
    for gid, (field, comb, terms) in enumerate(query.groups):
        uniq = list(dict.fromkeys(terms))
        if not uniq:
            continue
        n_groups += 1
        for term in uniq:
            rows.append((field, term, "group", gid, comb, len(uniq),
                         1.0 / ratios.get(field, 1.0)))
    filters = list(dict.fromkeys(query.filters))
    n_must = sum(1 for op, _, _ in filters if op == "must")
    for fid, (op, field, term) in enumerate(filters):
        rows.append((field, term, op, 1000 + fid, "any", 1,
                     1.0 / ratios.get(field, 1.0)))
    if not rows:
        return None
    pdf = pd.DataFrame(
        rows, columns=["field", "term", "role", "group", "comb", "gsize", "weight"]
    )
    # constraint counts: a shard (or index) where a whole group / a Must
    # filter matched no postings must yield NOTHING, not "unconstrained" —
    # the scorer checks these per shard (unknown term -> empty result,
    # src/document_index.rs:145)
    pdf["n_groups"] = n_groups
    pdf["n_must"] = n_must
    return pdf


def search(
    index: IndexData,
    query: QuerySpec,
    k: int | None = 10,
    prune: bool = True,
) -> DataFrame:
    """Run an analyzed query -> DataFrame (doc_id, score), best first.

    Mirrors ``run_query`` (``perlin-derive/src/index_struct.rs:44-68``) with
    BM25 ordering [north-star] and tie-break ``(score desc, doc_id asc)``.
    ``k=None`` returns the full ranked match set (plain sort, no
    takeOrdered buffer — never pass a huge k instead).
    """
    spark = index.spark
    ratios = {s.field: s.term_doc_ratio for s in index.specs}
    for s in index.specs:
        if s.number_field:
            ratios.setdefault(s.number_field, 1.0)

    terms_pdf = _terms_meta_pdf(query, ratios)
    if terms_pdf is None or not any(terms_pdf["role"] == "group"):
        return spark.createDataFrame([], RESULT_SCHEMA)

    stats = index.stats_map()  # collected once per index, then driver-cached
    terms_pdf["avgdl"] = [
        stats.get(f, {"avgdl": 1.0})["avgdl"] for f in terms_pdf["field"]
    ]
    terms_meta = spark.createDataFrame(terms_pdf)

    fields_needed = sorted(set(terms_pdf["field"]))
    # broadcast only the query terms' vocabulary rows, never the full table
    vocab_rows = index.vocabulary.join(
        F.broadcast(terms_meta.select("field", "term").distinct()), ["field", "term"]
    ).select("field", "term", F.col("df").alias("df_g"), "idf")
    matched = (
        index.postings.join(F.broadcast(terms_meta), ["field", "term"])
        .join(F.broadcast(vocab_rows), ["field", "term"])
    )
    # postings and doc_lens share lineage (both views of the build output);
    # re-aliasing every column gives the join fresh ExprIds, avoiding the
    # ambiguous-self-join trap while staying a cheap (field, shard) equi-join
    dls = index.doc_lens.filter(F.col("field").isin(fields_needed)).select(
        F.col("field").alias("dl_field"),
        F.col("shard").alias("dl_shard"),
        F.col("blob").alias("dl_blob"),
    )
    matched = matched.join(
        dls,
        (F.col("field") == F.col("dl_field")) & (F.col("shard") == F.col("dl_shard")),
        "left",
    )

    scorer = _ShardScorer(index.k1, index.b, k)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return scorer(pdf)

    # pre-partition to exactly n_shards so the pandas stage runs one task
    # per shard instead of shuffle.partitions mostly-empty tasks
    result = (
        matched.repartition(index.n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(run, RESULT_SCHEMA)
    )
    out = result.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.limit(k) if k is not None else out
