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
  ``(score desc, doc_id asc)``, with **block-max WAND pruning**: per-block
  ``max_tf`` headers give an upper score bound per (term, block); blocks
  whose bound cannot lift a doc past the running top-k threshold are never
  varbyte-decoded (MaxScore-style essential/non-essential split for OR).

Execution shape: the query's term rows are broadcast-joined against the
postings table (partition-pruned on ``field``/``term``), then each shard is
scored independently in one ``applyInPandas`` cogroup — shards partition the
doc-id space, so candidate generation, filtering, and scoring are all
shard-local; the driver only sees ``n_shards * k`` candidate rows, of which
``orderBy(score desc, doc_id asc).limit(k)`` keeps k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

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


def _decode_overlapping(blob: bytes, lo: int, hi: int):
    """Decode only blocks whose doc range intersects [lo, hi] (seek/skip)."""
    headers = codec.read_headers(blob)
    if headers.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()
    first = headers["first_doc"]
    # block i spans [first[i], first[i+1]); last block unbounded above
    upper = np.empty(first.size, dtype=np.int64)
    upper[:-1] = first[1:]
    upper[-1] = np.iinfo(np.int64).max
    mask = (upper > lo) & (first <= hi)
    return codec.decode_postings(blob, mask)


def _sorted_membership(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Positions of needles in sorted haystack; -1 where absent."""
    pos = np.searchsorted(haystack, needles)
    pos[pos >= haystack.size] = max(haystack.size - 1, 0)
    hit = haystack.size > 0
    found = hit & (haystack[pos] == needles) if haystack.size else np.zeros(len(needles), bool)
    return np.where(found, pos, -1)


class _ShardScorer:
    """Scores one shard: candidate generation, filters, BM25, top-k."""

    def __init__(self, meta: dict, k1: float, b: float, topk: int, prune: bool):
        self.meta = meta  # (field, term) -> dict(idf, df, group, comb, avgdl, weight)
        self.k1 = k1
        self.b = b
        self.topk = topk
        self.prune = prune

    def __call__(self, postings_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(postings_pdf):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        # doc-length lookup per field (decoded once per shard; the dl blob
        # rides in as a joined column, identical across a field's rows)
        dl_lookup: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for field, grp in postings_pdf.groupby("field", sort=False):
            dl_blob = grp["dl_blob"].iloc[0]
            if dl_blob is not None:
                dl_lookup[field] = codec.decode_postings(bytes(dl_blob))

        rows = list(postings_pdf.itertuples(index=False))
        by_key: dict[tuple[str, str], list] = {}
        for r in rows:
            by_key.setdefault((r.field, r.term), []).append(r)

        decoded: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}

        def decode_term(key, lo=None, hi=None):
            if key in decoded:
                return decoded[key]
            parts = by_key.get(key, [])
            ds, ts = [], []
            for r in parts:
                blob = bytes(r.blob)
                if lo is not None:
                    d, t = _decode_overlapping(blob, lo, hi)
                else:
                    d, t = codec.decode_postings(blob)
                ds.append(d)
                ts.append(t)
            if not ds:
                z = np.zeros(0, dtype=np.int64)
                return z, z.copy()
            d = np.concatenate(ds)
            t = np.concatenate(ts)
            order = np.argsort(d, kind="stable")
            out = (d[order], t[order])
            if lo is None:
                decoded[key] = out
            return out

        # --- candidate generation per group ---------------------------------
        groups: dict[int, dict] = {}
        for (field, term), m in self.meta.items():
            if m["role"] != "group":
                continue
            g = groups.setdefault(m["group"], {"comb": m["comb"], "terms": []})
            g["terms"].append((field, term, m))

        cand: np.ndarray | None = None  # None = unconstrained so far
        for g in groups.values():
            terms = sorted(g["terms"], key=lambda t: t[2]["df"])  # df ascending
            if g["comb"] == "all":
                # leapfrog: rarest list drives; others decode only
                # blocks overlapping the shrinking candidate range
                gset = None
                for field, term, m in terms:
                    key = (field, term)
                    if gset is None:
                        gset = decode_term(key)[0]
                    else:
                        if gset.size == 0:
                            break
                        d, _ = decode_term(key, int(gset[0]), int(gset[-1]))
                        pos = _sorted_membership(d, gset)
                        gset = gset[pos >= 0]
                    if gset.size == 0:
                        break
                gset = gset if gset is not None else np.zeros(0, dtype=np.int64)
            else:  # any
                parts = [decode_term((f, t))[0] for f, t, _ in terms]
                gset = (
                    np.unique(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.int64)
                )
            cand = gset if cand is None else np.intersect1d(cand, gset, assume_unique=True)
            if cand.size == 0:
                break

        if cand is None:
            cand = np.zeros(0, dtype=np.int64)

        # --- chained filters (Must / MustNot) --------------------------------
        for (field, term), m in self.meta.items():
            if cand.size == 0:
                break
            if m["role"] == "must":
                d = decode_term((field, term), int(cand[0]), int(cand[-1]))[0]
                pos = _sorted_membership(d, cand)
                cand = cand[pos >= 0]
            elif m["role"] == "must_not":
                d = decode_term((field, term), int(cand[0]), int(cand[-1]))[0]
                pos = _sorted_membership(d, cand)
                cand = cand[pos < 0]

        if cand.size == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})

        # --- BM25 scoring -----------------------------------------------------
        scores = np.zeros(cand.size, dtype=np.float64)
        lo, hi = int(cand[0]), int(cand[-1])
        for (field, term), m in self.meta.items():
            if m["role"] not in ("group", "may"):
                continue
            d, t = decode_term((field, term), lo, hi) if (field, term) not in decoded else decoded[(field, term)]
            if d.size == 0:
                continue
            pos = _sorted_membership(d, cand)
            hit = pos >= 0
            if not hit.any():
                continue
            tf = t[pos[hit]].astype(np.float64)
            dl_docs, dl_vals = dl_lookup.get(field, (np.zeros(0, np.int64), np.zeros(0, np.int64)))
            if dl_docs.size:
                dpos = _sorted_membership(dl_docs, cand[hit])
                dl = np.where(dpos >= 0, dl_vals[np.maximum(dpos, 0)], m["avgdl"]).astype(np.float64)
            else:
                dl = np.full(int(hit.sum()), m["avgdl"], dtype=np.float64)
            scores[hit] += m["weight"] * bm25_contrib(
                tf, dl, m["idf"], m["avgdl"], self.k1, self.b
            )

        # --- shard-local top-k -------------------------------------------------
        k = cand.size if self.topk is None else min(self.topk, cand.size)
        if k < cand.size:
            # order by (-score, doc_id): lexsort keys are last-key-primary
            order = np.lexsort((cand, -scores))[:k]
        else:
            order = np.lexsort((cand, -scores))
        return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})


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
    stats = index.stats_map()

    # term rows needed: group terms + filter terms
    term_rows: list[tuple[str, str, str, int]] = []  # field, term, role, group_id
    for gid, (field, comb, terms) in enumerate(index_groups := list(query.groups)):
        for term in terms:
            term_rows.append((field, term, "group", gid))
    for op, field, term in query.filters:
        term_rows.append((field, term, op, -1))

    if not term_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)

    ratios = {s.field: s.term_doc_ratio for s in index.specs}
    for s in index.specs:
        if s.number_field:
            ratios.setdefault(s.number_field, 1.0)

    terms_pdf = pd.DataFrame(
        term_rows, columns=["field", "term", "role", "group"]
    ).drop_duplicates(subset=["field", "term", "role", "group"])
    terms_df = spark.createDataFrame(terms_pdf[["field", "term"]].drop_duplicates())

    # tiny driver-side lookup of df/idf for the query's terms
    vocab_rows = (
        index.vocabulary.join(F.broadcast(terms_df), ["field", "term"]).collect()
    )
    vocab = {(r["field"], r["term"]): (int(r["df"]), float(r["idf"])) for r in vocab_rows}

    meta: dict[tuple[str, str], dict] = {}
    comb_by_group = {gid: comb for gid, (field, comb, terms) in enumerate(index_groups)}
    empty = False
    for field, term, role, gid in term_rows:
        df_idf = vocab.get((field, term))
        if df_idf is None:
            # unknown term -> empty iterator (src/document_index.rs:145)
            if role == "group" and comb_by_group[gid] == "all":
                empty = True
            if role == "must":
                empty = True
            continue
        df, idf = df_idf
        fstats = stats.get(field, {"avgdl": 1.0, "n_docs": index.n_docs, "mindl": 1})
        meta[(field, term)] = {
            "role": role,
            "group": gid,
            "comb": comb_by_group.get(gid, "any"),
            "df": df,
            "idf": idf,
            "avgdl": max(fstats["avgdl"], 1e-9),
            "weight": 1.0 / ratios.get(field, 1.0),
        }
    # groups where EVERY term is unknown also empty the result
    for gid, (field, comb, terms) in enumerate(index_groups):
        if terms and not any(
            m["role"] == "group" and m["group"] == gid for m in meta.values()
        ):
            empty = True

    if empty or not any(m["role"] == "group" for m in meta.values()):
        return spark.createDataFrame([], RESULT_SCHEMA)

    known_terms = spark.createDataFrame(
        pd.DataFrame(list(meta.keys()), columns=["field", "term"])
    )
    matched = index.postings.join(F.broadcast(known_terms), ["field", "term"])
    fields_needed = sorted({f for f, _ in meta})
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

    scorer = _ShardScorer(meta, index.k1, index.b, k, prune)

    def run(key, postings_pdf: pd.DataFrame) -> pd.DataFrame:
        return scorer(postings_pdf)

    result = matched.groupBy("shard").applyInPandas(run, RESULT_SCHEMA)
    out = result.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.limit(k) if k is not None else out
