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
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
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

#: widest rescore window the per-query closure will carry (64k ids = 512 KB)
RESTRICT_CLOSURE_MAX = 65536


def bm25_contrib(tf, dl, idf, avgdl, k1, b):
    """BM25 per-term contribution; formula pinned for oracle parity:
    idf = ln(1 + (N - df + .5)/(df + .5)); tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def tfidf_contrib(tf, dl, idf):
    """Classic vector-space (Lucene ClassicSimilarity shape) per-term
    contribution, pinned for oracle parity: ``idf^2 * sqrt(tf) /
    sqrt(max(dl, 1))`` — idf squared (query and doc side), sqrt tf
    saturation, 1/sqrt(dl) length norm.  Same idf as BM25's ln form."""
    return idf * idf * np.sqrt(tf) / np.sqrt(np.maximum(dl, 1.0))


#: Dirichlet smoothing mass — Lucene LMDirichletSimilarity's default,
#: pinned (with the formula below) for oracle parity
LMDIR_MU = 2000.0


def lmdir_contrib(tf, dl, pc, mu=LMDIR_MU):
    """LM Dirichlet (Lucene LMDirichletSimilarity shape) per-term
    contribution, pinned for oracle parity:
    ``max(0, ln(1 + tf/(mu*p)) + ln(mu/(dl + mu)))`` with mu=2000 and
    ``p = p(t|C) = cttf/total_terms(field)`` (collection term frequency
    over total field tokens, IndexData.cttf_lookup).  The per-term clamp
    at 0 is Lucene's own choice: it keeps every contribution
    non-negative, so a non-matching term's implicit 0 stays a floor and
    MaxScore's missing-term assumption holds unchanged."""
    safe = np.maximum(np.asarray(pc, dtype=np.float64), 1e-300)
    return np.maximum(0.0, np.log1p(tf / (mu * safe)) + np.log(mu / (dl + mu)))


def sim_contrib(sim, tf, dl, idf, avgdl, k1, b, pc=0.0, mu=LMDIR_MU):
    """Dispatch the per-term contribution by similarity name.  Every
    similarity is monotone in tf and anti-monotone in dl, which is
    exactly what the MaxScore impact bound requires — a new similarity
    must keep that property or disable pruning."""
    if sim == "tfidf":
        return tfidf_contrib(tf, dl, idf)
    if sim == "lmdir":
        return lmdir_contrib(tf, dl, pc, mu)
    return bm25_contrib(tf, dl, idf, avgdl, k1, b)


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

    Query metadata (one op dict per role/group/field/term, plus the group
    and Must counts) ships in the UDF closure — tiny, and it removes two
    broadcast-join exchanges from the per-query plan.  The shard's rows
    carry only storage columns (field, term, shard, epoch, blob, dl_blob).
    """

    def __init__(self, k1: float, b: float, topk: int | None, prune: bool,
                 ops: list[dict], n_groups: int, n_must: int, dl_bc=None,
                 deleted=None, sim: str = "bm25",
                 after: tuple[float, int] | None = None, restrict=None):
        self.k1 = k1
        self.b = b
        self.sim = sim
        self.topk = topk
        self.prune = prune
        self.ops = ops
        self.n_groups = n_groups
        self.n_must = n_must
        if sim == "lmdir":
            # pc defaults to 0.0 at lookup sites; letting a term WITH
            # postings through at pc<=0 would hit lmdir_contrib's 1e-300
            # floor (a bogus ~log(tf)+690 contribution) while
            # _impact_bound simultaneously returns 0 — pruned and
            # exhaustive paths would silently diverge.  Every legitimate
            # caller runs _attach_pc first; fail loudly if a future path
            # forgets it (r5 ADVICE).
            for op in ops:
                if op.get("df", 0) > 0 and op.get("pc", 0.0) <= 0.0:
                    raise ValueError(
                        f"lmdir scoring needs pc > 0 for term "
                        f"{op.get('field')}:{op.get('term')!r} with df="
                        f"{op.get('df')} — was _attach_pc skipped?"
                    )
        #: search_after cursor (score, doc_id): keep only docs STRICTLY
        #: after it in (score desc, doc_id asc) order.  Applied to FINAL
        #: scores only (a partial score underestimates, so masking early
        #: could drop docs that belong on the page), and to the θ seed set
        #: (a before-cursor doc's score must never seed θ — same argument
        #: as the tombstone seed filter below)
        self.after = after
        #: live-docs filter, applied at candidate generation in BOTH
        #: scoring paths so shard-local top-k always refills from live
        #: docs.  Either a sorted int64 array (tests, tiny sets) or —
        #: the serving shape — IndexData.deleted_broadcast(), so tasks
        #: pickle an 8-byte broadcast handle, not the array (r4 ADVICE)
        self._deleted_src = deleted
        #: inclusion twin of ``deleted``: when set (sorted int64 array or a
        #: broadcast of one), ONLY these doc_ids can match — the rescore
        #: window restriction, applied at the same three points as the
        #: tombstone filter so pruning thresholds never come from
        #: out-of-window docs
        self._restrict_src = restrict
        #: once-per-index broadcast {(field, shard): [dl blobs]}; when set,
        #: rows carry no dl_blob column (no per-query broadcast join)
        self.dl_bc = dl_bc

    @property
    def deleted(self):
        d = self._deleted_src
        return d.value if hasattr(d, "value") else d

    @property
    def restrict(self):
        r = self._restrict_src
        return r.value if hasattr(r, "value") else r

    def _after_mask(self, scores: "np.ndarray", doc_ids: "np.ndarray"):
        """Strictly-after-cursor mask in (score desc, doc_id asc) order.
        The cursor is the last row of the previous page AS SERVED, so the
        float equality in the tie arm compares a score against itself
        (identical computation both times) — exact by construction."""
        s, d = self.after
        return (scores < s) | ((scores == s) & (doc_ids > d))

    @staticmethod
    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")}
        )

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return self._empty()

        # doc-length lookup per field (decoded once per shard; a field may
        # have several dl blobs — one per epoch — merge them all)
        dl_lookup: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        if self.dl_bc is not None:
            shard = int(pdf["shard"].iloc[0])
            for field in pdf["field"].unique():
                blobs = self.dl_bc.value.get((field, shard), [])
                if blobs:
                    parts = [codec.decode_postings(b) for b in blobs]
                    dl_lookup[field] = _merge_sorted(
                        [p[0] for p in parts], [p[1] for p in parts]
                    )
        else:
            for field, grp in pdf.groupby("field", sort=False):
                seen: set[bytes] = set()
                ds, ts = [], []
                for dl_blob in grp["dl_blob"]:
                    if dl_blob is None:
                        continue
                    buf = bytes(dl_blob)
                    if buf in seen:
                        continue
                    seen.add(buf)
                    d, t = codec.decode_postings(buf)
                    ds.append(d)
                    ts.append(t)
                if ds:
                    dl_lookup[field] = _merge_sorted(ds, ts)

        # collect each (field, term)'s DISTINCT blobs; a row can be
        # duplicated verbatim by the dl fan-out join (same bytes — keep
        # one), while a storage layer may legitimately hold several blobs
        # under one (field,term,shard,epoch) key (e.g. a compaction that
        # flushed a group in pieces) — those must all be kept and MERGED
        # by _merge_sorted/_decode_overlapping, never dropped.  Operands
        # come from the closure metadata, but only for terms that
        # actually have postings in this shard (absent term => absent
        # operand => conjunctive groups/Must filters empty the shard, the
        # reference's unknown-term semantics, src/document_index.rs:145)
        decoded: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        blobs_by_term: dict[tuple[str, str], list[bytes]] = {}
        seen_blob: set[tuple] = set()
        for r in pdf.itertuples(index=False):
            buf = bytes(r.blob)
            blob_key = (r.field, r.term, int(r.shard), int(r.epoch), buf)
            if blob_key not in seen_blob:
                seen_blob.add(blob_key)
                blobs_by_term.setdefault((r.field, r.term), []).append(buf)
        operands: dict[tuple, dict] = {}
        for op in self.ops:
            if (op["field"], op["term"]) in blobs_by_term:
                operands[(op["role"], op["group"], op["field"], op["term"])] = op

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
                                                    "gsize": op["gsize"],
                                                    "mm": op.get("mm", 1),
                                                    "terms": []})
                g["terms"].append(op)
            elif op["role"] == "must":
                must.append(op)
            elif op["role"] == "must_not":
                must_not.append(op)
            elif op["role"] == "may":
                may.append(op)

        # a group or Must filter with no postings in this shard empties it
        if len(groups) < self.n_groups or len(must) < self.n_must:
            return self._empty()

        # --- block-max MaxScore fast path (pure disjunctive top-k) -----------
        # The WAND-family pruning of the north_star: per-block max_tf headers
        # give impact upper bounds; non-essential posting lists are never
        # fully decoded.  Only safe for a single Any group with no filters.
        if (
            self.prune
            and self.topk is not None
            and len(groups) == 1
            and not must
            and not must_not
            and not may
        ):
            (g,) = groups.values()
            if g["comb"] == "any" and len(g["terms"]) > 1 and g.get("mm", 1) == 1:
                return self._score_maxscore(g["terms"], blobs_by_term, dl_lookup)

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
            else:  # any (with optional minimum-should-match)
                mm = g.get("mm", 1)
                if len(terms) < mm:
                    # fewer group terms PRESENT in this shard than the
                    # floor — no doc here can satisfy the group
                    return self._empty()
                parts = [decode_full((op["field"], op["term"]))[0] for op in terms]
                if mm <= 1:
                    gset = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
                else:
                    # each term's doc list is distinct, so a doc's count
                    # across the concatenation = matched distinct terms
                    uniqd, cnt = np.unique(np.concatenate(parts), return_counts=True)
                    gset = uniqd[cnt >= mm]
            cand = gset if cand is None else np.intersect1d(cand, gset, assume_unique=True)
            if cand is None or cand.size == 0:
                return self._empty()

        if cand is None:
            return self._empty()
        if self.deleted is not None:
            cand = cand[np.isin(cand, self.deleted, invert=True)]
            if cand.size == 0:
                return self._empty()
        if self.restrict is not None:
            cand = cand[np.isin(cand, self.restrict)]
            if cand.size == 0:
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
            scores[hit] += op["weight"] * sim_contrib(
                self.sim, tf, dl, op["idf"], op["avgdl"], self.k1, self.b,
                pc=op.get("pc", 0.0),
            )

        # --- shard-local top-k -------------------------------------------------
        if self.after is not None:
            keep = self._after_mask(scores, cand)
            cand, scores = cand[keep], scores[keep]
            if cand.size == 0:
                return self._empty()
        k = cand.size if self.topk is None else min(self.topk, cand.size)
        # order by (-score, doc_id): lexsort keys are last-key-primary
        order = np.lexsort((cand, -scores))[:k]
        return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})


def _impact_bound(max_tf: float, idf: float, weight: float,
                  mindl: float, avgdl: float, k1: float, b: float,
                  sim: str = "bm25", pc: float = 0.0,
                  mu: float = LMDIR_MU) -> float:
    """Safe upper bound on a term's contribution: tf <= max_tf and each
    similarity is monotone in tf and anti-monotone in dl (dl >= mindl)."""
    if sim == "tfidf":
        return weight * idf * idf * float(np.sqrt(max_tf)) / float(
            np.sqrt(max(mindl, 1.0))
        )
    if sim == "lmdir":
        if pc <= 0.0 or max_tf <= 0.0:
            return 0.0  # a term absent from the collection never matches
        return weight * max(
            0.0,
            float(np.log1p(max_tf / (mu * pc)) + np.log(mu / (mindl + mu))),
        )
    return weight * idf * max_tf * (k1 + 1.0) / (
        max_tf + k1 * (1.0 - b + b * mindl / avgdl)
    )


def _scorer_maxscore(self, terms, blobs_by_term, dl_lookup):
    """MaxScore with block-max bounds; exact top-k, partial decode.

    1. seed θ: fully score the single highest-bound list's docs;
    2. split terms into essential (prefix) / non-essential (suffix with
       cumulative bound < θ);
    3. candidates = union of essential docs; prune each candidate whose
       essential-exact + non-essential-bound < θ; survivors get exact
       non-essential contributions decoded ONLY for blocks whose block-max
       bound could matter and that overlap the survivor range.
    """
    k1, b, sim = self.k1, self.b, self.sim

    def full_bound(op):
        mx = max(
            (int(codec.read_headers(blob)["max_tf"].max())
             for blob in blobs_by_term[(op["field"], op["term"])]
             if codec.read_headers(blob).size),
            default=0,
        )
        return _impact_bound(
            mx, op["idf"], op["weight"], op["mindl"], op["avgdl"], k1, b, sim,
            pc=op.get("pc", 0.0),
        )

    def exact(op, cand):
        d, t = _decode_overlapping(
            blobs_by_term[(op["field"], op["term"])], int(cand[0]), int(cand[-1])
        ) if cand.size else (np.zeros(0, np.int64),) * 2
        out = np.zeros(cand.size, dtype=np.float64)
        if d.size == 0:
            return out
        pos = _membership(d, cand)
        hit = pos >= 0
        if not hit.any():
            return out
        tf = t[pos[hit]].astype(np.float64)
        dl_docs, dl_vals = dl_lookup.get(op["field"], (np.zeros(0, np.int64),) * 2)
        if dl_docs.size:
            dpos = _membership(dl_docs, cand[hit])
            dl = np.where(dpos >= 0, dl_vals[np.maximum(dpos, 0)], op["avgdl"])
        else:
            dl = np.full(int(hit.sum()), op["avgdl"])
        out[hit] = op["weight"] * sim_contrib(
            sim, tf, dl.astype(np.float64), op["idf"], op["avgdl"], k1, b,
            pc=op.get("pc", 0.0),
        )
        return out

    ordered = sorted(terms, key=full_bound, reverse=True)
    bounds = np.array([full_bound(op) for op in ordered])

    # seed θ from the highest-bound list alone (exact over all terms there)
    seed_docs = _merge_sorted(
        *zip(*[codec.decode_postings(bl)
               for bl in blobs_by_term[(ordered[0]["field"], ordered[0]["term"])]])
    )[0]
    if self.deleted is not None:
        # a deleted doc's score must never seed θ: pruning with a
        # threshold the final ranking cannot contain would drop live docs
        seed_docs = seed_docs[np.isin(seed_docs, self.deleted, invert=True)]
    if self.restrict is not None:
        # same argument as the tombstone seed filter: an out-of-window
        # doc's score must never set θ
        seed_docs = seed_docs[np.isin(seed_docs, self.restrict)]
    seed_scores = np.zeros(seed_docs.size, dtype=np.float64)
    for op in ordered:
        seed_scores += exact(op, seed_docs)
    if self.after is not None:
        # a before-cursor doc's score must never seed θ: it cannot appear
        # on this page, so a θ it sets could prune docs that belong here.
        # Seed scores ARE final scores (exact over all terms), so the
        # cursor mask is applicable at seed time.
        mkeep = self._after_mask(seed_scores, seed_docs)
        seed_docs, seed_scores = seed_docs[mkeep], seed_scores[mkeep]
    # θ is a valid pruning threshold only once we HAVE topk scored docs;
    # a shard with fewer seed matches must not prune at all (any of its
    # other matches could still make the global top-k)
    if seed_docs.size >= self.topk:
        theta = np.partition(seed_scores, -self.topk)[-self.topk]
    else:
        theta = 0.0

    # essential prefix: smallest prefix whose complement bound sum < θ
    suffix = np.cumsum(bounds[::-1])[::-1]  # suffix[i] = sum bounds[i:]
    n_ess = len(ordered)
    for i in range(1, len(ordered)):
        if suffix[i] < theta:
            n_ess = i
            break
    essential, nonessential = ordered[:n_ess], ordered[n_ess:]

    cand = np.unique(
        np.concatenate(
            [
                _merge_sorted(
                    *zip(*[codec.decode_postings(bl)
                           for bl in blobs_by_term[(op["field"], op["term"])]])
                )[0]
                for op in essential
            ]
        )
    )
    if self.deleted is not None:
        cand = cand[np.isin(cand, self.deleted, invert=True)]
    if self.restrict is not None:
        cand = cand[np.isin(cand, self.restrict)]
    scores = np.zeros(cand.size, dtype=np.float64)
    for op in essential:
        scores += exact(op, cand)
    ne_bound = float(suffix[n_ess]) if n_ess < len(ordered) else 0.0
    keep = scores + ne_bound >= theta  # strict-drop only when bound < θ
    cand, scores = cand[keep], scores[keep]
    for op in nonessential:
        if cand.size == 0:
            break
        scores += exact(op, cand)

    if self.after is not None:
        keep2 = self._after_mask(scores, cand)
        cand, scores = cand[keep2], scores[keep2]

    k = min(self.topk, cand.size)
    order = np.lexsort((cand, -scores))[:k]
    return pd.DataFrame({"doc_id": cand[order], "score": scores[order]})


_ShardScorer._score_maxscore = _scorer_maxscore


def _query_ops(query: QuerySpec, ratios: dict[str, float],
               boosts: "dict[str, float] | None" = None) -> tuple[list[dict], int, int]:
    """QuerySpec -> (op dicts, n_groups, n_must).  The counts make a shard
    (or index) where a whole group / Must filter matched nothing yield
    NOTHING, not "unconstrained" (unknown term -> empty result,
    src/document_index.rs:145).  ``boosts`` multiplies a term's score
    weight (Lucene's ``term^2``): candidacy is untouched — a boost of 0
    keeps the term matching, contributing nothing."""
    ops: list[dict] = []
    n_groups = 0
    for gid, g in enumerate(query.groups):
        # groups are (field, comb, terms[, min_match]) — the optional 4th
        # element is minimum-should-match for 'any' groups (candidates
        # must match >= that many DISTINCT group terms; 1 = plain any)
        field, comb, terms = g[0], g[1], g[2]
        mm = int(g[3]) if len(g) > 3 else 1
        if mm < 1:
            raise ValueError(f"min_match must be >= 1, got {mm}")
        if mm > 1 and comb != "any":
            raise ValueError("min_match applies to 'any' groups only "
                             "('all' already requires every term)")
        uniq = list(dict.fromkeys(terms))
        if not uniq:
            continue
        n_groups += 1
        for term in uniq:
            boost = boosts.get(term, 1.0) if boosts else 1.0
            ops.append({"field": field, "term": term, "role": "group",
                        "group": gid, "comb": comb, "gsize": len(uniq),
                        "mm": mm,
                        "weight": boost / ratios.get(field, 1.0)})
    filters = list(dict.fromkeys(query.filters))
    n_must = sum(1 for op, _, _ in filters if op == "must")
    for fid, (op, field, term) in enumerate(filters):
        if op == "must_any":
            # expanded Range filter (engine.Range): candidates must hold
            # ANY of these terms — a zero-weight Any group, so the group
            # machinery restricts without perturbing scores.  An EMPTY
            # expansion still counts a group: nothing in the index is in
            # range, so the whole query matches nothing (the unknown-term
            # semantics, src/document_index.rs:145).
            n_groups += 1
            for t in dict.fromkeys(term):
                ops.append({"field": field, "term": t, "role": "group",
                            "group": 2000 + fid, "comb": "any",
                            "gsize": len(term), "weight": 0.0})
            continue
        ops.append({"field": field, "term": term, "role": op,
                    "group": 1000 + fid, "comb": "any", "gsize": 1,
                    "weight": 1.0 / ratios.get(field, 1.0)})
    return ops, n_groups, n_must


def search(
    index: IndexData,
    query: QuerySpec,
    k: int | None = 10,
    prune: bool = True,
    after: tuple[float, int] | None = None,
    boosts: "dict[str, float] | None" = None,
    restrict_ids=None,
) -> DataFrame:
    """Run an analyzed query -> DataFrame (doc_id, score), best first.

    ``after=(score, doc_id)`` — the last row of the previous page — turns
    the call into deep pagination: only docs STRICTLY after the cursor in
    (score desc, doc_id asc) order are returned, and each shard's top-k
    heap stays size k (an OFFSET-style page would buffer offset+k rows
    per shard and collect offset+k per page — at page 1000 of a 10^12-doc
    corpus that is the difference between k rows and a driver OOM).

    Mirrors ``run_query`` (``perlin-derive/src/index_struct.rs:44-68``) with
    BM25 ordering [north-star] and tie-break ``(score desc, doc_id asc)``.
    ``k=None`` returns the full ranked match set (plain sort, no
    takeOrdered buffer — never pass a huge k instead).

    Latency shape — ONE Spark job on the hot path: query metadata (idf,
    weights, group structure) rides the UDF closure instead of broadcast
    joins; doc-length blobs ship once per INDEX via ``dl_broadcast`` (not
    one broadcast-exchange job per query); per-term idf comes from a
    driver-cached vocab lookup (its own tiny job only on cache miss);
    bucket pruning is computed driver-side (spark_hash.py) with no job.
    """
    spark = index.spark
    ratios = {s.field: s.term_doc_ratio for s in index.specs}
    for s in index.specs:
        if s.number_field:
            ratios.setdefault(s.number_field, 1.0)

    ops, n_groups, n_must = _query_ops(query, ratios, boosts=boosts)
    return _execute_ops(index, ops, n_groups, n_must, k=k, prune=prune,
                        after=after, restrict=restrict_ids)


def search_fielded(
    index: IndexData,
    field_terms: list[tuple[str, str, float]],
    k: int | None = 10,
    prune: bool = True,
) -> DataFrame:
    """Field-weighted disjunctive search (BM25F-lite / dismax family):
    ``field_terms`` is ``[(field, term, boost), ...]``; a doc matches if
    ANY pair matches, and scores the sum over its matching pairs of
    ``boost/ratio * idf(field, term) * sim(tf, dl_field)`` — per-field
    document-length normalization and per-field idf, the simplified BM25F
    shape.  One Any group spanning fields, so the plan is the same
    single-stage job as :func:`search` (MaxScore fast path included — the
    scorer and its block-max bounds are already per-op field-aware)."""
    ratios = {s.field: s.term_doc_ratio for s in index.specs}
    for s in index.specs:
        if s.number_field:
            ratios.setdefault(s.number_field, 1.0)
    uniq: dict[tuple[str, str], float] = {}
    for field, term, boost in field_terms:
        # a pair repeated across boosts scores once, at its max boost
        uniq[(field, term)] = max(uniq.get((field, term), 0.0), float(boost))
    ops = [
        {"field": f, "term": t, "role": "group", "group": 0, "comb": "any",
         "gsize": len(uniq), "weight": b / ratios.get(f, 1.0)}
        for (f, t), b in uniq.items()
    ]
    return _execute_ops(index, ops, 1 if ops else 0, 0, k=k, prune=prune)


def _attach_pc(index: IndexData, ops: list[dict], stats: dict) -> None:
    """Enrich ops with ``pc = p(t|C)`` for the LM-Dirichlet similarity:
    collection term frequency (driver-cached ``cttf_lookup``, one tiny
    pushdown-filtered decode job per batch of unseen terms — the vocab
    lookup's cost shape) over the field's exact total token count
    (already in the stats frame, collected once per index)."""
    pairs = sorted({(op["field"], op["term"]) for op in ops})
    cttf = index.cttf_lookup(pairs)
    for op in ops:
        total = float(stats.get(op["field"], {}).get("total_terms", 0))
        op["pc"] = (
            cttf[(op["field"], op["term"])] / total if total > 0 else 0.0
        )


def _execute_ops(
    index: IndexData,
    ops: list[dict],
    n_groups: int,
    n_must: int,
    k: int | None,
    prune: bool,
    after: tuple[float, int] | None = None,
    restrict=None,
) -> DataFrame:
    """Shared execution tail: op metadata enrichment (driver-cached vocab +
    stats), bucket-pruned postings scan, shard-grouped Arrow scorer, global
    top-k — ONE single-stage Spark job on the serving layout."""
    spark = index.spark
    if not any(op["role"] == "group" for op in ops):
        return spark.createDataFrame([], RESULT_SCHEMA)

    stats = index.stats_map()  # collected once per index, then driver-cached
    pairs = sorted({(op["field"], op["term"]) for op in ops})
    vocab = index.vocab_lookup(pairs)  # driver-cached (df_g, idf) per term
    for op in ops:
        df_g, idf = vocab[(op["field"], op["term"])]
        st = stats.get(op["field"], {"avgdl": 1.0, "mindl": 0})
        op["df"] = df_g
        op["idf"] = idf
        op["avgdl"] = max(float(st["avgdl"]), 1e-9)
        op["mindl"] = max(float(st["mindl"]), 0.0)
    if getattr(index, "similarity", "bm25") == "lmdir":
        _attach_pc(index, ops, stats)

    fields_needed = sorted({f for f, _ in pairs})
    postings = index.postings
    if index.buckets:
        # static partition pruning: the query terms' bucket values come
        # from a driver-side replica of Spark's murmur3 (spark_hash.py,
        # parity-tested) — no extra Spark job on the latency path
        from .spark_hash import bucket_of

        need = sorted({bucket_of(f, t, index.buckets) for f, t in pairs})
        postings = postings.filter(F.col("bucket").isin(need))
    by_field: dict[str, list[str]] = {}
    for f, t in pairs:
        by_field.setdefault(f, []).append(t)
    cond = None
    for f, terms in by_field.items():
        c = (F.col("field") == f) & F.col("term").isin(terms)
        cond = c if cond is None else (cond | c)
    matched = postings.filter(cond).select("field", "term", "shard", "epoch", "blob")
    dl_bc = index.dl_broadcast()
    if dl_bc is None:
        # fallback for indexes whose dl blobs exceed the broadcast cap:
        # postings and doc_lens share lineage (both views of the build
        # output); re-aliasing every column gives the join fresh ExprIds,
        # avoiding the ambiguous-self-join trap while staying a cheap
        # (field, shard) equi-join
        dls = index.doc_lens.filter(F.col("field").isin(fields_needed)).select(
            F.col("field").alias("dl_field"),
            F.col("shard").alias("dl_shard"),
            F.col("blob").alias("dl_blob"),
        )
        matched = matched.join(
            F.broadcast(dls),
            (F.col("field") == F.col("dl_field")) & (F.col("shard") == F.col("dl_shard")),
            "left",
        )

    sim = getattr(index, "similarity", "bm25")
    if sim not in ("bm25", "tfidf", "lmdir"):
        raise ValueError(f"unknown similarity {sim!r} (bm25 | tfidf | lmdir)")
    if after is not None:
        # guard the (score, doc_id) order: doc_id must be integral — a
        # swapped (doc_id, score) cursor would otherwise truncate silently
        # and return already-served pages forever
        if float(after[1]) != int(after[1]):
            raise ValueError(
                f"after cursor is (score, doc_id); got non-integral "
                f"doc_id {after[1]!r} — did you swap the pair?"
            )
        after = (float(after[0]), int(after[1]))
    if restrict is not None:
        # rescore-window inclusion set: per-QUERY and k-row-sized by
        # construction (it is a top-window of a previous search), so it
        # rides the UDF closure like the op metadata.  The cap keeps a
        # misuse (passing a whole corpus) from silently shipping MBs with
        # every task — at that size the caller wants a join, not rescore.
        restrict = np.asarray(sorted(int(d) for d in restrict), dtype=np.int64)
        if restrict.size > RESTRICT_CLOSURE_MAX:
            raise ValueError(
                f"restrict_ids has {restrict.size} ids (cap "
                f"{RESTRICT_CLOSURE_MAX}): a window this wide is not a "
                "rescore — score the full set and join instead"
            )
    scorer = _ShardScorer(
        index.k1, index.b, k, prune, ops, n_groups, n_must, dl_bc=dl_bc,
        deleted=index.deleted_broadcast(), sim=sim, after=after,
        restrict=restrict,
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return scorer(pdf)

    # Serving layout (IndexData.cache): postings cached pre-partitioned by
    # shard means groupBy("shard") is ALREADY clustered — no exchange, so
    # the whole search (scan -> filter -> score -> TakeOrderedAndProject)
    # is ONE single-stage Spark job.  Without the layout (uncached /
    # freshly loaded index), pre-partition to exactly n_shards so the
    # pandas stage runs one task per shard instead of shuffle.partitions
    # mostly-empty tasks.
    if not index._shard_layout:
        matched = matched.repartition(index.n_shards, "shard")
    result = matched.groupBy("shard").applyInPandas(run, RESULT_SCHEMA)
    # k-row result: TakeOrderedAndProject folds into the scoring job (each
    # shard emits <= k rows, the driver merges) — no extra sort job
    out = result.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.limit(k) if k is not None else out


MULTI_RESULT_SCHEMA = StructType(
    [
        StructField("query_id", StringType()),
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def search_many(
    index: IndexData,
    queries: dict[str, QuerySpec],
    k: int | None = 10,
    prune: bool = True,
) -> DataFrame:
    """Batch retrieval: score MANY analyzed queries in ONE Spark job ->
    (query_id, doc_id, score), per-query ``(score desc, doc_id asc)``
    top-k.  The offline shape for training-data pipelines (BM25
    hard-negative mining, retrieval-based decontamination, relevance
    eval sweeps): amortizes the per-job latency floor across the whole
    query set instead of paying it per query.

    Plan: ONE postings scan filtered to the union of every query's terms
    (bucket pruning over the union), one shard-grouped Arrow stage that
    runs each query's independent scorer against the shard's rows (shard-
    local top-k per query — a query's terms absent from a shard cost
    nothing), then a per-query window head over the n_shards*k*|queries|
    survivor rows.  Queries whose analysis produced no group ops yield no
    rows (the unknown-term/empty-query contract)."""
    spark = index.spark
    sim = getattr(index, "similarity", "bm25")
    if sim not in ("bm25", "tfidf", "lmdir"):
        raise ValueError(f"unknown similarity {sim!r} (bm25 | tfidf | lmdir)")
    ratios = {s.field: s.term_doc_ratio for s in index.specs}
    for s in index.specs:
        if s.number_field:
            ratios.setdefault(s.number_field, 1.0)

    per_q: dict[str, tuple[list[dict], int, int]] = {}
    all_pairs: set[tuple[str, str]] = set()
    for qid, spec in queries.items():
        ops, n_groups, n_must = _query_ops(spec, ratios)
        if not any(op["role"] == "group" for op in ops):
            continue
        per_q[str(qid)] = (ops, n_groups, n_must)
        all_pairs |= {(op["field"], op["term"]) for op in ops}
    if not per_q:
        return spark.createDataFrame([], MULTI_RESULT_SCHEMA)

    stats = index.stats_map()
    pairs = sorted(all_pairs)
    vocab = index.vocab_lookup(pairs)
    for ops, _, _ in per_q.values():
        for op in ops:
            df_g, idf = vocab[(op["field"], op["term"])]
            st = stats.get(op["field"], {"avgdl": 1.0, "mindl": 0})
            op["df"] = df_g
            op["idf"] = idf
            op["avgdl"] = max(float(st["avgdl"]), 1e-9)
            op["mindl"] = max(float(st["mindl"]), 0.0)
    if sim == "lmdir":
        for ops, _, _ in per_q.values():
            _attach_pc(index, ops, stats)

    fields_needed = sorted({f for f, _ in pairs})
    postings = index.postings
    if index.buckets:
        from .spark_hash import bucket_of

        need = sorted({bucket_of(f, t, index.buckets) for f, t in pairs})
        postings = postings.filter(F.col("bucket").isin(need))
    by_field: dict[str, list[str]] = {}
    for f, t in pairs:
        by_field.setdefault(f, []).append(t)
    cond = None
    for f, terms in by_field.items():
        c = (F.col("field") == f) & F.col("term").isin(terms)
        cond = c if cond is None else (cond | c)
    matched = postings.filter(cond).select("field", "term", "shard", "epoch", "blob")
    dl_bc = index.dl_broadcast()
    if dl_bc is None:
        dls = index.doc_lens.filter(F.col("field").isin(fields_needed)).select(
            F.col("field").alias("dl_field"),
            F.col("shard").alias("dl_shard"),
            F.col("blob").alias("dl_blob"),
        )
        matched = matched.join(
            F.broadcast(dls),
            (F.col("field") == F.col("dl_field")) & (F.col("shard") == F.col("dl_shard")),
            "left",
        )

    deleted = index.deleted_broadcast()
    scorers = [
        (qid, _ShardScorer(index.k1, index.b, k, prune, ops, n_groups, n_must,
                           dl_bc=dl_bc, deleted=deleted, sim=sim))
        for qid, (ops, n_groups, n_must) in per_q.items()
    ]

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for qid, sc in scorers:
            r = sc(pdf)  # each scorer ignores rows of other queries' terms
            if len(r):
                r = r.copy()
                r.insert(0, "query_id", qid)
                outs.append(r)
        if not outs:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=object),
                 "doc_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return pd.concat(outs, ignore_index=True)

    if not index._shard_layout:
        matched = matched.repartition(index.n_shards, "shard")
    scored = matched.groupBy("shard").applyInPandas(run, MULTI_RESULT_SCHEMA)
    if k is None:
        return scored.orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    # per-query head over shard-local top-k survivors: <= n_shards*k rows
    # per query reach the window, so the partitionBy shuffle is tiny
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )
