"""Distributed byte-pair-encoding (BPE) vocabulary learning and encoding.

The classic subword-merge algorithm (Sennrich et al. 2016, public), shaped
for Spark at corpus scale:

* **Word-frequency collapse first.** Pair statistics are identical whether
  counted over the raw corpus or over the DISTINCT-word table weighted by
  word count — so the corpus (10^12 tokens at 100 TB) collapses to the
  distinct-word table (10^7-10^8 rows) before any per-round work.  Every
  round then touches the word table, never the corpus.
* **Pair counting is pure JVM.** Adjacent pairs come from
  ``arrays_zip(slice(seq,1,n-1), slice(seq,2,n-1))`` + explode + one
  map-side-combinable groupBy-sum; the argmax is a 1-row collect.  No
  Python in the counting loop.
* **Merge application is the only Arrow step**, and it runs only on the
  rows that actually CONTAIN the winning pair (a JVM `exists` over the
  zipped neighbours splits the table); untouched words pass through.
* **Bounded lineage.** Each round ends in ``localCheckpoint`` (the
  pointer-jumping discipline of ``dedup.connected_components``), so the
  plan never grows with the merge count.

``learn_bpe`` runs ``n_merges`` rounds (one counting job + one bounded
rewrite per round — the honest cost of the sequential-by-definition merge
order); ``apply_bpe`` encodes text with a learned merge list riding the
UDF closure (ranks table is ``n_merges`` rows — tiny).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

#: end-of-word sentinel (Sennrich et al.'s </w>)
EOW = "</w>"

MERGES_SCHEMA = "rank int, left string, right string, pair_count bigint"


def word_table(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, cnt) — the distinct-word frequency table the learner runs
    on.  One explode + one hash aggregate over the corpus; everything
    after is corpus-size-independent."""
    toks = F.split(F.col(text_col), r"\s+")
    w = docs.select(F.explode(toks).alias("word")).filter(F.col("word") != "")
    if lowercase:
        w = w.select(F.lower(F.col("word")).alias("word"))
    return w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def _init_seqs(words: DataFrame) -> DataFrame:
    """(seq: array<string>, cnt) — each word as its character sequence
    plus the end-of-word sentinel, built JVM-side."""
    chars = F.split(F.col("word"), "")  # one element per character
    return words.select(
        F.concat(chars, F.array(F.lit(EOW))).alias("seq"), F.col("cnt")
    )


def _merge_pair_in_seq(seq: list, left: str, right: str, joined: str) -> list:
    """Greedy left-to-right non-overlapping merge of one adjacent pair —
    the BPE application rule."""
    out = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_count: int = 2,
    words: DataFrame | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the ranked
    merge list ``[(left, right, pair_count), ...]`` (driver-side —
    ``n_merges`` scalars by construction).  Ties break (count desc,
    left asc, right asc) so the result is deterministic.  Stops early
    when the best remaining pair occurs fewer than ``min_pair_count``
    times (weighted by word frequency).

    Pass ``words`` (a ``word_table`` output) to reuse a precomputed
    frequency table across runs."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if words is None:
        words = word_table(docs, text_col=text_col, lowercase=lowercase)
    state = _init_seqs(words).localCheckpoint()
    # the per-round union(changed, unchanged) SUMS partition counts, and
    # localCheckpoint materializes whatever it's handed — without a bound
    # the count doubles every round (8 -> 2^n·8: 260k+ empty tasks by merge
    # 15).  Pin each round's checkpoint back to the starting width.
    n_parts = max(1, state.rdd.getNumPartitions())
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            n1 = F.size("seq") - F.lit(1)
            zipped = F.arrays_zip(
                F.slice("seq", 1, n1).alias("l"),
                F.slice("seq", 2, n1).alias("r"),
            )
            pairs = (
                state.filter(F.size("seq") >= 2)
                .select(F.explode(zipped).alias("p"), "cnt")
                .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("cnt").alias("n"))
            )
            top = pairs.orderBy(
                F.desc("n"), F.asc("l"), F.asc("r")
            ).limit(1).collect()
            if not top or top[0]["n"] < min_pair_count:
                break
            left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
            merges.append((left, right, n))
            joined = left + right

            has_pair = F.exists(
                zipped,
                lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)),
            )
            changed = state.filter(F.size("seq") >= 2).filter(has_pair)
            unchanged = state.filter((F.size("seq") < 2) | ~has_pair)

            def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["seq"] = [
                        _merge_pair_in_seq(list(s), left, right, joined)
                        for s in pdf["seq"]
                    ]
                    yield pdf

            new_state = changed.mapInPandas(
                rewrite, "seq array<string>, cnt bigint"
            ).unionByName(unchanged)
            # truncate lineage each round (plan would otherwise grow with
            # the merge count); release the previous round's blocks
            prev = state
            state = new_state.coalesce(n_parts).localCheckpoint()
            prev.unpersist()
    finally:
        state.unpersist()
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merge list as a (rank, left, right, pair_count) table —
    the at-rest artifact an encoder fleet broadcasts from."""
    rows = [(i, l, r, int(n)) for i, (l, r, n) in enumerate(merges)]
    return spark.createDataFrame(rows, MERGES_SCHEMA)


def _encode_word(word: str, ranks: dict, cache: dict) -> list:
    """Standard BPE encode: repeatedly merge the lowest-rank adjacent
    pair present.  Memoized per distinct word within a batch."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    seq = list(word) + [EOW]
    while len(seq) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            rk = ranks.get((seq[i], seq[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        l, r = seq[best_i], seq[best_i + 1]
        seq = _merge_pair_in_seq(seq, l, r, l + r)
    cache[word] = seq
    return seq


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode ``text_col`` into BPE subword tokens using a learned merge
    list: docs columns + ``out_col: array<string>``.  The ranks table
    (``n_merges`` entries) rides the Arrow UDF closure; per-batch
    distinct-word memoization makes the cost ~O(distinct words), the
    same collapse the learner exploits."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    cols = docs.columns
    if text_col not in cols:
        raise KeyError(f"no column {text_col!r} in {cols}")

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", `{out_col}` array<string>"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            pdf = pdf.copy()
            toks = []
            for text in pdf[text_col]:
                t = (text or "")
                if lowercase:
                    t = t.lower()
                row: list[str] = []
                for w in t.split():
                    row.extend(_encode_word(w, ranks, cache))
                toks.append(row)
            pdf[out_col] = toks
            yield pdf

    return docs.mapInPandas(encode, out_schema)
