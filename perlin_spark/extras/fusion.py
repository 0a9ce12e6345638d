"""Hybrid retrieval: reciprocal-rank fusion of ranked result lists.

A training-data / RAG pipeline retrieves with BOTH lexical BM25 and
embedding ANN and fuses the two rankings; RRF (Cormack et al., SIGIR'09)
is the standard parameter-free fusion: ``score(d) = Σ_runs 1/(K + rank_d)``.

The inputs are already top-k result lists (k rows each, the output of
`PerlinEngine.run_query` / `similarity.*_topk`), so every frame here is
driver-tiny by construction: the single-partition rank windows and the
multi-way outer join cost nothing at any corpus scale — the heavy
lifting happened inside the retrieval operators, which are the scale
paths.  Fixed-point ``rrf_x1e6`` keeps cross-engine comparisons exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: the RRF smoothing constant from the original paper — part of the
#: operator contract, replicated literally in the SQL oracle
RRF_K = 60


def rrf_fuse(
    runs: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = RRF_K,
    topk: int = 10,
) -> DataFrame:
    """(id_col, rrf_x1e6) — reciprocal-rank fusion of named result lists.

    Each run is a DataFrame whose first column is the document id and
    whose SECOND column is its score (higher = better).  Ranks are
    assigned ``row_number() OVER (ORDER BY score DESC, id ASC)`` — the
    deterministic tie-break every oracle in this repo uses.  A document
    missing from a run simply contributes nothing for that run.  Runs
    are folded in sorted-name order so the floating-point sum is
    identical across engines."""
    ranked: list[DataFrame] = []
    for name in sorted(runs):
        df = runs[name]
        score = df.columns[1]
        w = Window.orderBy(F.col(score).desc(), F.col(id_col).asc())
        ranked.append(
            df.select(
                F.col(id_col),
                F.row_number().over(w).alias(f"rank_{name}"),
            )
        )
    fused = ranked[0]
    for r in ranked[1:]:
        fused = fused.join(r, id_col, "full_outer")
    rrf = None
    for name in sorted(runs):
        term = F.coalesce(
            1.0 / (F.lit(k) + F.col(f"rank_{name}")), F.lit(0.0)
        )
        rrf = term if rrf is None else rrf + term
    return (
        fused.select(
            id_col,
            F.floor(rrf * 1_000_000 + F.lit(0.5)).cast("long").alias("rrf_x1e6"),
        )
        .orderBy(F.col("rrf_x1e6").desc(), F.col(id_col).asc())
        .limit(topk)
    )
