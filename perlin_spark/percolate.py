"""Reverse search — the Lucene/Elasticsearch *percolator*.

Forward search asks "which docs match this query"; percolation asks
"which REGISTERED QUERIES match this doc" — the alerting / saved-search
/ routing primitive (a user saves `hash join sort`, every new document
that matches fires their alert).

The reference has no percolator; this is a beyond-reference operator in
the spirit of its query machinery (``/root/reference/src/query/mod.rs``
term-set candidacy) run inside-out.  Spark-first shape:

* queries AND docs are analyzed by the SAME pipeline code the index
  build runs (``analysis.analyze_pandas`` — one semantic source, the
  query_pipeline! parity rule, ``/root/reference/src/lib.rs`` pipeline
  reuse), each as one Arrow batch pass;
* matching is ONE term equi-join + a distinct-term count per
  (doc, query) — the minimum_should_match candidacy shape — so the
  whole operator is two narrow analysis passes and one shuffle keyed by
  term;
* the registered-query side is broadcast by default (saved-search sets
  are tiny next to a document stream); pass ``broadcast_queries=False``
  for query sets past executor memory and the same plan runs as a
  shuffle join.

At 100 TB the document side is the stream: percolation cost is linear
in NEW docs only (use :func:`percolate` inside ``foreachBatch`` — each
micro-batch analyzes and joins just its own rows; see
``tests/test_streaming.py::test_percolate_stream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .analysis import FieldSpec


def analyzed_term_pairs(
    rows: DataFrame, spec: FieldSpec, id_col: str = "doc_id"
) -> DataFrame:
    """DISTINCT ``(id_col, term)`` pairs of ``rows[spec.source]`` run
    through the build analyzer (tokenizer + filters of ``spec``) — one
    Arrow batch pass, no collect.  The set-membership primitive shared by
    percolation's both sides."""
    return _term_pairs(rows, spec, id_col).distinct()


def _term_pairs(
    rows: DataFrame, spec: FieldSpec, id_col: str,
    term_filter: frozenset | None = None,
) -> DataFrame:
    """``(id_col, term)`` pairs, distinct PER INPUT ROW only: every row's
    terms are deduplicated inside its Arrow batch, so when ``id_col`` is
    unique in ``rows`` (the percolator's contract for both sides) the
    output is already globally distinct and the extra exchange that
    :func:`analyzed_term_pairs` pays for the general case is unnecessary
    — :func:`percolate` consumes this form directly (r6: one full
    (doc, term) shuffle removed from the alerting hot path).

    ``term_filter`` (a frozenset of terms, shipped in the closure) drops
    all other terms INSIDE the Arrow pass, before anything crosses the
    Python→JVM boundary: the membership test runs once per DISTINCT term
    of the batch (the analyzer's dictionary), not per (doc, term) row."""
    src = spec.source
    field = spec.field

    def gen(batches):
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from .analysis import analyze_record_batch

        flt = (
            _pa.array(sorted(term_filter), type=_pa.string())
            if term_filter is not None
            else None
        )
        for batch in batches:
            if len(batch) == 0:
                continue
            ids = batch.column(id_col)
            # the analyzer's tf rows are exactly one row per (doc, term)
            # — the per-row distinct pairs — so no pandas round-trip and
            # no drop_duplicates is needed
            for fname, doc_pos, tcodes, term_dict, _tfs in analyze_record_batch(
                batch, [spec], doc_id_col=id_col
            ):
                if fname != field or not len(tcodes):
                    continue
                if flt is not None:
                    # dictionary-level membership: one is_in over the
                    # batch's unique terms, then a row mask via take
                    dmask = _np.asarray(
                        _pc.is_in(term_dict, value_set=flt).fill_null(False)
                    )
                    rmask = dmask[_np.asarray(tcodes)]
                    if not rmask.any():
                        continue
                    doc_pos = _np.asarray(doc_pos)[rmask]
                    tcodes = _np.asarray(tcodes)[rmask]
                yield _pa.RecordBatch.from_arrays(
                    [
                        ids.take(_pa.array(doc_pos)),
                        _pc.take(term_dict, _pa.array(tcodes)),
                    ],
                    names=[id_col, "term"],
                )

    return rows.select(id_col, src).mapInArrow(
        gen, schema=f"{id_col} long, term string"
    )


def percolate(
    queries: DataFrame,
    docs: DataFrame,
    spec: FieldSpec,
    min_match: int | None = None,
    broadcast_queries: bool = True,
    id_col: str = "doc_id",
    query_col: str = "query",
) -> DataFrame:
    """(doc_id, query_id, n_matched, n_terms) — every registered query
    that matches each document.

    ``queries`` is ``(query_id long, query string)``; ``docs`` carries
    ``id_col`` + ``spec.source``.  Both sides are analyzed by the SAME
    pipeline spec, then matched on distinct terms:

    * ``min_match=None`` (default) — conjunctive: the doc must contain
      EVERY analyzed term of the query (the ES percolator's match-query
      AND semantics);
    * ``min_match=m`` — the doc must contain at least ``m`` DISTINCT
      query terms (``m=1`` is pure OR).

    A query whose text analyzes to zero terms matches nothing (it has no
    term to witness; ES's match-all percolation is a different register —
    add a catch-all term upstream if that's wanted).  Deterministic
    ordering: doc_id, query_id.

    Both sides' ``(id, term)`` pairs come out of the analyzer already
    distinct per id (each row is analyzed whole inside one Arrow batch),
    so the matcher counts plain rows — no distinct exchange and no
    two-phase countDistinct on the document stream (r6: the former plan
    paid a full (doc, term) shuffle plus a distinct-aggregate expand
    before the broadcast join; this one joins straight out of the
    analyzer and shuffles only the per-(doc, query) counts)."""
    if min_match is not None and min_match < 1:
        raise ValueError("min_match must be >= 1 (or None for ALL terms)")
    if broadcast_queries:
        # the broadcast contract already says the saved-query side is
        # tiny, so it can be analyzed ON THE DRIVER with the exact same
        # analyzer (one pyarrow batch through analyze_record_batch — the
        # semantic source both the index build and the doc side use):
        # the query-term set then ships in the doc analyzer's closure so
        # non-query terms never cross the Python→JVM boundary (guide
        # §2.3 — the join would drop them anyway, but only after paying
        # Arrow transfer + hash probes for the whole corpus vocabulary),
        # and the pair/size tables become literal local relations (zero
        # Spark jobs for the query side; the former plan re-ran its
        # analysis pass once per broadcast build)
        import pyarrow as _pa

        from .analysis import analyze_record_batch

        raw = queries.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col(query_col).cast("string").alias(spec.source),
        ).collect()
        spark = docs.sparkSession
        batch = _pa.RecordBatch.from_arrays(
            [
                _pa.array([r["query_id"] for r in raw], type=_pa.int64()),
                _pa.array([r[spec.source] for r in raw], type=_pa.string()),
            ],
            names=["query_id", spec.source],
        )
        qrows: list[tuple[int, str]] = []
        if len(batch):
            for fname, doc_pos, tcodes, term_dict, _tfs in analyze_record_batch(
                batch, [spec], doc_id_col="query_id"
            ):
                if fname != spec.field or not len(tcodes):
                    continue
                qids = batch.column("query_id").take(_pa.array(doc_pos)).to_pylist()
                terms = term_dict.take(_pa.array(tcodes)).to_pylist()
                qrows.extend(zip(qids, terms))
        if not qrows:
            return spark.createDataFrame(
                [], f"{id_col} long, query_id long, n_matched long, n_terms long"
            )
        term_set = frozenset(t for _, t in qrows)
        sizes: dict[int, int] = {}
        for qid, _ in qrows:
            sizes[qid] = sizes.get(qid, 0) + 1
        q_side = F.broadcast(
            spark.createDataFrame(qrows, "query_id long, term string")
        )
        sz = F.broadcast(
            spark.createDataFrame(
                list(sizes.items()), "query_id long, n_terms long"
            )
        )
        d_pairs = _term_pairs(docs, spec, id_col=id_col, term_filter=term_set)
    else:
        q_pairs = _term_pairs(
            queries.select(
                F.col("query_id").cast("long").alias("query_id"),
                F.col(query_col).alias(spec.source),
            ),
            spec,
            id_col="query_id",
        )
        q_side = q_pairs
        sz = q_pairs.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
        d_pairs = _term_pairs(docs, spec, id_col=id_col)
    matched = (
        d_pairs.join(q_side, "term")
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    out = matched.join(sz, "query_id")
    if min_match is None:
        out = out.filter(F.col("n_matched") == F.col("n_terms"))
    else:
        out = out.filter(F.col("n_matched") >= F.lit(int(min_match)))
    return out.select(id_col, "query_id", "n_matched", "n_terms").orderBy(
        id_col, "query_id"
    )
