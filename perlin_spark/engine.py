"""Engine facade — the user-visible API of the rebuild.

Plays the role of the reference's derive-generated ``…Index`` struct +
``run_query`` entry point (``perlin-derive/src/index_struct.rs:12-68``):

    engine = PerlinEngine.build(spark, corpus, specs, ...)
    engine.search("2567 deimos", k=10)          # -> DataFrame(doc_id, score)
    engine.search("flew", filters=[Must("number", "2567")])
    engine.frequent_terms("number", 3)

Unlike the reference, unknown ids / unset pipelines return empty results
instead of panicking (SURVEY.md §4 "quirks to not replicate").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .analysis import FieldSpec, QueryPipeline, QuerySpec
from .build import IndexData, build_index
from .query import search as _search


@dataclass(frozen=True)
class Must:
    """Must-filter: results restricted to docs containing (field, term) —
    ``ChainingOperator::Must`` + ``Query::filter_by``
    (``/root/reference/src/query/mod.rs:14-19,250-261``)."""

    field: str
    term: str
    op: str = "must"


@dataclass(frozen=True)
class MustNot:
    field: str
    term: str
    op: str = "must_not"


@dataclass(frozen=True)
class May:
    """Score-boost only; never restricts the result set."""

    field: str
    term: str
    op: str = "may"


class PerlinEngine:
    """A built index + its query pipeline."""

    def __init__(self, index: IndexData, pipeline: QueryPipeline):
        self.index = index
        self.pipeline = pipeline

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        specs: list[FieldSpec],
        pipeline: QueryPipeline | None = None,
        **kwargs,
    ) -> "PerlinEngine":
        index = build_index(spark, corpus, specs, **kwargs)
        if pipeline is None:
            text_specs = [s for s in specs if s.field not in ("title",)]
            pipeline = QueryPipeline(text_spec=text_specs[0])
        return cls(index, pipeline)

    def cache(self) -> "PerlinEngine":
        self.index.cache()
        return self

    def analyze_query(self, query: str, filters=()) -> QuerySpec:
        filt = tuple((f.op, f.field, f.term) for f in filters)
        return self.pipeline.analyze(query, filt)

    def search(
        self,
        query: str | QuerySpec,
        k: int | None = 10,
        filters=(),
        pipeline: QueryPipeline | None = None,
        prune: bool = True,
    ) -> DataFrame:
        if isinstance(query, str):
            pl = pipeline or self.pipeline
            spec = pl.analyze(query, tuple((f.op, f.field, f.term) for f in filters))
        else:
            spec = query
        return _search(self.index, spec, k=k, prune=prune)

    def search_docs(self, query, k: int = 10, filters=(), pipeline=None) -> DataFrame:
        """Search + join back the docs table (the ``ExternalId`` lookup,
        ``/root/reference/src/document_index.rs:26-35`` as a plain join)."""
        hits = self.search(query, k=k, filters=filters, pipeline=pipeline)
        return hits.join(self.index.docs, "doc_id", "left").orderBy(
            F.desc("score"), F.asc("doc_id")
        )

    def frequent_terms(self, field: str, k: int | None = None) -> DataFrame:
        return self.index.frequent_terms(field, k)
