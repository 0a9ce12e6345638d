"""Term hierarchy supplement as a self-referencing dimension table.

Mirrors ``Hierarchy`` (``/root/reference/src/field/hierarchy.rs:5-42``):
an in-memory taxonomy ``HashMap<T, Vec<T>>`` + roots, with
``add_element(term, parent)``, ``get_child_terms``, ``get_root_terms``.
Here it is a plain DataFrame ``(term, parent)`` (parent NULL = root), so
child expansion is an equi-join and query expansion is a join against the
index — idiomatic Spark instead of driver-side dict walking.

Unlike the reference we reject duplicates/orphans with ValueError instead
of panicking (SURVEY.md §4 quirks list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

HIERARCHY_SCHEMA = StructType(
    [StructField("term", StringType(), False), StructField("parent", StringType(), True)]
)


class Hierarchy:
    def __init__(self, spark: SparkSession, rows: list[tuple[str, str | None]] | None = None):
        self.spark = spark
        self._rows: dict[str, str | None] = {}
        for term, parent in rows or []:
            self.add_element(term, parent)

    def add_element(self, term: str, parent: str | None = None) -> None:
        """cf. ``hierarchy.rs:12-30`` — parents must pre-exist, terms unique."""
        if term in self._rows:
            raise ValueError(f"duplicate term {term!r}")
        if parent is not None and parent not in self._rows:
            raise ValueError(f"unknown parent {parent!r}")
        self._rows[term] = parent

    def to_df(self) -> DataFrame:
        return self.spark.createDataFrame(
            [(t, p) for t, p in self._rows.items()], HIERARCHY_SCHEMA
        )

    def get_child_terms(self, term: str) -> list[str]:
        return sorted(t for t, p in self._rows.items() if p == term)

    def get_root_terms(self) -> list[str]:
        return sorted(t for t, p in self._rows.items() if p is None)

    def expand(self, terms: list[str]) -> list[str]:
        """Query expansion: terms plus all their descendants (BFS over the
        driver dict — right for the reference-sized in-memory taxonomy;
        :meth:`expand_terms` is the DataFrame path for large ones)."""
        out = set(terms)
        frontier = set(terms)
        while frontier:
            children = {t for t, p in self._rows.items() if p in frontier}
            frontier = children - out
            out |= children
        return sorted(out)

    @staticmethod
    def expand_terms(hierarchy: DataFrame, seeds) -> DataFrame:
        """Distributed query expansion: ``seeds`` plus all descendants, as
        iterative level-by-level equi-joins against the ``(term, parent)``
        dimension table — the scale path for taxonomies too large for a
        driver dict.  One broadcast-join + anti-join per LEVEL (taxonomy
        depth bounds the loop, not taxonomy size); each level's frontier
        is persisted so the emptiness probe doesn't recompute the chain.

        ``seeds`` may be a list[str] or a DataFrame with a ``term``
        column.  Returns a DataFrame('term') of seeds + descendants; the
        result is persisted (it is the one frame that must survive the
        call) — superseded per-level frames are unpersisted as soon as
        their successor is materialized, so a long-lived session holds
        exactly one cached frame per call, not one per taxonomy level."""
        spark = hierarchy.sparkSession
        if not isinstance(seeds, DataFrame):
            seeds = spark.createDataFrame([(t,) for t in seeds], "term string")
        seen = seeds.select("term").distinct().persist()
        frontier = seen
        while True:
            children = hierarchy.join(
                F.broadcast(frontier.select(F.col("term").alias("parent"))),
                "parent",
            ).select("term")
            new_frontier = children.join(seen, "term", "left_anti").distinct().persist()
            done = new_frontier.isEmpty()  # materializes new_frontier
            if frontier is not seen:
                frontier.unpersist()
            if done:
                new_frontier.unpersist()
                return seen
            frontier = new_frontier
            new_seen = seen.unionByName(frontier).persist()
            new_seen.count()  # materialize before releasing its predecessor
            seen.unpersist()
            seen = new_seen

    def expand_via_df(self, terms: list[str]) -> list[str]:
        """:meth:`expand` computed through the DataFrame BFS (round-trips
        the taxonomy through :meth:`to_df`) — same result, cluster-side."""
        got = self.expand_terms(self.to_df(), terms).collect()
        return sorted(r["term"] for r in got)
