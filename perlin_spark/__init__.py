"""perlin_spark — a PySpark-native full-text indexing & retrieval engine.

A from-scratch rebuild of the capabilities of CurrySoftware/perlin
(reference at /root/reference, surveyed in SURVEY.md): per-field inverted
indexes built by vectorized analysis pipelines, delta+varbyte-compressed
posting blobs, BM25 top-k retrieval with boolean combinators and chained
filters — all expressed as plain DataFrames + Arrow UDFs so Catalyst does
the relational work and the data-level algorithms stay vectorized.
"""

from .analysis import FieldSpec, QueryPipeline, QuerySpec
from .build import IndexData, assign_doc_ids, build_index
from .engine import May, Must, MustNot, PerlinEngine, Range
from .epochs import (
    add_field,
    add_positions,
    build_epoch,
    compact_epochs,
    delete_docs,
    list_epochs,
    load_index,
    merge_roots,
    refresh_deletes,
)
from .progress import ProgressEvent, report_progress
from .hierarchy import Hierarchy
from .percolate import analyzed_term_pairs, percolate
from .qparser import ParsedQuery, parse_query
from .trigram import regex_literals, trigrams

__all__ = [
    "FieldSpec",
    "QueryPipeline",
    "QuerySpec",
    "IndexData",
    "assign_doc_ids",
    "build_index",
    "PerlinEngine",
    "Must",
    "MustNot",
    "May",
    "Range",
    "Hierarchy",
    "add_field",
    "add_positions",
    "delete_docs",
    "refresh_deletes",
    "compact_epochs",
    "ProgressEvent",
    "report_progress",
    "build_epoch",
    "list_epochs",
    "load_index",
    "merge_roots",
    "ParsedQuery",
    "parse_query",
    "percolate",
    "analyzed_term_pairs",
    "trigrams",
    "regex_literals",
]
