"""One-off timing probe for the round-5 session-2 operators at sf0.1:
percolate, significant_terms, search_collapse (both paths),
facet_histogram, term_vectors, multi-root federated search, merge_roots.
Prints one JSON line; run on a quiet host (fault probe printed first).

Usage: python scripts/probe_new_ops_r5.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from bench import fault_probe_mbps
from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline, build_epoch, load_index, merge_roots
from perlin_spark.percolate import percolate

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOC_SPEC = FieldSpec(field="text", source="text", tokenizer="whitespace", lowercase=True)


def best_of(fn, n=3):
    out = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out = min(out, time.perf_counter() - t0)
    return round(out, 3)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe0 = fault_probe_mbps()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.cache().count()
    eng = PerlinEngine.build(
        spark, docs, [DOC_SPEC],
        pipeline=QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"),
        content_col="text", n_shards=max(CPUS // 2, 4),
    ).cache()
    eng.index.postings.count()

    times = {}
    qs = spark.createDataFrame(
        [(0, "hash join sort"), (1, "vector stream"), (2, "dup window merge"),
         (3, "zzzqqq"), (4, "scan filter batch spark")],
        "query_id long, query string",
    )
    percolate(qs, docs, DOC_SPEC).count()  # warm
    times["ft_percolate"] = best_of(lambda: percolate(qs, docs, DOC_SPEC).count())

    eng.significant_terms("scan", k=20).collect()
    times["ft_significant_terms"] = best_of(
        lambda: eng.significant_terms("scan", k=20).collect()
    )
    eng.search_collapse("scan", by="source", k=10).collect()
    times["ft_collapse_agg1"] = best_of(
        lambda: eng.search_collapse("scan", by="source", k=10).collect()
    )
    eng.search_collapse("scan", by="source", k=10, per_group=2).collect()
    times["ft_collapse_win2"] = best_of(
        lambda: eng.search_collapse("scan", by="source", k=10, per_group=2).collect()
    )
    eng.facet_histogram("scan", value="n_chars", interval=50).collect()
    times["ft_facet_histogram"] = best_of(
        lambda: eng.facet_histogram("scan", value="n_chars", interval=50).collect()
    )
    eng.term_vectors([3, 7, 11, 19]).collect()
    times["ft_term_vectors"] = best_of(
        lambda: eng.term_vectors([3, 7, 11, 19]).collect()
    )

    # federation + physical merge over two halves of the corpus
    tmp = tempfile.mkdtemp(prefix="perlin_merge_probe_")
    try:
        half = docs.agg(F.max("doc_id")).collect()[0][0] // 2
        ra, rb = os.path.join(tmp, "a"), os.path.join(tmp, "b")
        t0 = time.perf_counter()
        build_epoch(spark, docs.filter(F.col("doc_id") <= half), [DOC_SPEC],
                    ra, n_shards=8, buckets=8)
        build_epoch(spark, docs.filter(F.col("doc_id") > half), [DOC_SPEC],
                    rb, n_shards=8, buckets=8)
        times["build_two_shards"] = round(time.perf_counter() - t0, 3)
        fed = PerlinEngine(load_index(spark, [ra, rb]),
                           QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"))
        fed.search("hash join", k=10).collect()  # warm
        times["federated_search"] = best_of(
            lambda: fed.search("hash join", k=10).collect()
        )
        t0 = time.perf_counter()
        merge_roots(spark, [ra, rb], os.path.join(tmp, "all"))
        times["merge_roots"] = round(time.perf_counter() - t0, 3)
        merged = PerlinEngine(load_index(spark, os.path.join(tmp, "all")),
                              QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"))
        merged.search("hash join", k=10).collect()
        times["merged_search"] = best_of(
            lambda: merged.search("hash join", k=10).collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "probe_mbps": {"start": probe0, "end": fault_probe_mbps()},
        "times_s": times,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
