"""Print the load-bearing physical-plan evidence for the headline paths.

Run: python scripts/plan_audit.py   (uses /root/testdata/sf0.001)

Each section states the claim, then the relevant lines of the EXECUTED
(final adaptive) plan that prove it.  The same properties are pinned by
tests (tests/test_engine_features.py::test_search_plan_properties,
tests/test_extras.py::test_ivf_pq_cells_cold_reopen_recall).
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def show(title: str, claim: str, lines: list[str]) -> None:
    print(f"\n=== {title}")
    print(f"    claim: {claim}")
    for ln in lines:
        print(f"    | {ln.strip()[:150]}")


def grep(plan: str, pat: str, n: int = 3) -> list[str]:
    return [l for l in plan.splitlines() if re.search(pat, l)][:n]


def part_filters(plan: str, n: int = 2) -> list[str]:
    return [m.group(0) for m in re.finditer(r"PartitionFilters: \[[^\]]*\]", plan)][:n]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from perlin_spark import FieldSpec, PerlinEngine, QueryPipeline, build_epoch, load_index
    from perlin_spark.extras import dedup, similarity

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spec = FieldSpec(field="text", source="text")
    pl = QueryPipeline(text_spec=spec)
    tmp = tempfile.mkdtemp()

    # 1. persisted-index search: bucket pruning reaches the parquet scan
    root = os.path.join(tmp, "idx")
    build_epoch(spark, docs, [spec], root, content_col="text",
                n_shards=4, buckets=8)
    idx = load_index(spark, root)
    df = PerlinEngine(idx, pl).search("hash join", k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    show("persisted search", "bucket partition pruning reaches the FileScan",
         part_filters(plan))

    # 2. cached search: serving layout -> exchange-free scoring stage
    idx2 = load_index(spark, root).cache()
    idx2.postings.count()
    df2 = PerlinEngine(idx2, pl).search("hash join", k=10)
    df2.collect()
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    stage = plan2.split("InMemoryRelation", 1)[0]
    show("cached search",
         "ONE stage: cache scan -> filter -> pandas scorer -> TakeOrdered "
         f"(exchanges above the cache scan: {stage.count('Exchange')})",
         grep(stage, r"TakeOrderedAndProject|FlatMapGroupsInPandas|InMemoryTableScan"))

    # 3. minhash: AQE broadcasts the dup-expansion joins, no cartesian
    pairs = dedup.minhash_lsh_pairs(
        docs.unionByName(docs.limit(5).withColumn("doc_id", F.col("doc_id") + 10_000)),
        threshold=0.5,
    )
    pairs.count()
    plan3 = pairs._jdf.queryExecution().executedPlan().toString()
    show("minhash_lsh_pairs (with dups)",
         f"BroadcastHashJoin x{plan3.count('BroadcastHashJoin')}, "
         f"SortMergeJoin x{plan3.count('SortMergeJoin')} (LSH core only), "
         f"Cartesian x{plan3.count('Cartesian')}",
         grep(plan3, r"BroadcastHashJoin", 2))

    # 4. persisted trigram substring search: candidacy is the stock
    #    bucket-pruned search plan; the verify side is a TWO-COLUMN docs
    #    projection with the contains predicate ABOVE the candidate join
    root_t = os.path.join(tmp, "idx_tri")
    tri = FieldSpec(field="tri3", source="text", tokenizer="trigram",
                    lowercase=False)
    build_epoch(spark, docs, [spec, tri], root_t, content_col="text",
                n_shards=4, buckets=8)
    idx_t = load_index(spark, root_t)
    sub = PerlinEngine(idx_t, pl).search_substring("ream merge")
    sub.collect()
    plan_t = sub._jdf.queryExecution().executedPlan().toString()
    show("persisted substring search",
         "verify scan is candidate-restricted: candidate ids ride in as "
         "an IN/INSET doc_id predicate (row-group pruning under doc_id "
         "clustering) and the docs scan projects only (doc_id, text) — "
         "Catalyst would otherwise push contains() below the join and "
         "full-scan the corpus (the defect this plan replaces)",
         grep(plan_t, r"Contains", 1)
         + grep(plan_t, r"doc_id#\d+L IN|INSET|dynamicpruning", 2)
         + [l for l in plan_t.splitlines() if "ReadSchema" in l and "text" in l][:1])

    # 4b. parent-child fold: two-phase aggregate keyed by the parent
    eng_pc = PerlinEngine.build(spark, docs, [spec], pipeline=pl, n_shards=4)
    pc = eng_pc.search_parents("merge", child_key="source", k=10)
    pc.collect()
    plan_pc = pc._jdf.queryExecution().executedPlan().toString()
    show("search_parents (has_child fold)",
         "per-parent score fold is a map-side-combinable two-phase "
         "HashAggregate (partial_sum below the exchange, no Window) -- "
         "parent cardinality bounds the shuffle, and the global top-k "
         "is TakeOrderedAndProject",
         grep(plan_pc, r"partial_sum", 1)
         + grep(plan_pc, r"TakeOrderedAndProject", 1))

    # 5. IVF at rest: probed cells prune the parquet scan
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    cells = os.path.join(tmp, "cells")
    cents = similarity.write_ivf_cells(emb, cells, n_centroids=8)
    out = similarity.ivf_topk_from_cells(spark, cells, cents, qv, k=10, nprobe=2)
    out.collect()
    plan4 = out._jdf.queryExecution().executedPlan().toString()
    show("ivf_topk_from_cells", "nprobe cell pruning reaches the FileScan",
         part_filters(plan4))

    spark.stop()


if __name__ == "__main__":
    main()
