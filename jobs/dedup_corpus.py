"""spark-submit entry point: end-to-end near-dup corpus deduplication.

The full pipeline a training-data run executes (r3 verdict item 9)::

    cd /root/repo && zip -r /tmp/perlin_spark.zip perlin_spark
    spark-submit --py-files /tmp/perlin_spark.zip jobs/dedup_corpus.py \
        --input  /path/to/documents_parquet \
        --output /path/to/deduped \
        --threshold 0.12

Stages: near-dup PAIRS (MinHash+LSH by default; ``--pairs ngram`` for the
exact quadratic baseline) -> connected COMPONENTS (pointer-jumping
min-label propagation) -> canonical SURVIVORS (lowest doc_id per
component) -> surviving-corpus write.  Lineage is written alongside:

* ``<output>/corpus``      — surviving documents + their component id
* ``<output>/_components`` — (component, n_members, survivor_id) per
  multi-member component (the dropped-doc audit trail)
* ``<output>/_summary``    — one row: n_docs, n_pairs, n_components,
  n_survivors, n_dropped

Survivor counts match the driver's ``dedup_survivors`` oracle when run
with the same pair source and threshold (pytest
``tests/test_extras.py::test_dedup_corpus_job``).
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.12)
    p.add_argument("--pairs", choices=["lsh", "ngram"], default="lsh")
    p.add_argument("--bucket-cap", type=int, default=None)
    return p.parse_args(argv)


def run(spark, docs, threshold: float, pairs_mode: str, bucket_cap, output: str):
    from pyspark.sql import functions as F

    from perlin_spark.extras import dedup

    if pairs_mode == "lsh":
        pairs = dedup.minhash_lsh_pairs(docs, threshold=threshold, bucket_cap=bucket_cap)
    else:
        pairs = dedup.ngram_jaccard_pairs(docs, threshold=threshold)
    # materialize the pair pipeline ONCE: the summary count and the
    # component loop both consume it, and recomputing the LSH verify
    # joins would double the job's most expensive stage
    pairs = pairs.persist()
    n_pairs = pairs.count()
    comps = dedup.dedup_components(pairs, docs)
    survivors = comps.filter(F.col("doc_id") == F.col("component"))
    surviving_corpus = docs.join(survivors.select("doc_id", "component"), "doc_id")
    surviving_corpus.write.mode("overwrite").parquet(f"{output}/corpus")

    lineage = (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > 1)
        .withColumn("survivor_id", F.col("component"))
    )
    lineage.write.mode("overwrite").parquet(f"{output}/_components")

    n_docs = docs.count()
    n_survivors = spark.read.parquet(f"{output}/corpus").count()
    n_components = n_survivors  # exactly one survivor per component
    summary = spark.createDataFrame(
        [(n_docs, n_pairs, n_components, n_survivors, n_docs - n_survivors)],
        "n_docs long, n_pairs long, n_components long, n_survivors long, n_dropped long",
    )
    summary.coalesce(1).write.mode("overwrite").parquet(f"{output}/_summary")
    pairs.unpersist()
    dedup.release_cache()  # drop the tracked shingle/membership frames
    return {
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "n_survivors": n_survivors,
        "n_dropped": n_docs - n_survivors,
    }


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("perlin-spark-dedup-corpus").getOrCreate()
    docs = spark.read.parquet(args.input)
    stats = run(spark, docs, args.threshold, args.pairs, args.bucket_cap, args.output)
    print(
        f"dedup_corpus: {stats['n_docs']} docs -> {stats['n_survivors']} survivors "
        f"({stats['n_dropped']} dropped across {stats['n_pairs']} near-dup pairs) "
        f"at {args.output}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
