"""Per-stage build timing: taskset -c 0-(N-1) python scripts/probe_stages.py N"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F

from perlin_spark.analysis import code_specs
from perlin_spark.build import assign_doc_ids, tokenize_corpus, merge_flat, field_names
from perlin_spark import codec

cpus = int(sys.argv[1])
path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/perlin_scaling_corpus_200000_v2.parquet"

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"probe-stages-{cpus}")
    .config("spark.sql.shuffle.partitions", str(2 * cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "12g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
specs = code_specs()
corpus = spark.read.parquet(path)
n = corpus.count()
t = {}

t0 = time.perf_counter()
docs = assign_doc_ids(corpus, ["repo", "path", "commit"], 2 * cpus)
docs = docs.withColumn("sha256", F.sha2(F.col("content"), 256))
docs_path = f"/tmp/probe_docs_{cpus}.parquet"
docs.write.mode("overwrite").parquet(docs_path)
t["assign_ids_write"] = time.perf_counter() - t0

docs = spark.read.parquet(docs_path)

t0 = time.perf_counter()
flat = tokenize_corpus(docs, specs)
flat.write.mode("overwrite").format("noop").save()
t["tokenize_only"] = time.perf_counter() - t0

t0 = time.perf_counter()
chunk = (200000 + 31) // 32
flat = tokenize_corpus(docs, specs).withColumn("shard", F.expr(f"doc_id div {chunk}"))
merged = merge_flat(flat, field_names(specs), 2 * cpus, codec.BLOCK_SIZE)
merged.write.mode("overwrite").format("noop").save()
t["tokenize_shuffle_encode"] = time.perf_counter() - t0

print(json.dumps({"cpus": cpus, "n": n, **{k: round(v, 1) for k, v in t.items()}}))
spark.stop()
