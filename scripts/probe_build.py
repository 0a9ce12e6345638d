"""One pinned build measurement: taskset -c 0-(N-1) python scripts/probe_build.py N [rows] [path]

Prints one JSON line with build wall time + docs/s.  Meant to be run
EXCLUSIVELY (no other Spark jobs on the host).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession

from perlin_spark import PerlinEngine, QueryPipeline
from perlin_spark.analysis import code_specs

cpus = int(sys.argv[1])
path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/perlin_scaling_corpus_200000_v2.parquet"

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"probe-{cpus}")
    .config("spark.sql.shuffle.partitions", str(2 * cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "12g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# read compressed from disk each pass: decompression is CPU (scales),
# uncompressed cache is DRAM traffic (doesn't, on this host)
corpus = spark.read.parquet(path)
n = corpus.count()

t0 = time.perf_counter()
eng = PerlinEngine.build(
    spark, corpus, code_specs(),
    pipeline=QueryPipeline(text_spec=code_specs()[0]),
    doc_id_col=None, order_cols=["repo", "path", "commit"],
    content_col="content", n_shards=32,
    num_partitions=2 * cpus,
)
eng.index.postings.count()
t_build = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "n": n, "t_build": round(t_build, 2),
                  "docs_per_sec": round(n / t_build, 1)}))
spark.stop()
