"""Event-log-instrumented single run of tokenize+shuffle+encode.

taskset -c 0-(N-1) python scripts/probe_metrics.py N
Prints per-stage: wall, sum(task run), sum(gc), shuffle bytes, records.
"""
import glob
import gzip
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F

from perlin_spark.analysis import code_specs
from perlin_spark.build import tokenize_corpus, merge_flat, field_names
from perlin_spark import codec

cpus = int(sys.argv[1])
evdir = f"/tmp/spark-events-{cpus}"
os.makedirs(evdir, exist_ok=True)
import shutil
for f in glob.glob(f"{evdir}/*"):
    shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"probe-metrics-{cpus}")
    .config("spark.sql.shuffle.partitions", str(2 * cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "12g")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", __import__("os").environ.get("ARROW_BATCH", "10000"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
specs = code_specs()
docs = spark.read.parquet(f"/tmp/probe_docs_32.parquet")

t0 = time.perf_counter()
chunk = (200000 + 31) // 32
flat = tokenize_corpus(docs, specs).withColumn("shard", F.expr(f"doc_id div {chunk}"))
merged = merge_flat(flat, field_names(specs), 2 * cpus, codec.BLOCK_SIZE)
merged.write.mode("overwrite").format("noop").save()
wall = time.perf_counter() - t0
spark.stop()

stages = {}
paths = [p for p in glob.glob(f"{evdir}/**/*", recursive=True) if os.path.isfile(p) and "appstatus" not in p]
for path in paths:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        for line in f:
            ev = json.loads(line)
            if ev["Event"] == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages.setdefault(sid, {}).update(
                    name=si["Stage Name"].split("\n")[0][:60],
                    wall=(si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000,
                    ntasks=si["Number of Tasks"],
                )
            elif ev["Event"] == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                d = stages.setdefault(sid, {})
                d["run"] = d.get("run", 0) + m.get("Executor Run Time", 0) / 1000
                d["cpu"] = d.get("cpu", 0) + m.get("Executor CPU Time", 0) / 1e9
                d["gc"] = d.get("gc", 0) + m.get("JVM GC Time", 0) / 1000
                d["deser"] = d.get("deser", 0) + m.get("Executor Deserialize Time", 0) / 1000
                sw = m.get("Shuffle Write Metrics") or {}
                d["sh_w_mb"] = d.get("sh_w_mb", 0) + sw.get("Shuffle Bytes Written", 0) / 1e6
                d["sh_w_time"] = d.get("sh_w_time", 0) + sw.get("Shuffle Write Time", 0) / 1e9
                sr = m.get("Shuffle Read Metrics") or {}
                d["sh_r_mb"] = d.get("sh_r_mb", 0) + (sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)) / 1e6
                d["fetch_wait"] = d.get("fetch_wait", 0) + sr.get("Fetch Wait Time", 0) / 1000
                inm = m.get("Input Metrics") or {}
                d["in_mb"] = d.get("in_mb", 0) + inm.get("Bytes Read", 0) / 1e6

print(f"WALL {wall:.1f}s cpus={cpus}")
for sid in sorted(stages):
    d = stages[sid]
    if "wall" not in d:
        continue
    print(
        f"stage {sid:3d} wall={d['wall']:6.1f}s tasks={d.get('ntasks', 0):3d} "
        f"run_sum={d.get('run', 0):7.1f}s cpu_sum={d.get('cpu', 0):7.1f}s gc={d.get('gc', 0):5.1f}s "
        f"in={d.get('in_mb', 0):6.0f}MB shW={d.get('sh_w_mb', 0):6.0f}MB shR={d.get('sh_r_mb', 0):6.0f}MB "
        f"| {d.get('name','')}"
    )
