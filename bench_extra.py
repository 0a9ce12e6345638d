"""Per-operator measurement harness for the optimization round (guide §1).

NOT the driver bench — bench.py stays frozen.  This script isolates each
bench-timed operator (same library calls, same data), labels the jobs,
optionally captures .explain("formatted") into plans/r06/, and prints one
JSON line of per-op seconds so before/after comparisons are cheap.

Usage:
  python bench_extra.py [op ...]             # default: all ops
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py dedup_components
  PLAN_TAG=before python bench_extra.py --plans text_decontaminate

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), PLAN_TAG (suffix for plan files).
"""

from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("_PERLIN_BENCH_REEXEC") != "1":
    env = dict(
        os.environ,
        _PERLIN_BENCH_REEXEC="1",
        MALLOC_MMAP_THRESHOLD_="1073741824",
        MALLOC_TRIM_THRESHOLD_="1073741824",
        ARROW_DEFAULT_MEMORY_POOL="system",
    )
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from perlin_spark import FieldSpec, Must, PerlinEngine, QueryPipeline
from perlin_spark.analysis import code_specs
from perlin_spark.extras import dedup, similarity, textstats
from perlin_spark.fixtures import synth_code_corpus

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CODE_ROWS = int(os.environ.get("SPARK_GRAFT_CODE_ROWS", "20000"))
PLAN_TAG = os.environ.get("PLAN_TAG", "")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")

DOC_SPEC = FieldSpec(field="text", source="text", tokenizer="whitespace", lowercase=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    capture_plans = "--plans" in sys.argv
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("perlin-spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-Xms8g -XX:+AlwaysPreTouch")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    times: dict[str, float] = {}

    state: dict = {}

    def build_doc_engine():
        eng = PerlinEngine.build(
            spark, docs, [DOC_SPEC],
            pipeline=QueryPipeline(text_spec=DOC_SPEC, text_combinator="all"),
            content_col="text", n_shards=max(CPUS // 2, 4),
        ).cache()
        n = eng.index.postings.count()
        eng.index.doc_lens.count()
        eng.index.vocabulary.count()
        eng.index.stats_map()
        return eng

    def get_engine():
        if "eng" not in state:
            state["eng"] = build_doc_engine()
        return state["eng"]

    def get_code_engine():
        if "code_eng" not in state:
            code = synth_code_corpus(spark, CODE_ROWS).repartition(CPUS)
            code.cache().count()
            state["code"] = code
            eng = PerlinEngine.build(
                spark, code, code_specs(),
                pipeline=QueryPipeline(text_spec=code_specs()[0], text_combinator="all"),
                doc_id_col=None, order_cols=["repo", "path", "commit"],
                content_col="content", n_shards=max(CPUS // 2, 4),
            ).cache()
            eng.index.postings.count()
            state["code_eng"] = eng
        return state["code_eng"]

    def get_emb():
        if "emb" not in state:
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            emb.cache().count()
            state["emb"] = emb
            state["qv"] = list(
                emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
            )
        return state["emb"], state["qv"]

    def plan_of(df, name):
        if not capture_plans:
            return
        os.makedirs(PLAN_DIR, exist_ok=True)
        tag = f"_{PLAN_TAG}" if PLAN_TAG else ""
        with open(os.path.join(PLAN_DIR, f"{name}{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))

    # --- op table: name -> (dataframe factory or timed callable) -----------
    def t_build_documents():
        eng = build_doc_engine()
        eng.index.unpersist()

    def t_build_code():
        get_code_engine()  # warm corpus
        code = state["code"]
        eng = PerlinEngine.build(
            spark, code, code_specs(),
            pipeline=QueryPipeline(text_spec=code_specs()[0], text_combinator="all"),
            doc_id_col=None, order_cols=["repo", "path", "commit"],
            content_col="content", n_shards=max(CPUS // 2, 4),
        ).cache()
        eng.index.postings.count()
        eng.index.doc_lens.count()
        eng.index.vocabulary.count()
        eng.index.stats_map()
        eng.index.unpersist()

    def df_minhash():
        return dedup.minhash_lsh_pairs(docs, threshold=0.12)

    def df_components():
        return dedup.dedup_components(
            dedup.minhash_lsh_pairs(docs, threshold=0.12), docs
        )

    def df_repetition():
        return textstats.repetition_stats(docs)

    def df_decontaminate():
        train = textstats.deterministic_sample(docs, 0.9, seed=7)
        ev = docs.join(train.select("doc_id"), "doc_id", "left_anti")
        return textstats.decontaminate(train, ev)

    def df_percolate():
        from perlin_spark.percolate import percolate as _percolate

        perc_qs = spark.createDataFrame(
            [(0, "hash join sort"), (1, "vector stream"), (2, "dup window merge"),
             (3, "zzzqqq"), (4, "scan filter batch spark")],
            "query_id long, query string",
        )
        return _percolate(perc_qs, docs, DOC_SPEC)

    def df_significant_terms():
        return get_engine().significant_terms("scan", k=20)

    def df_parent_child():
        return get_engine().search_parents("scan", child_key="source", score_mode="sum")

    def df_date_histogram():
        from perlin_spark.extras import events as events_mod

        if "ev_df" not in state:
            state["ev_df"] = spark.read.parquet(f"{SF_DIR}/events.parquet")
        return events_mod.date_histogram(state["ev_df"], "day")

    def df_ann_cosine():
        emb, qv = get_emb()
        return similarity.cosine_topk(emb, qv, k=10, exclude_id=0)

    def df_ann_ivf():
        emb, qv = get_emb()
        if "ivf_cents" not in state:
            state["ivf_cents"] = similarity.write_ivf_cells(
                emb, "/tmp/perlin_bx_ivf", n_centroids=16
            )
        return similarity.ivf_topk_from_cells(
            spark, "/tmp/perlin_bx_ivf", state["ivf_cents"], qv, k=10, nprobe=4,
            exclude_id=0,
        )

    def df_ann_pq():
        emb, qv = get_emb()
        if "pq_cb" not in state:
            state["pq_cb"] = similarity.write_pq_codes(emb, "/tmp/perlin_bx_pq")
            state["pq_codes"] = spark.read.parquet("/tmp/perlin_bx_pq")
        return similarity.pq_topk_from_codes(
            state["pq_codes"], state["pq_cb"], qv, k=10, exclude_id=0
        )

    def df_ann_ivf_pq():
        emb, qv = get_emb()
        if "ivfpq_done" not in state:
            similarity.write_ivf_pq_cells(emb, "/tmp/perlin_bx_ivfpq", n_centroids=16)
            state["ivfpq_done"] = True
        return similarity.ivf_pq_topk_from_cells(
            spark, "/tmp/perlin_bx_ivfpq", qv, k=10, nprobe=4, rerank=50, exclude_id=0
        )

    def df_ann_sq():
        emb, qv = get_emb()
        if "sq_done" not in state:
            similarity.write_sq_codes(emb, "/tmp/perlin_bx_sq")
            state["sq_done"] = True
        return similarity.sq_topk_from_codes(
            spark, "/tmp/perlin_bx_sq", emb, qv, k=10, exclude_id=0
        )

    def t_reshard():
        from perlin_spark.build import reshard_index as _reshard

        ridx = _reshard(get_engine().index, max(CPUS // 4, 2))
        ridx.postings.count()
        for df in ridx._persisted:
            df.unpersist()

    def t_queries():
        eng = get_engine()
        mix = [
            ("and2", "hash join", ()),
            ("and3", "sort merge window", ()),
            ("or3", "dup stream vector", ()),
            ("must", "merge", (Must("text", "dup"),)),
            ("rare", "dup", ()),
        ]
        for name, q, filters in mix:
            for _ in range(3):
                eng.search(q, k=10, filters=list(filters)).collect()
            best = None
            for _ in range(5):
                t0 = time.perf_counter()
                eng.search(q, k=10, filters=list(filters)).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[f"q_{name}"] = round(best, 4)
        if capture_plans:
            plan_of(eng.search("hash join", k=10), "q_and2")

    DF_OPS = {
        "dedup_minhash_lsh": df_minhash,
        "dedup_components": df_components,
        "text_repetition": df_repetition,
        "text_decontaminate": df_decontaminate,
        "ft_percolate": df_percolate,
        "ft_significant_terms": df_significant_terms,
        "ft_parent_child": df_parent_child,
        "events_date_histogram": df_date_histogram,
        "ann_cosine_topk": df_ann_cosine,
        "ann_ivf_topk": df_ann_ivf,
        "ann_pq_topk": df_ann_pq,
        "ann_ivf_pq_topk": df_ann_ivf_pq,
        "ann_sq_topk": df_ann_sq,
    }
    T_OPS = {
        "build_documents": t_build_documents,
        "build_code": t_build_code,
        "reshard_index": t_reshard,
        "queries": t_queries,
    }

    wanted = args or (list(T_OPS) + list(DF_OPS))
    for name in wanted:
        spark.sparkContext.setJobDescription(name)
        if name in T_OPS:
            fn = T_OPS[name]
            fn()  # warm
            best = None
            for _ in range(reps if name != "queries" else 0):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            if best is not None:
                times[name] = round(best, 4)
        elif name in DF_OPS:
            # time .count() / .collect() exactly like the frozen bench.py
            # (that is the driver's objective function); use --plans for
            # the plan shape instead of a noop-sink timing
            factory = DF_OPS[name]
            df = factory()
            plan_of(df, name)
            sink = (lambda d: d.collect()) if name.startswith(
                ("ft_significant", "ft_parent", "ann_")
            ) else (lambda d: d.count())
            sink(df)  # warm
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                sink(factory())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            if best is not None:
                times[name] = round(best, 4)
        else:
            print(f"unknown op {name}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "times": times}))
    spark.stop()


if __name__ == "__main__":
    main()
