"""spark-submit entry point: build and query the composed IVF+PQ ANN index.

Build (k-means-refined training, the documented default)::

    cd /root/repo && zip -r /tmp/perlin_spark.zip perlin_spark
    spark-submit --py-files /tmp/perlin_spark.zip jobs/ann_index.py build \
        --input  /path/to/embeddings_parquet \
        --output /path/to/ann_index \
        --n-centroids 64

Query (cold reopen — centroids/codebooks load from the index's own side
tables, so this works from any fresh process)::

    spark-submit --py-files /tmp/perlin_spark.zip jobs/ann_index.py query \
        --output /path/to/ann_index --query-vec-id 42 --k 10 --nprobe 8

``--filter`` adds a metadata predicate (SQL expression over the stored
columns) pushed into the pruned scan — filtered vector search.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["build", "query"])
    p.add_argument("--input", help="embeddings parquet (build; also query source for --query-vec-id)")
    p.add_argument("--output", required=True, help="index root")
    p.add_argument("--n-centroids", type=int, default=16)
    p.add_argument("--pq-m", type=int, default=None)
    p.add_argument("--pq-ks", type=int, default=None)
    p.add_argument("--seeded", action="store_true",
                   help="use the oracle-derivable seeded training instead of k-means")
    p.add_argument("--query-vec-id", type=int, default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--rerank", type=int, default=50)
    p.add_argument("--filter", default=None,
                   help="SQL predicate over stored columns, e.g. 'vec_id % 2 = 0'")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession, functions as F

    from perlin_spark.extras import similarity as S

    spark = SparkSession.builder.appName("perlin-spark-ann-index").getOrCreate()
    m = S.PQ_M if args.pq_m is None else args.pq_m
    ks = S.PQ_KS if args.pq_ks is None else args.pq_ks

    if args.mode == "build":
        if not args.input:
            raise SystemExit("build requires --input")
        emb = spark.read.parquet(args.input)
        if args.seeded:
            S.write_ivf_pq_cells(emb, args.output, n_centroids=args.n_centroids, m=m, ks=ks)
        else:
            S.build_ann_index(emb, args.output, n_centroids=args.n_centroids, m=m, ks=ks)
        n = spark.read.parquet(args.output).count()
        print(f"ann_index: built {n} vectors at {args.output} "
              f"({args.n_centroids} cells, PQ {m}x{ks})")
        return 0

    if args.query_vec_id is None or not args.input:
        raise SystemExit("query requires --input and --query-vec-id")
    emb = spark.read.parquet(args.input)
    qv = list(
        emb.filter(F.col("vec_id") == args.query_vec_id).first()["embedding"]
    )
    pred = F.expr(args.filter) if args.filter else None
    hits = S.ivf_pq_topk_from_cells(
        spark, args.output, qv, k=args.k, nprobe=args.nprobe,
        rerank=args.rerank, exclude_id=args.query_vec_id, predicate=pred,
    ).collect()
    for r in hits:
        print(f"{r['vec_id']}\t{r['cos_x1e4']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
