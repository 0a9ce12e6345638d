"""spark-submit entry point: build (or resume) one index epoch.

Usage (north_star packaging contract)::

    cd /root/repo && zip -r /tmp/perlin_spark.zip perlin_spark
    spark-submit --py-files /tmp/perlin_spark.zip jobs/build_index.py \
        --input  /path/to/corpus_parquet_or_iceberg_table \
        --output /path/to/index_root \
        --pipeline code --n-shards 64 --buckets 32

The job is idempotent: re-running after a kill resumes the incomplete
epoch mid-merge from the bucket manifest (perlin_spark/epochs.py).
``--input`` accepts a parquet path or (when an Iceberg catalog is
configured on the cluster) a ``catalog.db.table`` identifier.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--pipeline", choices=["code", "documents"], default="code")
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--bucket-batches", type=int, default=4)
    # default 0 makes accidental re-runs idempotent (a committed epoch is
    # never rebuilt); appending a new document slice takes an explicit
    # --epoch N (or --epoch -1 for auto-increment)
    p.add_argument("--epoch", type=int, default=0)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument(
        "--positions", action="store_true",
        help="also build the positional sidecar (index-only phrase search)",
    )
    p.add_argument(
        "--symspell", action="store_true",
        help="also commit the SymSpell deletion-neighborhood table "
        "(fuzzy expansion without a vocabulary scan)",
    )
    p.add_argument(
        "--trigram", action="store_true",
        help="also index raw-content char 3-grams as field 'tri3' "
        "(enables substring/regex search — perlin_spark.trigram)",
    )
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    from perlin_spark import build_epoch
    from perlin_spark.analysis import code_specs, documents_specs

    spark = SparkSession.builder.appName("perlin-spark-build-index").getOrCreate()
    reader = spark.read
    if "/" in args.input or args.input.endswith(".parquet"):
        corpus = reader.parquet(args.input)
    else:
        corpus = spark.table(args.input)  # Iceberg / catalog table

    if args.pipeline == "code":
        specs = code_specs()
        kwargs = dict(
            doc_id_col=None,
            order_cols=["repo", "path", "commit"],
            content_col="content",
        )
    else:
        specs = documents_specs()
        kwargs = dict(doc_id_col="doc_id", content_col="text")

    if args.trigram:
        from perlin_spark.analysis import FieldSpec

        specs = list(specs) + [
            FieldSpec(field="tri3", source=kwargs["content_col"],
                      tokenizer="trigram", lowercase=False)
        ]

    epoch = build_epoch(
        spark,
        corpus,
        specs,
        args.output,
        epoch=None if args.epoch < 0 else args.epoch,
        n_shards=args.n_shards,
        buckets=args.buckets,
        bucket_batches=args.bucket_batches,
        block_size=args.block_size,
        positions=args.positions,
        symspell=args.symspell,
        **kwargs,
    )
    print(f"committed epoch {epoch} at {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
