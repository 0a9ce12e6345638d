"""spark-submit entry point: tombstone documents in a persisted index.

Usage::

    spark-submit --py-files /tmp/perlin_spark.zip jobs/delete_docs.py \
        --index /path/to/index_root --ids 42,99,100
    # or ids from a parquet/table of (doc_id)
    spark-submit ... jobs/delete_docs.py --index ... --ids-parquet /path/del.parquet

Deletes are query-time tombstones (see ``perlin_spark.epochs.delete_docs``):
live-docs filtering in the scorer, stats stay as built until a physical
fold, tombstones survive compaction.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--ids", default=None, help="comma-separated doc_ids")
    p.add_argument("--ids-parquet", default=None, help="parquet of (doc_id)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if not args.ids and not args.ids_parquet:
        raise SystemExit("one of --ids / --ids-parquet is required")
    from pyspark.sql import SparkSession

    from perlin_spark import delete_docs

    spark = SparkSession.builder.appName("perlin-spark-delete").getOrCreate()
    if args.ids_parquet:
        ids = spark.read.parquet(args.ids_parquet)
    else:
        ids = [int(x) for x in args.ids.split(",") if x.strip()]
    n = delete_docs(spark, args.index, ids)
    print(f"tombstoned {n} doc_ids under {args.index}/_deletes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
