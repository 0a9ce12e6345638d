"""spark-submit entry point: compact a persisted index's epochs into one.

Usage::

    cd /root/repo && zip -r /tmp/perlin_spark.zip perlin_spark
    spark-submit --py-files /tmp/perlin_spark.zip jobs/compact.py \
        --index /path/to/index_root [--keep-old]

Run after a long streaming ingest (or many incremental builds) to fold
accumulated epochs into one — query-time epoch fan-in returns to O(1).
Crash-safe: commits via atomic rename; interrupted runs leave the
existing epochs untouched.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--keep-old", action="store_true")
    p.add_argument(
        "--fold-deletes", action="store_true",
        help="physically drop tombstoned docs (root/_deletes) during the "
        "merge and recompute stats — the remedy for tombstone sets past "
        "the query-time filter cap",
    )
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from perlin_spark import compact_epochs, list_epochs

    spark = SparkSession.builder.appName("perlin-spark-compact").getOrCreate()
    before = list_epochs(args.index)
    new_epoch = compact_epochs(
        spark, args.index,
        delete_old=not args.keep_old,
        fold_deletes=args.fold_deletes,
    )
    if new_epoch is None:
        print(f"nothing to compact ({len(before)} epoch(s) at {args.index})")
    else:
        print(f"compacted epochs {before} -> epoch {new_epoch} at {args.index}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
