"""spark-submit entry point: backfill the positional sidecar onto a
persisted index.

Usage::

    cd /root/repo && zip -r /tmp/perlin_spark.zip perlin_spark
    spark-submit --py-files /tmp/perlin_spark.zip jobs/add_positions.py \
        --index /path/to/index_root

Each committed epoch lacking positions is re-analyzed with ITS manifest
specs and shard geometry (never a whole-corpus rebuild); once every epoch
carries the sidecar, ``load_index`` attaches it and phrase queries switch
to the index-only path automatically.  Idempotent.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--num-partitions", type=int, default=None)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from perlin_spark import add_positions

    spark = SparkSession.builder.appName("perlin-spark-add-positions").getOrCreate()
    written = add_positions(spark, args.index, num_partitions=args.num_partitions)
    if written:
        print(f"positions written for epoch(s) {written} at {args.index}")
    else:
        print(f"every epoch at {args.index} already carries positions")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
