"""spark-submit entry point: merge independently built index roots.

Usage::

    cd /root/repo && zip -r /tmp/perlin_spark.zip perlin_spark
    spark-submit --py-files /tmp/perlin_spark.zip jobs/merge_indexes.py \
        --inputs /path/idx_shard_a /path/idx_shard_b --output /path/idx_all \
        [--no-compact]

The build-shards-separately-then-merge pattern (Lucene ``addIndexes``):
each source root keeps serving while the merge runs; the output root is
committed atomically per adopted epoch and the final splice-compaction.
Requires a uniform layout (buckets/k1/b) and globally disjoint doc-id
ranges across the sources — validated loudly before anything is written.
Source tombstones carry into the merged root.  For zero-copy federation
instead of a physical merge, pass the root LIST straight to
``load_index`` (see README).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--inputs", nargs="+", required=True,
                   help="two or more source index roots")
    p.add_argument("--output", required=True)
    p.add_argument("--no-compact", action="store_true",
                   help="adopt + renumber only; skip the final splice "
                   "compaction (epochs stay one-per-source-epoch)")
    p.add_argument("--num-partitions", type=int, default=None)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from perlin_spark import list_epochs, merge_roots

    spark = SparkSession.builder.appName("perlin-spark-merge").getOrCreate()
    last = merge_roots(
        spark, args.inputs, args.output,
        compact=not args.no_compact,
        num_partitions=args.num_partitions,
    )
    print(
        f"merged {len(args.inputs)} roots into {args.output} "
        f"(epochs now {list_epochs(args.output)}, last written: {last})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
