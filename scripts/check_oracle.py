"""Local stand-in for the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at the given sf,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    n_ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_ran += 1
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed.append(name)
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failed.append(name)
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failed.append(name)
        elif not g.reset_index(drop=True).astype(str).equals(w.reset_index(drop=True).astype(str)):
            diff = (g.astype(str) != w.astype(str)).any(axis=1)
            print(f"FAIL {name}: value mismatch in {int(diff.sum())}/{len(g)} rows")
            print("  spark:", g[diff].head(3).to_dict("records"))
            print("  duck :", w[diff].head(3).to_dict("records"))
            failed.append(name)
        else:
            print(f"ok   {name}: {len(g)} rows match")
    spark.stop()
    print(f"\n{n_ran - len(failed)}/{n_ran} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
