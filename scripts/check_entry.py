"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB, compare row count, schema-ish
(column names), and order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, sqls = mod.queries(), mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            want = con.execute(sqls[name]).fetchdf()
            g, w = normalize(got), normalize(want)
            ok_cols = list(g.columns) == list(w.columns)
            ok_rows = len(g) == len(w)
            ok_vals = ok_cols and ok_rows and g.equals(w)
            if not ok_vals and ok_cols and ok_rows:
                # float noise diagnostics
                diff = (g != w) & ~(g.isna() & w.isna())
                bad = diff.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ")
                print(pd.concat([g[bad].head(3), w[bad].head(3)], axis=1))
                failures += 1
            elif not ok_vals:
                print(
                    f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"
                    f" rows {len(g)} vs {len(w)}"
                )
                failures += 1
            else:
                print(f"OK   {name}: {len(g)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
