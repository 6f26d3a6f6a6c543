"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB, compare row count, schema-ish
(column names), and order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
       python scripts/check_entry.py --all [--summary] [sf_dir]

``--all`` runs the FULL queries() surface and writes a per-query artifact
to CORRECTNESS_local.json at the repo root (the driver samples a subset per
round; this ships the complete evidence in-repo). ``--summary`` prints only
the one-line tally. Queries without an oracle twin are recorded as a
weaker rows-only check (``oracle: false``), mirroring the driver.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

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
    args = [a for a in sys.argv[1:]]
    run_all = "--all" in args
    summary = "--summary" in args
    args = [a for a in args if a not in ("--all", "--summary")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

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
    results: dict[str, dict] = {}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {"oracle": name in sqls}
        try:
            got = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = int(len(got))
            if name not in sqls:
                # driver parity: no-oracle entries get a rows-only check
                rec["rows_only_ok"] = True
                if not summary:
                    print(f"OK   {name}: {len(got)} rows (rows-only)")
                results[name] = rec
                continue
            want = con.execute(sqls[name]).fetchdf()
            rec["oracle_rows"] = int(len(want))
            g, w = normalize(got), normalize(want)
            ok_cols = list(g.columns) == list(w.columns)
            ok_rows = len(g) == len(w)
            ok_vals = ok_cols and ok_rows and g.equals(w)
            rec.update(
                rows_match=ok_rows, schema_match=ok_cols,
                values_match=bool(ok_vals),
            )
            if not ok_vals and ok_cols and ok_rows:
                diff = (g != w) & ~(g.isna() & w.isna())
                bad = diff.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(g)} rows differ")
                if not summary:
                    print(
                        pd.concat([g[bad].head(3), w[bad].head(3)], axis=1)
                    )
                failures += 1
            elif not ok_vals:
                print(
                    f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"
                    f" rows {len(g)} vs {len(w)}"
                )
                failures += 1
            elif not summary:
                print(f"OK   {name}: {len(g)} rows")
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"ERROR {name}: {rec['err']}")
            failures += 1
        results[name] = rec
    spark.stop()
    n = len(results)
    print(f"{n - failures}/{n} queries pass ({sf_dir})")
    if run_all and not only:
        # one artifact PER scale factor (VERDICT r4 task 8): an sf0.001
        # run must not overwrite the sf0.01 evidence — scale-sensitive
        # regressions (row-count-dependent bugs) would hide
        tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "")
        out = os.path.join(REPO_ROOT, f"CORRECTNESS_local_{tag}.json")
        from dynamo2es_lambda_spark.plans.entry_queries import (
            COMPILER_SHARED_ORACLES,
        )

        for nm, why in COMPILER_SHARED_ORACLES.items():
            if nm in results:
                results[nm]["compiler_shared_oracle"] = why
        with open(out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "total": n, "failures": failures,
                 "queries": results},
                f, indent=1,
            )
        print(f"wrote {out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
