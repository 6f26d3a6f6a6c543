"""Capture ``explain('formatted')`` for named entry queries → plans/r06/.

Usage: python scripts/dump_plans_r06.py <suffix> <query> [query ...]
       (suffix is 'before' or 'after')

Writes plans/r06/<query>_<suffix>.txt. Runs at sf0.001 (plan shape is
SF-independent; the driver cannot run Spark and checks claims against
these files)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from dynamo2es_lambda_spark.plans import entry_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = entry_queries.SPARK_QUERIES[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
