"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full engine: inverted-index build →
block-max-pruned BM25 top-k) on sf0.001. ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 with DuckDB-verifiable twins —
see dynamo2es_lambda_spark/plans/entry_queries.py for the paired definitions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dynamo2es_lambda_spark.plans import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the full-text index over sf0.001 documents and answer
    the reference query set with BM25 top-k (driver checks rows ≥ 0)."""
    return entry_queries.q_fts_bm25(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.oracle_sql())
