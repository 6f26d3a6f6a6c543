"""Driver-contract smoke: queries()/oracle_sql() keys align and a sample of
pairs hash-match on sf0.001 (the full 18-pair sweep lives in
scripts/check_entry.py and runs at sf0.01 in the driver)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as mod  # noqa: E402
from scripts.check_entry import TABLES, normalize  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SAMPLE = [
    "doc_stats",
    "term_df",
    "dedup_exact",
    "text_quality",
    "events_version_lww",
    "tpch_revenue_by_nation",
]


def test_keys_align():
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 15


def test_entry_returns_rows(spark):
    df = mod.entry(spark)
    assert df.count() > 0
    assert {"qid", "rank", "doc_id", "score_r"} <= set(df.columns)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_sample_queries_match_oracle(spark, duck, name):
    got = normalize(mod.queries()[name](spark, SF_DIR).toPandas())
    want = normalize(duck.execute(mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.equals(want)
