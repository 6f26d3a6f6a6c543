"""Driver-contract enforcement: EVERY queries() entry has an oracle_sql()
twin and EVERY pair hash-matches on sf0.001 — the same comparison the
driver's CORRECTNESS gate runs at sf0.01 (scripts/check_entry.py is the
manual sf0.01 replica). Parametrized over all keys so a new query cannot
land without its oracle passing."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as mod  # noqa: E402
from scripts.check_entry import TABLES, normalize  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

ALL_QUERIES = sorted(mod.queries())
# documented rows-only waivers: genuinely non-SQL-expressible operators
# (the driver records these as the weaker rows-only check)
ROWS_ONLY = {"corpus_bpe_fertility"}  # greedy BPE merge apply: no SQL twin


def test_keys_align():
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) == set(q) - ROWS_ONLY, (
        "every query needs an oracle twin (or an explicit rows-only "
        f"waiver documented here): {sorted((set(q) - ROWS_ONLY) ^ set(o))}"
    )
    assert len(q) >= 60


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


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    if name in ROWS_ONLY:
        # the driver's weaker rows-only check for non-SQL-expressible ops
        assert mod.queries()[name](spark, SF_DIR).count() >= 0
        return
    got = normalize(mod.queries()[name](spark, SF_DIR).toPandas())
    want = normalize(duck.execute(mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.equals(want)


def test_no_duplicate_keys_in_entry_dicts():
    """A duplicate string key in a dict literal silently keeps the last
    value — a new entry reusing an existing name would shadow it and the
    gate would never run the newcomer. Walk the module AST and refuse
    duplicates inside any dict literal with >= 5 string keys."""
    import ast
    import os

    import dynamo2es_lambda_spark.plans.entry_queries as eq

    path = os.path.abspath(eq.__file__)
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        keys = [
            k.value
            for k in node.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        ]
        if len(keys) < 5:
            continue
        seen, dups = set(), []
        for k in keys:
            if k in seen:
                dups.append(k)
            seen.add(k)
        assert not dups, (
            f"duplicate keys in entry_queries dict literal at line "
            f"{node.lineno}: {dups}"
        )
