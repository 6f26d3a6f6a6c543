"""Tokenizer: golden cases + three-way cross-implementation identity
(pandas ↔ Spark SQL expression ↔ DuckDB SQL) on real corpus text."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dynamo2es_lambda_spark.functions import analysis
from dynamo2es_lambda_spark.sources import synthetic

GOLDEN = [
    ("fooBar", ["foo", "bar"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("HTTPServer", ["http", "server"]),
    ("HTTPServerV2", ["http", "server", "v2"]),
    ("PascalCase", ["pascal", "case"]),
    ("get_valueFromHTTPResponse", ["get", "value", "from", "http", "response"]),
    ("x=1; y2 += fooBar_baz(qux)", ["x", "1", "y2", "foo", "bar", "baz", "qux"]),
    ("", []),
    ("___", []),
    ("a", ["a"]),
    ("camelCase snake_case UPPER lower 123", ["camel", "case", "snake", "case", "upper", "lower", "123"]),
]


def test_golden_cases():
    s = pd.Series([t for t, _ in GOLDEN])
    out = analysis.tokenize_series(s)
    for (_, want), got in zip(GOLDEN, out):
        assert got == want


def test_token_count():
    s = pd.Series(["fooBar baz", ""])
    assert analysis.token_count_series(s).tolist() == [3, 0]


def test_term_freqs_frame():
    out = analysis.term_freqs_frame(
        pd.Series([7, 8]), pd.Series(["foo foo bar", "fooBar"])
    )
    d7 = out[out.doc_int == 7].set_index("term")
    assert d7.loc["foo", "tf"] == 2 and d7.loc["bar", "tf"] == 1
    assert set(d7.dl) == {3}
    d8 = out[out.doc_int == 8]
    assert sorted(d8.term) == ["bar", "foo"] and set(d8.dl) == {2}


@pytest.fixture(scope="module")
def texts(corpus_pdf=None):
    pdf = synthetic.corpus_pdf(np.arange(100))
    extra = pd.Series([t for t, _ in GOLDEN if t])
    return pd.concat([pdf["content"], extra], ignore_index=True)


def test_duckdb_equivalence(texts):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": texts}))
    sql = f"select {analysis.duckdb_tokens_sql('x')} as toks from t"
    duck = con.execute(sql).fetchdf()["toks"]
    ours = analysis.tokenize_series(texts)
    for a, b in zip(ours, duck):
        assert a == list(b)


def test_spark_sql_equivalence(spark, texts):
    sdf = spark.createDataFrame(pd.DataFrame({"x": texts}))
    rows = (
        sdf.selectExpr(f"{analysis.spark_tokens_expr('x')} as toks")
        .toPandas()["toks"]
    )
    ours = analysis.tokenize_series(texts)
    for a, b in zip(ours, rows):
        assert a == list(b)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
@settings(max_examples=200, deadline=None)
def test_tokens_are_normalized_fixpoint(t):
    """Tokenizing a token's text again yields the same token(s) — analyzer
    idempotence on its own output alphabet [a-z0-9]."""
    toks = analysis.tokenize_series(pd.Series([t]))[0]
    retok = analysis.tokenize_series(pd.Series([" ".join(toks)]))[0]
    assert retok == toks


def test_cross_dialect_unicode_consistency(spark):
    """Non-ASCII input must tokenize identically in all three pinned
    implementations (pandas / Spark SQL / DuckDB): accented letters, CJK,
    emoji and uppercase-unicode all act as separators consistently."""
    import duckdb

    from dynamo2es_lambda_spark.functions import analysis

    texts = ["café naïve Über", "日本語のテキスト mixed ascii",
             "emoji 🎉 party", "ÀÉÎÕÜ upper", "ß sharp", "Ωmega ωmega",
             "tab\tand\nnewline", "semi;colon:path/to/file.py"]
    py = analysis.tokenize_series(pd.Series(texts)).tolist()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"(?)" for _ in texts) + ") v(text)", texts
    )
    duck = [r[0] for r in con.execute(
        f"SELECT {analysis.duckdb_tokens_sql('text')} FROM t").fetchall()]

    sdf = spark.createDataFrame(pd.DataFrame({"text": texts}))
    sp = [r[0] for r in sdf.selectExpr(
        analysis.spark_tokens_expr("text") + " as toks").collect()]

    for i, t in enumerate(texts):
        assert py[i] == duck[i] == sp[i], (t, py[i], duck[i], sp[i])
