"""Second metric-agg family: median_absolute_deviation, boxplot,
t_test (Welch), matrix_stats, and the auto_date_histogram interval
picker — ES aggregations over doc fields the reference ships whole to
the engine (lib/handler.js:100)."""

import datetime
import math
import statistics

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

_DOCS = [
    # doc_id, text,             grp,  w
    ("d0", "alpha one",         "a", 10.0),
    ("d1", "alpha two",         "a", 12.0),
    ("d2", "alpha three",       "a", 20.0),
    ("d3", "alpha four",        "b", 30.0),
    ("d4", "alpha five",        "b", 34.0),
    ("d5", "alpha six",         "b", 50.0),
    ("d6", "beta seven",        "a", 99.0),
]
_W = {d: w for d, _, _, w in _DOCS}
_ALPHA_W = [w for d, t, g, w in _DOCS if "alpha" in t]


@pytest.fixture(scope="module")
def agg2_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_aggs2"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "grp", "w"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      doc_meta_cols=("grp", "w"))
    return search.load_store(path)


def _q(text="alpha"):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def _pct(vals, p):
    """Linear-interpolated percentile at rank p*(n-1) — the Spark
    `percentile` / DuckDB quantile_cont definition."""
    s = sorted(vals)
    r = p * (len(s) - 1)
    lo, hi = int(math.floor(r)), int(math.ceil(r))
    return s[lo] + (s[hi] - s[lo]) * (r - lo)


def test_mad_exact(spark, agg2_store):
    got = search.search_median_absolute_deviation_agg(
        spark, agg2_store, _q(), value_col="w"
    ).toPandas()
    med = _pct(_ALPHA_W, 0.5)
    want = round(_pct([abs(v - med) for v in _ALPHA_W], 0.5), 6)
    assert got.iloc[0]["n_docs"] == 6
    assert got.iloc[0]["mad_r"] == pytest.approx(want)


def test_boxplot_exact(spark, agg2_store):
    got = search.search_boxplot_agg(
        spark, agg2_store, _q(), value_col="w"
    ).toPandas().iloc[0]
    assert got["min_r"] == min(_ALPHA_W)
    assert got["max_r"] == max(_ALPHA_W)
    for c, p in (("q1_r", 0.25), ("q2_r", 0.5), ("q3_r", 0.75)):
        assert got[c] == pytest.approx(round(_pct(_ALPHA_W, p), 6))


def test_t_test_welch(spark, agg2_store):
    got = search.search_t_test_agg(
        spark, agg2_store, _q(), value_col="w", group_col="grp",
        group_a="a", group_b="b",
    ).toPandas().iloc[0]
    a = [w for d, t, g, w in _DOCS if "alpha" in t and g == "a"]
    b = [w for d, t, g, w in _DOCS if "alpha" in t and g == "b"]
    t = (statistics.mean(a) - statistics.mean(b)) / math.sqrt(
        statistics.variance(a) / len(a) + statistics.variance(b) / len(b)
    )
    assert (got["n_a"], got["n_b"]) == (3, 3)
    assert got["t_r"] == pytest.approx(round(t, 6))


def test_t_test_degenerate_is_null(spark, agg2_store):
    # group 'x' has no members -> n < 2 -> null t
    got = search.search_t_test_agg(
        spark, agg2_store, _q(), value_col="w", group_col="grp",
        group_a="a", group_b="x",
    ).toPandas().iloc[0]
    assert got["n_b"] == 0 and pd.isna(got["t_r"])


def test_matrix_stats_cells(spark, agg2_store):
    got = search.search_matrix_stats_agg(
        spark, agg2_store, _q(), fields=("dl", "w")
    ).toPandas()
    assert len(got) == 4  # 2x2 ordered pairs
    cells = {(r["field_x"], r["field_y"]): r for _, r in got.iterrows()}
    # dl is constant (2 tokens/doc) -> zero variance, null correlation
    assert cells[("dl", "dl")]["covar_r"] == 0.0
    w_var = round(statistics.variance(_ALPHA_W), 6)
    assert cells[("w", "w")]["covar_r"] == pytest.approx(w_var)
    assert cells[("w", "w")]["corr_r"] == pytest.approx(1.0)
    # symmetric off-diagonal
    assert cells[("dl", "w")]["covar_r"] == cells[("w", "dl")]["covar_r"]
    with pytest.raises(EngineError):
        search.search_matrix_stats_agg(spark, agg2_store, _q(), ("dl",))


def test_auto_date_histogram_picks_finest_fitting(spark):
    base = datetime.datetime(2024, 3, 1)
    rows = [(base + datetime.timedelta(hours=6 * i),) for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["ts"]))
    # 40 distinct minutes/hours, 10 days: target 12 -> day, 50 -> minute
    iv, out = search.auto_date_histogram(df, "ts", 12)
    assert iv == "day" and out.count() == 10
    iv2, out2 = search.auto_date_histogram(df, "ts", 50)
    assert iv2 == "minute" and out2.count() == 40
    # minutes overflow the target but hours fit -> hour
    rows2 = [(base + datetime.timedelta(minutes=7 * i),) for i in range(100)]
    df2 = spark.createDataFrame(pd.DataFrame(rows2, columns=["ts"]))
    iv2b, out2b = search.auto_date_histogram(df2, "ts", 20)
    assert iv2b == "hour" and out2b.count() == 12
    # nothing fits -> coarsest (year)
    rows3 = [(datetime.datetime(2000 + i, 1, 1),) for i in range(5)]
    df3 = spark.createDataFrame(pd.DataFrame(rows3, columns=["ts"]))
    iv3, out3 = search.auto_date_histogram(df3, "ts", 2)
    assert iv3 == "year" and out3.count() == 5
