"""Pipeline-agg family III: derivative (raw + unit-normalized),
cumulative_sum, cumulative_cardinality (first-bucket trick), and the
calendar rate agg — ES analytics over doc fields the reference ships
whole to the engine (lib/handler.js:100)."""

import datetime

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

# dl buckets at interval 2 (dl = token count of content):
#   d0..d2 -> 2 tokens (bucket 2), d3 -> 4 tokens (bucket 4),
#   d4..d5 -> 8 tokens (bucket 8) — bucket 6 is EMPTY (gap).
_DOCS = [
    ("d0", "alpha one", "s1"),
    ("d1", "alpha two", "s1"),
    ("d2", "alpha three", "s2"),
    ("d3", "alpha four five six", "s2"),
    ("d4", "alpha five six seven eight nine ten eleven", "s3"),
    ("d5", "alpha six seven eight nine ten eleven twelve", "s1"),
]


@pytest.fixture(scope="module")
def agg3_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_aggs3"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "src"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      doc_meta_cols=("src",))
    return search.load_store(path)


def _q():
    return pd.DataFrame([(0, "alpha")], columns=["qid", "query"])


def test_derivative_raw_and_normalized(spark, agg3_store):
    got = (
        search.search_derivative(spark, agg3_store, _q(), interval=2.0)
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    assert list(got["bucket"]) == [2.0, 4.0, 8.0]
    assert list(got["n_docs"]) == [3, 1, 2]
    # raw delta vs previous NON-EMPTY bucket
    assert got["deriv_v"][0] is None or pd.isna(got["deriv_v"][0])
    assert list(got["deriv_v"][1:]) == [-2, 1]
    # normalized: bucket 4->8 spans 2 intervals, so +1 over 2 -> 0.5
    assert got["deriv_rate_r"][1] == -2.0
    assert got["deriv_rate_r"][2] == 0.5


def test_cumulative_sum_reaches_total(spark, agg3_store):
    got = (
        search.search_cumulative_sum(spark, agg3_store, _q(), interval=2.0)
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    assert list(got["cum_docs"]) == [3, 4, 6]


def test_cumulative_cardinality_counts_first_sighting_only(
    spark, agg3_store
):
    got = (
        search.search_cumulative_cardinality(
            spark, agg3_store, _q(), interval=2.0, group_col="src"
        )
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    # bucket 2 sees s1,s2 -> 2; bucket 4 adds nothing (s2 seen) -> 2;
    # bucket 8 adds s3 (s1 repeat ignored) -> 3
    assert list(got["bucket"]) == [2.0, 4.0, 8.0]
    assert list(got["n_docs"]) == [3, 1, 2]
    assert list(got["cum_card"]) == [2, 2, 3]


def test_date_rate_week_and_month_lengths(spark):
    rows = [
        # 3 events in the week of Mon 2024-01-01; 2 in February 2024
        (datetime.datetime(2024, 1, 1, 5),),
        (datetime.datetime(2024, 1, 3, 6),),
        (datetime.datetime(2024, 1, 7, 7),),
        (datetime.datetime(2024, 2, 10, 8),),
        (datetime.datetime(2024, 2, 20, 9),),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["ts"]))
    wk = (
        search.date_rate(df, "ts", "week").toPandas()
        .sort_values("bucket").reset_index(drop=True)
    )
    assert wk["bucket"][0] == "2024-01-01"
    assert wk["n_docs"][0] == 3
    assert wk["rate_per_day_r"][0] == round(3 / 7, 6)
    mo = (
        search.date_rate(df, "ts", "month").toPandas()
        .sort_values("bucket").reset_index(drop=True)
    )
    # February 2024 is a leap month: 29 days
    feb = mo[mo["bucket"] == "2024-02-01"].iloc[0]
    assert feb["rate_per_day_r"] == round(2 / 29, 6)
    with pytest.raises(EngineError):
        search.date_rate(df, "ts", "fortnight")
