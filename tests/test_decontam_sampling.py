"""n-gram decontamination + deterministic stratified sampling (the
LLM-pipeline corpus-hygiene operators, operators/decontam.py and
operators/sampling.py) against hand-computable fixtures."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.operators import decontam, sampling


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),       # shares 3-gram
        (1, "alpha beta gamma something else entirely"),  # shares 3-gram
        (2, "totally unrelated words live here now"),     # clean
        (3, "delta epsilon zeta eta theta iota"),         # shares 3-gram
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [(100, "alpha beta gamma"), (101, "delta epsilon zeta")],
            columns=["doc_id", "text"],
        )
    )


def test_ngram_contamination_counts(spark, corpus, bench):
    got = (
        decontam.ngram_contamination(corpus, bench, n=3)
        .toPandas()
        .sort_values("doc_id")
    )
    assert list(got["doc_id"]) == ["0", "1", "3"]
    # doc 0 shares BOTH benchmark 3-grams, docs 1 and 3 share one each
    assert dict(zip(got["doc_id"], got["n_hits"])) == {
        "0": 2, "1": 1, "3": 1,
    }


def test_decontaminate_filters_flagged(spark, corpus, bench):
    clean = decontam.decontaminate(corpus, bench, n=3).toPandas()
    assert list(clean["doc_id"]) == [2]
    assert set(clean.columns) == {"doc_id", "text"}
    # n larger than any overlap → nothing flagged, corpus unchanged
    assert decontam.decontaminate(corpus, bench, n=7).count() == 4


def test_short_docs_produce_no_grams(spark, bench):
    tiny = bench.sparkSession.createDataFrame(
        pd.DataFrame([(9, "alpha beta")], columns=["doc_id", "text"])
    )
    assert decontam.ngram_contamination(tiny, bench, n=3).count() == 0


@pytest.fixture(scope="module")
def strata_df(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "src"]))


def test_stratified_sample_rates_and_determinism(spark, strata_df):
    rates = {"s0": 1.0, "s1": 0.0}
    a = sampling.stratified_sample(
        strata_df, "src", rates, key_col="id", default_rate=0.5
    ).toPandas().sort_values("id").reset_index(drop=True)
    b = sampling.stratified_sample(
        strata_df.repartition(7), "src", rates, key_col="id",
        default_rate=0.5,
    ).toPandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)  # partitioning-independent
    by = a.groupby("src").size()
    assert by.get("s0", 0) == 100      # rate 1.0 keeps every row
    assert "s1" not in by.index        # rate 0.0 drops every row
    assert 20 <= by.get("s2", 0) <= 80  # ~0.5 of 100 via hash uniform


def test_stratified_sample_rejects_bad_rates(spark, strata_df):
    with pytest.raises(EngineError, match="must be in"):
        sampling.stratified_sample(
            strata_df, "src", {"s0": 1.5}, key_col="id"
        )
    with pytest.raises(EngineError, match="default_rate"):
        sampling.stratified_sample(
            strata_df, "src", {}, key_col="id", default_rate=-0.1
        )
