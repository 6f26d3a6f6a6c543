"""Shared fixtures: SparkSession + deterministic synthetic tables.

Mirrors the reference's test harness pattern (deterministic fixture builder →
run → exact-output assertions; /root/reference/test/utils/
ddb-stream-event-formatter.js), with the corpus from FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np
import pytest

from dynamo2es_lambda_spark.sources import synthetic

TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("d2es-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    """~200-row unit-test corpus (FIXTURES.md sizes)."""
    return synthetic.corpus_pdf(np.arange(200))


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf).repartition(4)


@pytest.fixture(scope="session")
def corpus_pdf_5k():
    """Correctness-scale corpus."""
    return synthetic.corpus_pdf(np.arange(5000))


@pytest.fixture(scope="session")
def queries_pdf():
    return synthetic.queries_pdf()
