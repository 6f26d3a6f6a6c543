"""ip_prefix aggregation: IPv4 network bucketing of the match set.

ES context: the ip_prefix agg buckets documents by the network at a
given prefix length — the keyed sibling of ip_range (which the engine
already ships); reference docs reach ES as searchable documents
(lib/handler.js:100)."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

_DOCS = [
    ("d0", "merge window", "10.0.0.1"),
    ("d1", "merge pane", "10.0.0.200"),
    ("d2", "merge fast", "10.0.1.7"),
    ("d3", "window slow", "10.0.1.9"),
    ("d4", "merge slow", "192.168.3.4"),
    ("d5", "other text", "10.0.0.2"),
]


@pytest.fixture(scope="module")
def ip_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_ip_prefix"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "ip"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=4, num_buckets=4,
                      doc_meta_cols=("ip",))
    return search.load_store(path)


def _q(text):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def test_ip_prefix_buckets_by_network(spark, ip_store):
    got = (
        search.search_ip_prefix(spark, ip_store, _q("merge"), 24)
        .toPandas().sort_values("prefix").reset_index(drop=True)
    )
    # matched: d0 d1 d2 d4 (d5 'other text' no merge; d3 window only)
    want = {"10.0.0.0": 2, "10.0.1.0": 1, "192.168.3.0": 1}
    assert dict(zip(got["prefix"], got["n_docs"])) == want


def test_ip_prefix_min_doc_count_drops_small_buckets(spark, ip_store):
    got = (
        search.search_ip_prefix(
            spark, ip_store, _q("merge"), 24, min_doc_count=2
        ).toPandas()
    )
    assert dict(zip(got["prefix"], got["n_docs"])) == {"10.0.0.0": 2}


def test_ip_prefix_short_prefix_merges_networks(spark, ip_store):
    got = (
        search.search_ip_prefix(spark, ip_store, _q("merge"), 8)
        .toPandas()
    )
    assert dict(zip(got["prefix"], got["n_docs"])) == {
        "10.0.0.0": 3, "192.0.0.0": 1,
    }


def test_ip_prefix_validation(spark, ip_store):
    with pytest.raises(EngineError, match="1..32"):
        search.search_ip_prefix(spark, ip_store, _q("merge"), 0)
    with pytest.raises(EngineError, match="1..32"):
        search.search_ip_prefix(spark, ip_store, _q("merge"), 33)
    with pytest.raises(EngineError, match="min_doc_count"):
        search.search_ip_prefix(
            spark, ip_store, _q("merge"), 24, min_doc_count=-1
        )
