"""Round-4 DSL family II: significant_text (index-backed sampled JLH),
scripted_metric (whitelisted map/reduce), _search/template rendering,
and the geo_bounds / geo_centroid metric aggs."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

_DOCS = [
    # "signal" rides with alpha docs only; "noise" is everywhere
    ("d0", "alpha signal noise", 41.0, 7.0, "x"),
    ("d1", "alpha signal noise two", 42.0, 8.0, "x"),
    ("d2", "alpha signal noise three", 43.0, 9.0, "y"),
    ("d3", "beta noise four", -10.0, -20.0, "y"),
    ("d4", "beta noise five", -11.0, -21.0, "z"),
]


@pytest.fixture(scope="module")
def dsl2_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_dsl2"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "lat", "lon",
                                     "grp"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      positions=True,
                      doc_meta_cols=("lat", "lon", "grp"))
    return search.load_store(path)


def _q(text="alpha"):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def test_significant_text_finds_sample_local_term(spark, dsl2_store):
    got = search.significant_text(
        spark, dsl2_store, _q("alpha"), sample_k=3, k=5, min_doc_count=2
    ).toPandas().set_index("term")
    # "signal": fg 3/3 vs bg 3/5 -> strongly significant
    assert got.loc["signal", "fg"] == 3
    assert got.loc["signal", "bg"] == 3
    # "noise" appears in every doc -> fg_rate == bg_rate -> score 0
    assert got.loc["noise", "score_r"] == 0.0
    assert got.loc["signal", "score_r"] > got.loc["alpha", "score_r"] - 1e9
    # beta never occurs in the sampled docs
    assert "beta" not in got.index
    with pytest.raises(EngineError):
        search.significant_text(spark, dsl2_store, _q(), sample_k=0)


def test_scripted_metric_hand_computed(spark, dsl2_store):
    got = search.search_scripted_metric(
        spark, dsl2_store, _q("beta"), map_script="lat + 2 * lon",
        reduce="sum", doc_cols=("lat", "lon"),
    ).toPandas()
    # d3: -10 + 2*-20 = -50 ; d4: -11 + 2*-21 = -53
    assert got["n_docs"][0] == 2
    assert got["metric_r"][0] == -103.0
    with pytest.raises(EngineError):
        search.search_scripted_metric(
            spark, dsl2_store, _q(), map_script="lat", reduce="median"
        )
    with pytest.raises(EngineError):
        search.search_scripted_metric(
            spark, dsl2_store, _q(), map_script="lat + secret_col",
            doc_cols=("lat",),
        )


def test_search_template_renders_and_matches_direct(spark, dsl2_store):
    params = pd.DataFrame(
        [(0, "alpha", "signal"), (1, "beta", "noise")],
        columns=["qid", "a", "b"],
    )
    got = search.search_template(
        spark, dsl2_store, "{{a}} {{b}}", params, k=10
    ).toPandas()
    direct = search.search(
        spark, dsl2_store,
        pd.DataFrame([(0, "alpha signal"), (1, "beta noise")],
                     columns=["qid", "query"]),
        k=10, algo="wand",
    ).toPandas()
    a = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = direct.sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(EngineError):
        search.render_search_template("{{a}} {{missing}}", {"a": 1})
    with pytest.raises(EngineError):
        search.search_template(
            spark, dsl2_store, "{{a}}", pd.DataFrame({"a": [1]})
        )


def test_geo_bounds_and_centroid(spark, dsl2_store):
    b = search.search_geo_bounds_agg(spark, dsl2_store, _q()).toPandas()
    assert (b["top"][0], b["bottom"][0]) == (43.0, 41.0)
    assert (b["left"][0], b["right"][0]) == (7.0, 9.0)
    c = search.search_geo_centroid_agg(spark, dsl2_store, _q()).toPandas()
    assert c["n_docs"][0] == 3
    assert c["lat_r"][0] == 42.0
    assert c["lon_r"][0] == 8.0
