"""search_as_you_type: index-time edge-ngram / shingle subfields
(build_index(edge_ngrams=...)) + the bool_prefix type-ahead query
(VERDICT r4 task 9). The typed prefix must be a pure index hit — one
exact dictionary term on the ._index_prefix subfield."""

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.functions import analysis
from dynamo2es_lambda_spark.plans import build, search

_DOCS = pd.DataFrame(
    [
        ("d0", "spark merge window fast"),
        ("d1", "sparkContext merge stream"),
        ("d2", "sparse matrix split"),
        ("d3", "merge window"),
        ("d4", "window function call"),
        ("d5", "superlongidentifiertoken merge"),
    ],
    columns=["doc_id", "content"],
)


@pytest.fixture(scope="module")
def sayt_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sayt"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        spark.createDataFrame(_DOCS), cfg, path,
        segment_docs=4, num_buckets=4, edge_ngrams=(2, 3),
    )
    return search.load_store(path)


def _q(*texts):
    return pd.DataFrame(
        [(i, t) for i, t in enumerate(texts)], columns=["qid", "query"]
    )


def test_store_carries_subfields(sayt_store):
    assert tuple(sayt_store.meta["fields"]) == (
        "content", "content._2gram", "content._3gram",
        "content._index_prefix",
    )
    assert sayt_store.meta["edge_ngrams"] == [2, 3]
    # per-field avgdl exists for every synthetic subfield
    assert set(sayt_store.meta["avgdl_fields"]) == set(
        sayt_store.meta["fields"]
    )


def test_prefix_is_exact_dictionary_term(spark, sayt_store):
    """'spar' must hit ONLY via the _index_prefix subfield terms — and
    match every doc whose tokens start with 'spar' (spark, sparkContext
    → spark+context, sparse)."""
    got = search.search_as_you_type(
        spark, sayt_store, _q("spar"), k=10
    ).toPandas()
    assert set(got["doc_id"]) == {"d0", "d1", "d2"}


def test_shingle_boost_prefers_adjacent_phrase(spark, sayt_store):
    got = (
        search.search_as_you_type(spark, sayt_store, _q("merge win"), k=10)
        .toPandas().sort_values("rank")
    )
    # d3 'merge window' has the 2-gram merge_window AND prefix win → top
    assert got.iloc[0]["doc_id"] == "d3"
    assert "d0" in set(got["doc_id"])


def test_long_prefix_falls_back_to_expansion(spark, sayt_store):
    # 'superlongident' (14 chars) exceeds the indexed 10-char edge grams
    got = search.search_as_you_type(
        spark, sayt_store, _q("superlongident"), k=10
    ).toPandas()
    assert list(got["doc_id"]) == ["d5"]


def test_subfield_dl_bookkeeping(spark, sayt_store):
    """field_dls on the markers must equal the derived stream lengths."""
    stats = (
        sayt_store.doc_stats(spark)
        .select("doc_id", "field_dls")
        .toPandas()
        .set_index("doc_id")
    )
    for _i, row in _DOCS.iterrows():
        toks = list(analysis.tokenize_series(pd.Series([row["content"]]))[0])
        n = len(toks)
        want = [
            n,
            max(n - 1, 0),
            max(n - 2, 0),
            int(sum(min(len(t), 10) for t in toks)),
        ]
        assert list(stats.loc[row["doc_id"], "field_dls"]) == want


def test_edge_ngrams_conflicts(spark, tmp_path):
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    with pytest.raises(EngineError, match="mutually exclusive"):
        build.build_index(
            spark.createDataFrame(_DOCS), cfg, str(tmp_path / "x"),
            fields=("content",), edge_ngrams=(2,),
        )
    with pytest.raises(EngineError, match="2..4"):
        build.build_index(
            spark.createDataFrame(_DOCS), cfg, str(tmp_path / "y"),
            edge_ngrams=(1,),
        )
    path = str(tmp_path / "z")
    build.build_index(
        spark.createDataFrame(_DOCS), cfg, path,
        segment_docs=4, num_buckets=4, edge_ngrams=(2,),
    )
    with pytest.raises(EngineError, match="edge_ngrams"):
        build.build_index(
            spark.createDataFrame(_DOCS), cfg, path,
            segment_docs=4, num_buckets=4, edge_ngrams=(2, 3),
            resume=True,
        )


def test_plain_search_on_root_still_works(spark, sayt_store):
    res = search.search(
        spark, sayt_store, _q("merge window"), k=10
    ).toPandas()
    assert set(res["doc_id"]) >= {"d0", "d3"}
    scores = res.set_index("doc_id")["score"]
    assert np.all(np.isfinite(list(scores)))
