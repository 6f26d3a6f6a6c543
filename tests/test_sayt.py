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


def test_cdc_incremental_equals_rebuild_on_sayt_store(
    spark, tmp_path_factory
):
    """A CDC batch on an edge_ngrams store must re-derive the synthetic
    subfields: incremental apply ≡ from-scratch rebuild, compared on the
    type-ahead ranking itself."""
    from dynamo2es_lambda_spark.plans import cdc

    cfg = IndexerConfig(index="docs", id_field="doc_id",
                        version_field="version")
    base = _DOCS.assign(version=0)
    inc_path = str(tmp_path_factory.mktemp("sayt_inc"))
    build.build_index(
        spark.createDataFrame(base), cfg, inc_path,
        segment_docs=4, num_buckets=4, edge_ngrams=(2,),
    )
    events = pd.DataFrame(
        [
            ("INSERT", {"doc_id": "d9"},
             {"doc_id": "d9", "content": "sparkling merge window",
              "version": 1}, None),
            ("MODIFY", {"doc_id": "d0"},
             {"doc_id": "d0", "content": "spark merge replaced text",
              "version": 1},
             {"doc_id": "d0", "content": _DOCS.iloc[0]["content"],
              "version": 0}),
            ("REMOVE", {"doc_id": "d4"}, None,
             {"doc_id": "d4", "content": _DOCS.iloc[4]["content"],
              "version": 0}),
        ],
        columns=["event_name", "keys", "new_image", "old_image"],
    )
    schema = (
        "event_name string, keys struct<doc_id:string>, "
        "new_image struct<doc_id:string,content:string,version:long>, "
        "old_image struct<doc_id:string,content:string,version:long>"
    )
    # compact so collection statistics (df) drop the tombstoned docs —
    # only then is incremental ≡ rebuild exact (ES semantics: deleted
    # docs pollute stats until merge)
    cdc.apply_changes(
        spark.createDataFrame(events, schema=schema),
        cfg, inc_path, segment_docs=4, compact=True,
    )
    # from-scratch twin
    final = pd.DataFrame(
        [
            ("d0", "spark merge replaced text", 1),
            ("d1", _DOCS.iloc[1]["content"], 0),
            ("d2", _DOCS.iloc[2]["content"], 0),
            ("d3", _DOCS.iloc[3]["content"], 0),
            ("d5", _DOCS.iloc[5]["content"], 0),
            ("d9", "sparkling merge window", 1),
        ],
        columns=["doc_id", "content", "version"],
    )
    rb_path = str(tmp_path_factory.mktemp("sayt_rb"))
    build.build_index(
        spark.createDataFrame(final), cfg, rb_path,
        segment_docs=4, num_buckets=4, edge_ngrams=(2,),
    )
    st_inc = search.load_store(inc_path)
    st_rb = search.load_store(rb_path)
    q = _q("spark mer", "merge win", "spar")
    a = (search.search_as_you_type(spark, st_inc, q, k=10).toPandas()
         .sort_values(["qid", "rank"]).reset_index(drop=True))
    b = (search.search_as_you_type(spark, st_rb, q, k=10).toPandas()
         .sort_values(["qid", "rank"]).reset_index(drop=True))
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert np.allclose(a["score"], b["score"], rtol=1e-9)
