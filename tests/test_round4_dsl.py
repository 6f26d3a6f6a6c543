"""Query-DSL stragglers: terms_set (per-doc minimum_should_match),
runtime fields, collapse + inner_hits, intervals, _msearch."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

_DOCS = [
    # doc_id, text,                       need, grp
    ("d0", "alpha beta gamma delta",      1, "g0"),
    ("d1", "alpha beta",                  2, "g0"),
    ("d2", "alpha",                       2, "g1"),   # 1 match < need 2
    ("d3", "alpha beta gamma",            3, "g1"),
    ("d4", "alpha gap gap beta end",      1, "g2"),
]


@pytest.fixture(scope="module")
def dsl_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_dsl"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "need", "grp"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      positions=True, doc_meta_cols=("need", "grp"))
    return search.load_store(path)


def _q(text, qid=0):
    return pd.DataFrame([(qid, text)], columns=["qid", "query"])


def test_terms_set_per_doc_msm(spark, dsl_store):
    got = search.search_terms_set(
        spark, dsl_store, _q("alpha beta gamma"), msm_expr="need"
    ).toPandas()
    by_doc = {r["doc_id"]: r["nt"] for _, r in got.iterrows()}
    # d0 matches 3 >= 1, d1 2 >= 2, d3 3 >= 3, d4 2 >= 1; d2 1 < 2 out
    assert set(by_doc) == {"d0", "d1", "d3", "d4"}
    assert by_doc["d1"] == 2 and by_doc["d3"] == 3
    # expression clamps to >= 1: need - 5 would be negative
    all_in = search.search_terms_set(
        spark, dsl_store, _q("alpha"), msm_expr="need - 5"
    ).toPandas()
    assert len(all_in) == 5


def test_runtime_terms_agg(spark, dsl_store):
    got = search.search_runtime_terms_agg(
        spark, dsl_store, _q("alpha"),
        {"parity": "CASE WHEN need % 2 = 0 THEN 'even' ELSE 'odd' END",
         "dbl": "CAST(need * 2 AS DOUBLE)"},
        group_field="parity", avg_field="dbl",
    ).toPandas()
    m = {r["group"]: (r["n_docs"], r["avg_r"]) for _, r in got.iterrows()}
    assert m["even"] == (2, 4.0)       # d1, d2: need 2 -> dbl 4
    assert m["odd"] == (3, pytest.approx(round(10 / 3, 6)))  # 1,3,1


def test_collapse_inner_hits(spark, dsl_store):
    got = search.search_collapse_inner_hits(
        spark, dsl_store, _q("alpha beta"), collapse_col="grp",
        k=2, inner_size=2,
    ).toPandas()
    # every surviving group shows at most inner_size docs, groups rank
    # by their best doc and only k groups survive
    assert got["group_rank"].max() <= 2
    assert set(got.groupby("group")["inner_rank"].max()) <= {1, 2}
    assert got[got["inner_rank"] == 1].groupby("group").size().eq(1).all()
    with pytest.raises(EngineError):
        search.search_collapse_inner_hits(
            spark, dsl_store, _q("alpha"), "grp", k=0
        )


def test_intervals_max_gaps(spark, dsl_store):
    # "alpha beta" with 2 gaps: d4 has alpha .. .. beta (2 wasted slots)
    tight = search.search_intervals(
        spark, dsl_store, _q("alpha beta"), max_gaps=0, k=10
    ).toPandas()
    loose = search.search_intervals(
        spark, dsl_store, _q("alpha beta"), max_gaps=2, k=10
    ).toPandas()
    assert "d4" not in set(tight["doc_id"])
    assert "d4" in set(loose["doc_id"])
    assert set(tight["doc_id"]) < set(loose["doc_id"])
    with pytest.raises(EngineError):
        search.search_intervals(spark, dsl_store, _q("a b"), max_gaps=-1)


def test_msearch_slots(spark, dsl_store):
    got = search.msearch(
        spark, dsl_store,
        [
            {"slot": 0, "kind": "match", "query": "alpha"},
            {"slot": 1, "kind": "match_and", "query": "alpha gamma"},
            {"slot": 2, "kind": "phrase", "query": "beta gamma"},
        ],
        k=10,
    ).toPandas()
    by_slot = {s: set(g["doc_id"]) for s, g in got.groupby("slot")}
    assert by_slot[0] == {"d0", "d1", "d2", "d3", "d4"}
    assert by_slot[1] == {"d0", "d3"}
    assert by_slot[2] == {"d0", "d3"}
    # ranks are per-slot and contiguous from 1
    for _, g in got.groupby("slot"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    with pytest.raises(EngineError):
        search.msearch(
            spark, dsl_store, [{"slot": 0, "kind": "nope", "query": "x"}]
        )
