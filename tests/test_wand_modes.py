"""WAND-path minimum_should_match / AND mode / search_after (VERDICT r4
task 2): the pruned scorer must agree bit-for-bit with the exhaustive
scorer on every query set — msm folds in as a distinct-term floor on the
heap threshold, AND as mandatory-term intersection, search_after as a
cursor-certified threshold seed (plans/search._score_wand).
"""

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.plans import build, search

CFG = IndexerConfig(index="code")


@pytest.fixture(scope="module")
def store(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wandidx"))
    # small segments → many (qid, seg) scorer groups → pruning exercised
    build.build_index(
        corpus_df, CFG, path, segment_docs=32, num_buckets=8
    )
    return search.load_store(path)


@pytest.fixture(scope="module")
def qsets(queries_pdf):
    multi = queries_pdf[
        queries_pdf["query"].str.split().str.len() >= 2
    ].reset_index(drop=True)
    return queries_pdf, multi


def _pages(res):
    pdf = res.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    return pdf


def _assert_same(wand, exh):
    w, e = _pages(wand), _pages(exh)
    assert list(w["qid"]) == list(e["qid"])
    assert list(w["doc_id"]) == list(e["doc_id"])
    assert np.allclose(w["score"], e["score"], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("msm", [2, 3])
def test_wand_msm_equals_exhaustive(spark, store, qsets, msm):
    _, multi = qsets
    kw = dict(k=10, minimum_should_match=msm)
    _assert_same(
        search.search(spark, store, multi, algo="wand", **kw),
        search.search(spark, store, multi, algo="exhaustive", **kw),
    )


def test_wand_and_mode_equals_exhaustive(spark, store, qsets):
    full, _ = qsets
    kw = dict(k=10, mode="and")
    _assert_same(
        search.search(spark, store, full, algo="wand", **kw),
        search.search(spark, store, full, algo="exhaustive", **kw),
    )


def test_wand_and_mode_absent_term_matches_nothing(spark, store):
    q = pd.DataFrame([(0, "def absentzzz")], columns=["qid", "query"])
    res = search.search(spark, store, q, algo="wand", mode="and", k=10)
    assert res.count() == 0


def test_wand_search_after_pages_tile(spark, store, qsets):
    """Paginate the whole ranking with the WAND cursor: the concatenation
    of pages must equal the one-shot deep ranking, per qid."""
    full, _ = qsets
    one = full.iloc[[0]].reset_index(drop=True)
    deep = _pages(search.search(spark, store, one, algo="wand", k=1000))
    pages, cursor = [], None
    for _ in range(200):
        res = search.search(
            spark, store, one, algo="wand", k=7, search_after=cursor
        )
        pdf = _pages(res)
        if not len(pdf):
            break
        pages.append(pdf)
        cursor = (
            float(pdf.iloc[-1]["score"]), str(pdf.iloc[-1]["doc_id"])
        )
    tiled = pd.concat(pages, ignore_index=True)
    assert list(tiled["doc_id"]) == list(deep["doc_id"])
    assert np.allclose(tiled["score"], deep["score"], rtol=1e-9)


def test_wand_search_after_equals_exhaustive_mid_page(spark, store, qsets):
    full, _ = qsets
    page1 = _pages(search.search(spark, store, full, algo="wand", k=5))
    for qid in sorted(page1["qid"].unique())[:3]:
        last = page1[page1["qid"] == qid].iloc[-1]
        sub = full[full["qid"] == qid].reset_index(drop=True)
        cur = (float(last["score"]), str(last["doc_id"]))
        _assert_same(
            search.search(
                spark, store, sub, algo="wand", k=5, search_after=cur
            ),
            search.search(
                spark, store, sub, algo="exhaustive", k=5, search_after=cur
            ),
        )


def test_wand_msm_with_deletes_constraints(spark, store, qsets, tmp_path):
    """msm + the cogrouped dead-list path: delete a handful of docs, the
    gated wand ranking must still match exhaustive."""
    _, multi = qsets
    import shutil

    path2 = str(tmp_path / "delidx")
    shutil.copytree(store.path, path2)
    st2 = search.load_store(path2)
    from dynamo2es_lambda_spark.plans import manage

    res = manage.delete_by_query(
        spark, st2,
        pd.DataFrame([(0, multi.iloc[0]["query"].split()[0])],
                     columns=["qid", "query"]),
    )
    assert res["deleted"] > 0
    st2 = search.load_store(path2)
    assert st2.n_dead() > 0
    kw = dict(k=10, minimum_should_match=2)
    _assert_same(
        search.search(spark, st2, multi, algo="wand", **kw),
        search.search(spark, st2, multi, algo="exhaustive", **kw),
    )
