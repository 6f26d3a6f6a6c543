"""End-to-end: build index → search → rank-identity vs the pure-Python
oracle (SURVEY.md §5.2.3-4), plus sha256 invariant and WAND==exhaustive."""

import numpy as np
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.plans import build, search
from dynamo2es_lambda_spark.sources import synthetic

from .oracle import PyOracle

CFG = IndexerConfig(index="code")


@pytest.fixture(scope="module")
def store(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("index"))
    res = build.build_index(
        corpus_df, CFG, path, segment_docs=64, num_buckets=8
    )
    assert res.n_docs == 200
    assert res.n_blocks > 0
    return search.load_store(path)


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    ids = (
        corpus_pdf["repo"] + "." + corpus_pdf["path"] + "." + corpus_pdf["commit"]
    ).tolist()
    return PyOracle(ids, corpus_pdf["content"].tolist())


def _assert_rank_identical(got, want, qid):
    assert len(got) == len(want), f"qid={qid}: {len(got)} vs {len(want)} rows"
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"qid={qid} rank={i + 1}: doc {gd} != {wd}"
        assert gs == pytest.approx(ws, abs=1e-9), f"qid={qid} rank={i + 1}"


@pytest.mark.parametrize("algo", ["exhaustive", "wand"])
def test_rank_identity_vs_oracle(spark, store, oracle, queries_pdf, algo):
    res = search.search(spark, store, queries_pdf, k=10, algo=algo).toPandas()
    for qid, q in zip(queries_pdf["qid"], queries_pdf["query"]):
        got = res[res.qid == qid].sort_values("rank")
        want = oracle.topk(q, k=10)
        _assert_rank_identical(
            list(zip(got["doc_id"], got["score"])), want, qid
        )


def test_and_mode_vs_oracle(spark, store, oracle, queries_pdf):
    res = search.search(spark, store, queries_pdf, k=10, mode="and").toPandas()
    for qid, q in zip(queries_pdf["qid"], queries_pdf["query"]):
        got = res[res.qid == qid].sort_values("rank")
        want = oracle.topk(q, k=10, mode="and")
        _assert_rank_identical(
            list(zip(got["doc_id"], got["score"])), want, qid
        )


def test_absent_term_empty(spark, store):
    import pandas as pd

    res = search.search(
        spark, store, pd.DataFrame({"qid": [0], "query": ["zzznotaterm"]})
    )
    assert res.count() == 0


def test_sha256_invariant(corpus_df, store):
    assert build.verify_sha256(corpus_df, CFG, store.path) == 0


def test_doc_stats_match_oracle(spark, store, oracle):
    ds = store.doc_stats(spark).orderBy("doc_id").toPandas()
    assert ds["doc_id"].tolist() == oracle.doc_ids
    assert ds["dl"].tolist() == oracle.dl.tolist()
    # doc_ints are unique (batch|partition|row bit layout, operators/ids.py)
    assert ds["doc_int"].is_unique
    assert store.meta["n_docs"] == oracle.n_docs
    assert store.meta["avgdl"] == pytest.approx(oracle.avgdl)


def test_term_stats_match_oracle(spark, store, oracle):
    ts = store.term_stats(spark).toPandas().set_index("term")["df"].to_dict()
    assert ts == oracle.df


def test_parallelism_determinism(spark, corpus_pdf, tmp_path_factory, store):
    """Same corpus, different partitioning → byte-identical doc assignment
    and identical search results (SURVEY.md §5.2.7)."""
    path2 = str(tmp_path_factory.mktemp("index2"))
    df2 = spark.createDataFrame(corpus_pdf).repartition(13)
    build.build_index(df2, CFG, path2, segment_docs=64, num_buckets=8)
    store2 = search.load_store(path2)
    q = synthetic.queries_pdf()
    r1 = (
        search.search(spark, store, q, k=10)
        .orderBy("qid", "rank").toPandas()
    )
    r2 = (
        search.search(spark, store2, q, k=10)
        .orderBy("qid", "rank").toPandas()
    )
    assert r1["doc_id"].tolist() == r2["doc_id"].tolist()
    assert np.allclose(r1["score"], r2["score"], atol=1e-12)


def test_index_routing_filter(spark, corpus_pdf, tmp_path_factory):
    """Multi-index routing (lib/handler.js:60-62): search(index=...) returns
    only docs routed to that index, equal to the unfiltered ranking
    restricted to them (ES filtered-query semantics: global stats)."""
    from dynamo2es_lambda_spark import IndexerConfig

    path = str(tmp_path_factory.mktemp("routed"))
    cfg = IndexerConfig(index_prefix="code-", index_field="lang")
    df = spark.createDataFrame(corpus_pdf).repartition(4)
    build.build_index(df, cfg, path, segment_docs=64, num_buckets=8)
    store = search.load_store(path)
    q = synthetic.queries_pdf().iloc[:3]
    py_docs = set(
        (corpus_pdf[corpus_pdf.lang == "py"]["repo"] + "."
         + corpus_pdf[corpus_pdf.lang == "py"]["path"] + "."
         + corpus_pdf[corpus_pdf.lang == "py"]["commit"]).tolist()
    )
    for algo in ("exhaustive", "wand"):
        full = search.search(spark, store, q, k=500, algo=algo).toPandas()
        filt = search.search(
            spark, store, q, k=10, algo=algo, index="code-py"
        ).toPandas()
        assert set(filt["doc_id"]) <= py_docs
        for qid in filt["qid"].unique():
            want = (
                full[(full.qid == qid) & full.doc_id.isin(py_docs)]
                .sort_values(["score", "doc_id"], ascending=[False, True])
                .head(10)["doc_id"]
                .tolist()
            )
            got = filt[filt.qid == qid].sort_values("rank")["doc_id"].tolist()
            assert got == want, (algo, qid)
