"""has_parent / has_child joins over the parent routing column the field
mapping resolves at index time (reference /root/reference/lib/handler.js:76-78
— SURVEY.md §2.2 parent-child, upgraded from metadata fidelity to real
query support).
"""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

from .oracle import PyOracle

N_PARENTS = 50  # docs 100..199 are children of docs 0..49 (2 kids each)


@pytest.fixture(scope="module")
def ids(corpus_pdf):
    return (
        corpus_pdf["repo"] + "." + corpus_pdf["path"] + "." + corpus_pdf["commit"]
    ).tolist()


@pytest.fixture(scope="module")
def pc_store(spark, corpus_pdf, ids, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pcidx"))
    pdf = corpus_pdf.copy()
    # getField semantics are strict (a configured field must exist on every
    # record, reference lib/utils.js) — top-level docs point at a sentinel
    # parent id that is not itself a document
    pdf["parent_ref"] = ["root"] * 100 + [
        ids[i % N_PARENTS] for i in range(100)
    ]
    df = spark.createDataFrame(pdf).repartition(4)
    cfg = IndexerConfig(index="code", parent_field="parent_ref")
    build.build_index(df, cfg, path, segment_docs=64, num_buckets=8)
    return search.load_store(path)


@pytest.fixture(scope="module")
def oracle(corpus_pdf, ids):
    return PyOracle(ids, corpus_pdf["content"].tolist())


def _parent_of(ids):
    return {ids[100 + i]: ids[i % N_PARENTS] for i in range(100)}


def test_has_parent_constant_and_scored(spark, pc_store, oracle, ids):
    q = " ".join(oracle.toks[0][:2])
    matched = dict(oracle.topk(q, k=10**9))
    pmap = _parent_of(ids)
    want_children = sorted(c for c, p in pmap.items() if p in matched)
    res = search.search_has_parent(
        spark, pc_store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        k=10**6,
    ).toPandas().sort_values("rank")
    assert list(res["doc_id"]) == want_children
    assert (res["score"] == 1.0).all()

    res_s = search.search_has_parent(
        spark, pc_store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        k=10**6, score=True,
    ).toPandas()
    for _, row in res_s.iterrows():
        assert row["score"] == pytest.approx(
            matched[pmap[row["doc_id"]]], abs=1e-9
        )
    # scored ordering: parent score desc, child doc_id asc
    want_sorted = sorted(
        want_children, key=lambda c: (-matched[pmap[c]], c)
    )
    assert list(res_s.sort_values("rank")["doc_id"]) == want_sorted


@pytest.mark.parametrize("score_mode", ["none", "min", "max", "sum", "avg"])
def test_has_child(spark, pc_store, oracle, ids, score_mode):
    q = " ".join(oracle.toks[120][:2])  # matches child docs too
    matched = dict(oracle.topk(q, k=10**9))
    pmap = _parent_of(ids)
    by_parent: dict[str, list[float]] = {}
    for c, p in pmap.items():
        if c in matched:
            by_parent.setdefault(p, []).append(matched[c])
    fold = {
        "none": lambda v: 1.0,
        "min": min, "max": max, "sum": sum,
        "avg": lambda v: sum(v) / len(v),
    }[score_mode]
    want = {p: float(fold(v)) for p, v in by_parent.items()}
    res = search.search_has_child(
        spark, pc_store, pd.DataFrame([(0, q)], columns=["qid", "query"]),
        k=10**6, score_mode=score_mode,
    ).toPandas()
    assert set(res["doc_id"]) == set(want)
    for _, row in res.iterrows():
        assert row["score"] == pytest.approx(want[row["doc_id"]], abs=1e-9)
    if score_mode == "none":
        assert list(res.sort_values("rank")["doc_id"]) == sorted(want)
    with pytest.raises(EngineError):
        search.search_has_child(
            spark, pc_store,
            pd.DataFrame([(0, q)], columns=["qid", "query"]),
            score_mode="median",
        )


def test_has_parent_no_match(spark, pc_store):
    res = search.search_has_parent(
        spark, pc_store,
        pd.DataFrame([(0, "zzzabsent")], columns=["qid", "query"]),
    ).toPandas()
    assert len(res) == 0
