"""Federated (sharded) search with exact global statistics — the result
must be SHARD-INVARIANT: rank- and score-identical to one store over the
union corpus (ES dfs_query_then_fetch semantics; SURVEY.md §2.2
multi-index routing, upgraded to cross-store federation).
"""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

from .oracle import PyOracle

CFG = IndexerConfig(index="code")


@pytest.fixture(scope="module")
def shards_and_full(spark, corpus_pdf, tmp_path_factory):
    base = tmp_path_factory.mktemp("sharded")
    stores = []
    for name, part in (
        ("a", corpus_pdf.iloc[:100]),
        ("b", corpus_pdf.iloc[100:]),
        ("full", corpus_pdf),
    ):
        path = str(base / name)
        df = spark.createDataFrame(part).repartition(4)
        build.build_index(df, CFG, path, segment_docs=64, num_buckets=8)
        stores.append(search.load_store(path))
    return stores


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    ids = (
        corpus_pdf["repo"] + "." + corpus_pdf["path"] + "." + corpus_pdf["commit"]
    ).tolist()
    return PyOracle(ids, corpus_pdf["content"].tolist())


def test_sharded_is_shard_invariant(spark, shards_and_full, oracle):
    a, b, full = shards_and_full
    qs = [
        (0, " ".join(oracle.toks[0][:2])),
        (1, " ".join(oracle.toks[150][:3])),  # doc on shard b
        (2, "zzzabsent"),
    ]
    qpdf = pd.DataFrame(qs, columns=["qid", "query"])
    sharded = (
        search.search_sharded(spark, [a, b], qpdf, k=10)
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    single = (
        search.search(spark, full, qpdf, k=10)
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    assert list(sharded["doc_id"]) == list(single["doc_id"])
    for gs, ws in zip(sharded["score"], single["score"]):
        assert gs == pytest.approx(ws, abs=1e-9)
    # and the single store itself matches the pure-Python oracle
    for qid, q in qs:
        got = single[single.qid == qid]
        want = oracle.topk(q, k=10)
        assert list(got["doc_id"]) == [d for d, _ in want]


def test_sharded_single_store_degenerates_to_search(
    spark, shards_and_full, oracle
):
    _a, _b, full = shards_and_full
    q = " ".join(oracle.toks[42][:2])
    qpdf = pd.DataFrame([(0, q)], columns=["qid", "query"])
    fed = search.search_sharded(spark, [full], qpdf, k=10).toPandas()
    one = search.search(spark, full, qpdf, k=10).toPandas()
    assert list(fed.sort_values("rank")["doc_id"]) == list(
        one.sort_values("rank")["doc_id"]
    )


def test_sharded_guards(spark, shards_and_full, corpus_df, tmp_path):
    a, _b, _full = shards_and_full
    with pytest.raises(EngineError):
        search.search_sharded(
            spark, [], pd.DataFrame([(0, "x")], columns=["qid", "query"])
        )
    mf_path = str(tmp_path / "mf")
    build.build_index(
        corpus_df, CFG, mf_path, segment_docs=64, num_buckets=8,
        fields=("content", "path"),
    )
    mf = search.load_store(mf_path)
    with pytest.raises(EngineError):
        search.search_sharded(
            spark, [a, mf],
            pd.DataFrame([(0, "x")], columns=["qid", "query"]),
        )


def test_sharded_rejects_dense_id_shards(spark, corpus_df, tmp_path,
                                         shards_and_full):
    a, _b, _full = shards_and_full
    dense_path = str(tmp_path / "dense")
    build.build_index(
        corpus_df, CFG, dense_path, segment_docs=64, num_buckets=8,
        id_mode="dense",
    )
    dense = search.load_store(dense_path)
    with pytest.raises(EngineError, match="dense"):
        search.search_sharded(
            spark, [a, dense],
            pd.DataFrame([(0, "x")], columns=["qid", "query"]),
        )
