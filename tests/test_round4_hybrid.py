"""Hybrid retrieval (ES 8.8+ rrf / linear retrievers) and the
_rank_eval API — the modern search surface over the docs the reference
pipeline ships to the engine (lib/handler.js:100), with dense vectors
riding the doc markers as doc_meta_cols."""

import math

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.functions.bm25 import B, K1
from dynamo2es_lambda_spark.plans import build, search

# 4 docs, 2-d embeddings — small enough to hand-compute both legs
_DOCS = [
    # doc_id, text,            vec
    ("d0", "alpha alpha beta", [1.0, 0.0]),
    ("d1", "alpha beta",       [0.9, 0.1]),
    ("d2", "beta beta",        [0.0, 1.0]),
    ("d3", "alpha",            [0.5, 0.5]),
]
_QVEC = [1.0, 0.0]


def _bm25_alpha_scores():
    """Exact BM25 for query 'alpha' on _DOCS (df=3, N=4, avgdl=2.0)."""
    idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    out = {}
    for doc_id, tf, dl in [("d0", 2, 3), ("d1", 1, 2), ("d3", 1, 1)]:
        norm = tf / (tf + K1 * (1.0 - B + B * dl / 2.0))
        out[doc_id] = round(idf * (K1 + 1.0) * norm, 6)
    return out


def _cos(v):
    n = math.sqrt(sum(x * x for x in v))
    return round(v[0] / n, 6) if n else 0.0


@pytest.fixture(scope="module")
def hybrid_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_hybrid"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "embedding"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("embedding",),
    )
    return search.load_store(path)


def _q(text="alpha"):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def _qv():
    return pd.DataFrame({"qid": [0], "vec": [_QVEC]})


# --------------------------------------------------------------- RRF


def test_rrf_fuses_both_rankings(spark, hybrid_store):
    got = search.search_rrf(
        spark, hybrid_store, _q(), _qv(), k=10, window=10, rank_constant=60
    ).toPandas().sort_values("rank")
    # BM25 leg ranks (rounded-score desc): d3, d0, d1; kNN leg: d0, d1, d3, d2
    brank = {"d3": 1, "d0": 2, "d1": 3}
    krank = {"d0": 1, "d1": 2, "d3": 3, "d2": 4}
    want = {
        d: round(
            (1.0 / (60 + brank[d]) if d in brank else 0.0)
            + (1.0 / (60 + krank[d]) if d in krank else 0.0),
            6,
        )
        for d in ["d0", "d1", "d2", "d3"]
    }
    order = sorted(want, key=lambda d: (-want[d], d))
    assert list(got["doc_id"]) == order
    for _, r in got.iterrows():
        assert r["rrf_r"] == pytest.approx(want[r["doc_id"]], abs=1e-9)


def test_rrf_single_leg_doc_scores_one_reciprocal(spark, hybrid_store):
    got = search.search_rrf(
        spark, hybrid_store, _q(), _qv(), k=10, window=10, rank_constant=60
    ).toPandas()
    d2 = got[got["doc_id"] == "d2"].iloc[0]
    assert d2["rrf_r"] == pytest.approx(round(1.0 / 64, 6))


def test_rrf_window_cuts_legs(spark, hybrid_store):
    got = search.search_rrf(
        spark, hybrid_store, _q(), _qv(), k=10, window=2, rank_constant=60
    ).toPandas()
    # window=2: BM25 keeps {d3, d0}, kNN keeps {d0, d1} — d2 gone entirely
    assert set(got["doc_id"]) == {"d0", "d1", "d3"}


def test_rrf_validates(spark, hybrid_store):
    with pytest.raises(EngineError):
        search.search_rrf(spark, hybrid_store, _q(), _qv(), k=0)


# ------------------------------------------------------------- linear


def test_hybrid_linear_minmax_blend(spark, hybrid_store):
    got = search.search_hybrid_linear(
        spark, hybrid_store, _q(), _qv(), k=10, window=10, alpha=0.5
    ).toPandas().sort_values("rank")
    s = _bm25_alpha_scores()
    mx, mn = max(s.values()), min(s.values())
    bnorm = {d: (v - mn) / (mx - mn) for d, v in s.items()}
    cos = {d: _cos(v) for d, _, v in [(r[0], r[1], r[2]) for r in _DOCS]}
    kmx, kmn = max(cos.values()), min(cos.values())
    knorm = {d: (v - kmn) / (kmx - kmn) for d, v in cos.items()}
    want = {
        d: round(0.5 * bnorm.get(d, 0.0) + 0.5 * knorm.get(d, 0.0), 6)
        for d in ["d0", "d1", "d2", "d3"]
    }
    order = sorted(want, key=lambda d: (-want[d], d))
    assert list(got["doc_id"]) == order
    for _, r in got.iterrows():
        assert r["blend_r"] == pytest.approx(want[r["doc_id"]], abs=1e-6)


def test_hybrid_linear_alpha_extremes(spark, hybrid_store):
    # alpha=1: pure (normalized) BM25 — top hit is the BM25 winner d3
    lex = search.search_hybrid_linear(
        spark, hybrid_store, _q(), _qv(), k=1, window=10, alpha=1.0
    ).toPandas()
    assert list(lex["doc_id"]) == ["d3"]
    # alpha=0: pure vector — top hit is the cosine winner d0
    vec = search.search_hybrid_linear(
        spark, hybrid_store, _q(), _qv(), k=1, window=10, alpha=0.0
    ).toPandas()
    assert list(vec["doc_id"]) == ["d0"]


def test_hybrid_linear_validates(spark, hybrid_store):
    with pytest.raises(EngineError):
        search.search_hybrid_linear(
            spark, hybrid_store, _q(), _qv(), alpha=1.5
        )


# ----------------------------------------------------------- rank_eval


def test_rank_eval_metrics_exact(spark, hybrid_store):
    # ranking for 'alpha' is d3, d0, d1 (rounded-score desc, doc_id asc);
    # judgments: d0 graded 3, d2 graded 1 (d2 unretrieved)
    ratings = spark.createDataFrame(
        pd.DataFrame(
            {"qid": [0, 0], "doc_id": ["d0", "d2"], "rating": [3, 1]}
        )
    )
    got = search.rank_eval(
        spark, hybrid_store, _q(), ratings, k=3, relevant_threshold=1
    ).toPandas()
    m = dict(zip(got["metric"], got["value_r"]))
    assert m["precision_at_k"] == pytest.approx(round(1 / 3, 6))
    assert m["recall_at_k"] == pytest.approx(0.5)
    assert m["mrr"] == pytest.approx(0.5)
    dcg = (2.0 ** 3 - 1) / math.log2(2 + 1)  # d0 at rank 2
    idcg = (2.0 ** 3 - 1) / math.log2(1 + 1) + (2.0 ** 1 - 1) / math.log2(2 + 1)
    assert m["ndcg_at_k"] == pytest.approx(round(dcg / idcg, 6), abs=1e-6)


def test_rank_eval_no_relevant_hits_zeroes(spark, hybrid_store):
    ratings = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "doc_id": ["d2"], "rating": [2]})
    )
    got = search.rank_eval(
        spark, hybrid_store, _q(), ratings, k=3, relevant_threshold=2
    ).toPandas()
    m = dict(zip(got["metric"], got["value_r"]))
    assert m["precision_at_k"] == 0.0
    assert m["mrr"] == 0.0
    assert m["recall_at_k"] == 0.0
    assert m["ndcg_at_k"] == 0.0


def test_rank_eval_validates(spark, hybrid_store):
    ratings = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "doc_id": ["d0"], "rating": [1]})
    )
    with pytest.raises(EngineError):
        search.rank_eval(spark, hybrid_store, _q(), ratings, k=0)

