"""Term-level + scoring-wrapper queries vs the pure-Python oracle: term /
terms (exact, unanalyzed), constant_score, exists (multi-field metadata),
function_score field_value_factor (SURVEY.md §2.2 — ES query DSL the
reference relies on over its indexed documents, /root/reference/
lib/handler.js:100).
"""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

from .oracle import PyOracle

CFG = IndexerConfig(index="code")


@pytest.fixture(scope="module")
def store(spark, corpus_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tlidx"))
    build.build_index(corpus_df, CFG, path, segment_docs=64, num_buckets=8)
    return search.load_store(path)


@pytest.fixture(scope="module")
def oracle(corpus_pdf):
    ids = (
        corpus_pdf["repo"] + "." + corpus_pdf["path"] + "." + corpus_pdf["commit"]
    ).tolist()
    return PyOracle(ids, corpus_pdf["content"].tolist())


def _assert_rank_identical(got, want, label=""):
    assert len(got) == len(want), f"{label}: {len(got)} vs {len(want)}"
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"{label} rank={i + 1}: doc {gd} != {wd}"
        assert gs == pytest.approx(ws, abs=1e-9), f"{label} rank={i + 1}"


def _got(res, qid=0):
    g = res[res.qid == qid].sort_values("rank")
    return list(zip(g["doc_id"], g["score"]))


def test_terms_exact_no_analysis(spark, store, oracle):
    """'term' queries match the dictionary verbatim: a camelCase input that
    the ANALYZER would split must NOT match (it is not a dictionary term),
    while its lowercase subtokens do."""
    t0, t1 = oracle.toks[0][0], oracle.toks[0][1]
    res = search.search_terms(
        spark, store,
        pd.DataFrame({"qid": [0, 0, 1], "term": [t0, t1, t0 + t1.capitalize()]}),
        k=10,
    ).toPandas()
    _assert_rank_identical(_got(res, 0), oracle.terms_topk([t0, t1], k=10))
    assert len(res[res.qid == 1]) == 0, "unanalyzed camelCase must not match"


def test_terms_vs_match_single_token(spark, store, oracle):
    """For a single lowercase token, term ≡ match."""
    t = oracle.toks[4][0]
    tm = search.search_terms(
        spark, store, pd.DataFrame({"qid": [0], "term": [t]}), k=10
    ).toPandas()
    mt = search.search(
        spark, store, pd.DataFrame({"qid": [0], "query": [t]}), k=10
    ).toPandas()
    _assert_rank_identical(_got(tm), _got(mt))


def test_constant_score(spark, store, oracle):
    t = oracle.toks[2][0]
    res = search.search_terms(
        spark, store, pd.DataFrame({"qid": [0], "term": [t]}),
        k=10, constant_score=1.7,
    ).toPandas()
    want = oracle.terms_topk([t], k=10, constant_score=1.7)
    _assert_rank_identical(_got(res), want, "constant_score")


@pytest.mark.parametrize("modifier,boost_mode", [
    ("log1p", "multiply"), ("sqrt", "sum"), ("none", "multiply"),
])
def test_function_score(spark, store, oracle, modifier, boost_mode):
    q = " ".join(oracle.toks[1][:2])
    res = search.search_function_score(
        spark, store, pd.DataFrame({"qid": [0], "query": [q]}),
        k=10, modifier=modifier, factor_weight=0.5, boost_mode=boost_mode,
    ).toPandas()
    want = oracle.function_score_topk(
        q, k=10, modifier=modifier, factor_weight=0.5, boost_mode=boost_mode
    )
    _assert_rank_identical(_got(res), want, f"{modifier}/{boost_mode}")


def test_function_score_rejects_unknown(spark, store):
    with pytest.raises(EngineError):
        search.search_function_score(
            spark, store, pd.DataFrame({"qid": [0], "query": ["a"]}),
            modifier="exp",
        )


def test_exists_on_multifield(spark, corpus_df, corpus_pdf, tmp_path):
    """exists(field) = docs with >=1 token in that field — answered from
    marker metadata. A corpus where some docs have an empty 'extra' field
    must surface exactly the non-empty ones."""
    from pyspark.sql import functions as F

    df = corpus_df.withColumn(
        "extra",
        F.when(F.length("path") % 2 == 0, F.col("lang")).otherwise(F.lit("")),
    )
    path = str(tmp_path / "exidx")
    build.build_index(
        df, CFG, path, segment_docs=64, num_buckets=8,
        fields=("content", "extra"),
    )
    st = search.load_store(path)
    res = search.search_exists(spark, st, "extra", k=10**6).toPandas()
    ids = (
        corpus_pdf["repo"] + "." + corpus_pdf["path"] + "." + corpus_pdf["commit"]
    )
    want = sorted(ids[corpus_pdf["path"].str.len() % 2 == 0])
    assert sorted(res["doc_id"]) == want
    assert (res["score"] == 1.0).all()
    # ranks are doc_id-ascending and contiguous
    assert list(res.sort_values("rank")["doc_id"]) == want
    with pytest.raises(EngineError):
        search.search_exists(spark, st, "nope")


def test_range_query_bounds(spark, store, oracle):
    """ES range in filter context over the dl metadata column: gte/lt and
    gt/lte bound combinations, constant score, doc_id-ascending ranks."""
    dls = sorted(oracle.dl)
    lo, hi = dls[len(dls) // 4], dls[3 * len(dls) // 4]
    dlmap = dict(zip(oracle.doc_ids, oracle.dl))
    res = search.search_range(
        spark, store, "dl", gte=lo, lt=hi, k=10**6
    ).toPandas().sort_values("rank")
    want = sorted(d for d in oracle.doc_ids if lo <= dlmap[d] < hi)
    assert list(res["doc_id"]) == want
    assert (res["score"] == 1.0).all()

    res2 = search.search_range(
        spark, store, "dl", gt=lo, lte=hi, k=10**6, boost=2.5
    ).toPandas()
    want2 = sorted(d for d in oracle.doc_ids if lo < dlmap[d] <= hi)
    assert sorted(res2["doc_id"]) == want2
    assert (res2["score"] == 2.5).all()

    with pytest.raises(EngineError, match="at least one"):
        search.search_range(spark, store, "dl")


def test_ids_query(spark, store, oracle):
    pick = [oracle.doc_ids[3], oracle.doc_ids[7], "no-such-id"]
    res = search.search_ids(spark, store, pick, k=10).toPandas()
    assert sorted(res["doc_id"]) == sorted(pick[:2])
    assert (res["score"] == 1.0).all()
    assert search.search_ids(spark, store, [], k=5).count() == 0


def test_bool_range_filter_restricts_without_rescoring(spark, store, oracle):
    """bool + range filter: the range clause drops candidates outside the
    dl window but never changes surviving docs' scores (filter context)."""
    q = oracle.toks[0][0]
    qpdf = pd.DataFrame(
        [(0, q, "", "")], columns=["qid", "must", "should", "must_not"]
    )
    dls = sorted(oracle.dl)
    lo, hi = dls[len(dls) // 4], dls[3 * len(dls) // 4]
    base = search.search_bool(spark, store, qpdf, k=10**6).toPandas()
    rng = search.search_bool(
        spark, store, qpdf, k=10**6,
        range_filter={"col": "dl", "gte": lo, "lt": hi},
    ).toPandas()
    dlmap = dict(zip(oracle.doc_ids, oracle.dl))
    want = {d for d in base["doc_id"] if lo <= dlmap[d] < hi}
    assert set(rng["doc_id"]) == want and len(want) > 0
    scores = dict(zip(base["doc_id"], base["score"]))
    for d, s in zip(rng["doc_id"], rng["score"]):
        assert s == pytest.approx(scores[d], abs=1e-9)
    with pytest.raises(EngineError, match="unknown range_filter"):
        search.search_bool(
            spark, store, qpdf, range_filter={"col": "dl", "ge": 1},
        )


def test_match_all_returns_all_live(spark, store, oracle):
    res = search.search_match_all(spark, store, k=10**6).toPandas()
    assert sorted(res["doc_id"]) == sorted(oracle.doc_ids)
    assert (res["score"] == 1.0).all()
    assert list(res.sort_values("rank")["doc_id"]) == sorted(oracle.doc_ids)


def test_range_agg_buckets_and_zero_counts(spark, store, oracle):
    q = oracle.toks[0][0]
    qpdf = pd.DataFrame([(0, q)], columns=["qid", "query"])
    dlmap = dict(zip(oracle.doc_ids, oracle.dl))
    match = {d for d, toks in zip(oracle.doc_ids, oracle.toks) if q in toks}
    buckets = [("lo", None, 40.0), ("hi", 40.0, None),
               ("none", 10**6, None)]
    res = search.search_range_agg(
        spark, store, qpdf, buckets, value_col="dl"
    ).toPandas().set_index("rkey")
    assert res.loc["lo", "n_docs"] == sum(1 for d in match if dlmap[d] < 40)
    assert res.loc["hi", "n_docs"] == sum(1 for d in match if dlmap[d] >= 40)
    assert res.loc["none", "n_docs"] == 0  # empty buckets still appear
    with pytest.raises(EngineError, match="at least one bucket"):
        search.search_range_agg(spark, store, qpdf, [])


def test_decay_param_validation(spark, store):
    qpdf = pd.DataFrame([(0, "a")], columns=["qid", "query"])
    with pytest.raises(EngineError, match="unknown decay"):
        search.search_function_score_decay(
            spark, store, qpdf, origin=0, scale=1, decay_fn="cosine")
    with pytest.raises(EngineError, match="decay must be in"):
        search.search_function_score_decay(
            spark, store, qpdf, origin=0, scale=1, decay=1.0)
    with pytest.raises(EngineError, match="scale must be"):
        search.search_function_score_decay(
            spark, store, qpdf, origin=0, scale=0)


def test_decay_gauss_hits_decay_at_scale(spark, store, oracle):
    """ES parameterization: a doc at dist == scale scores exactly
    base * decay (multiply mode)."""
    import math

    q = oracle.toks[0][0]
    qpdf = pd.DataFrame([(0, q)], columns=["qid", "query"])
    base = search.search(
        spark, store, qpdf, k=10**6, algo="exhaustive"
    ).toPandas()
    dlmap = dict(zip(oracle.doc_ids, oracle.dl))
    origin, scale, decay = 30.0, 20.0, 0.5
    res = search.search_function_score_decay(
        spark, store, qpdf, origin=origin, scale=scale, decay=decay,
        k=10**6, decay_fn="gauss",
    ).toPandas()
    scores = dict(zip(base["doc_id"], base["score"]))
    sigma2 = -(scale**2) / (2.0 * math.log(decay))
    for d, s in zip(res["doc_id"], res["score"]):
        dist = abs(dlmap[d] - origin)
        want = scores[d] * math.exp(-(dist**2) / (2 * sigma2))
        assert s == pytest.approx(want, rel=1e-9)
