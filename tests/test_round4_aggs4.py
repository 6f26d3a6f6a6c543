"""Join-field agg family + sampling/CDF/date buckets: ES `children`
agg (+ `parent` reverse), `parent_id` query, `random_sampler` agg,
`percentile_ranks`, and `date_range` — aggregations over the doc
fields the reference ships whole to the engine (lib/handler.js:100,
parent routing lib/handler.js:76-78)."""

import hashlib

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

# parent docs p0/p1 match 'alpha'; children carry a parent ref and a
# lang used as the children-agg bucket. c5 is an orphan (parent not a
# doc); p2 matches nothing.
_DOCS = [
    ("p0", "alpha parent zero", "root", "en"),
    ("p1", "alpha parent one", "root", "de"),
    ("p2", "beta parent two", "root", "en"),
    ("c0", "child text a", "p0", "en"),
    ("c1", "child text b", "p0", "de"),
    ("c2", "child text c", "p1", "en"),
    ("c3", "child text d", "p1", "en"),
    ("c4", "child text e", "p2", "fr"),
    ("c5", "child text f", "zz", "en"),
]


@pytest.fixture(scope="module")
def pc_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_pc_aggs"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "pref", "lang"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id",
                        parent_field="pref")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4)
    return search.load_store(path)


def _q(text="alpha"):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def test_children_agg_buckets_and_parent_reverse(spark, pc_store):
    got = (
        search.search_children_agg(spark, pc_store, _q(), group_col="lang")
        .toPandas().sort_values("group").reset_index(drop=True)
    )
    # matched parents p0,p1 -> children c0..c3: en x3 (two parents),
    # de x1 (one parent); c4/c5 excluded (p2 unmatched, zz not matched)
    assert list(got["group"]) == ["de", "en"]
    assert list(got["n_children"]) == [1, 3]
    assert list(got["n_parents"]) == [1, 2]


def test_children_agg_no_match_is_empty(spark, pc_store):
    got = search.search_children_agg(
        spark, pc_store, _q("zzzzmissing"), group_col="lang"
    )
    assert got.count() == 0


def test_parent_id_fetches_exact_children(spark, pc_store):
    ppdf = pd.DataFrame([(0, "p0"), (1, "p2"), (2, "nope")],
                        columns=["qid", "parent"])
    got = (
        search.search_parent_id(spark, pc_store, ppdf)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    assert list(got[got["qid"] == 0]["doc_id"]) == ["c0", "c1"]
    assert list(got[got["qid"] == 1]["doc_id"]) == ["c4"]
    assert (got["qid"] == 2).sum() == 0
    assert set(got["score_r"]) == {1.0}


def _u(doc_id: str) -> float:
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) / 2**32


def test_random_sampler_matches_md5_uniform(spark, pc_store):
    p = 0.6
    got = search.search_random_sampler(
        spark, pc_store, _q("child text"), probability=p
    ).toPandas()
    kids = [d for d, *_ in _DOCS if d.startswith("c")]
    expect = [d for d in kids if _u(d) < p]
    assert int(got["n_sampled"][0]) == len(expect)
    assert got["est_total"][0] == round(len(expect) / p, 6)


def test_random_sampler_p_one_is_identity(spark, pc_store):
    got = search.search_random_sampler(
        spark, pc_store, _q("child text"), probability=1.0
    ).toPandas()
    assert int(got["n_sampled"][0]) == 6
    assert got["est_total"][0] == 6.0


def test_random_sampler_rejects_bad_probability(spark, pc_store):
    with pytest.raises(EngineError):
        search.search_random_sampler(spark, pc_store, _q(), probability=0.0)


def test_percentile_ranks_exact_cdf(spark, pc_store):
    # matched docs p0,p1 have dl 3 and 3
    got = (
        search.search_percentile_ranks_agg(
            spark, pc_store, _q(), values=(2.0, 3.0, 9.0), value_col="dl"
        )
        .toPandas().sort_values("value").reset_index(drop=True)
    )
    assert list(got["value"]) == [2.0, 3.0, 9.0]
    assert list(got["rank_r"]) == [0.0, 100.0, 100.0]


@pytest.fixture(scope="module")
def dated_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_dated"))
    rows = [
        ("d0", "alpha", "2020-01-15"),
        ("d1", "alpha", "2020-06-01"),
        ("d2", "alpha", "2020-12-31"),
        ("d3", "alpha", "2021-03-01"),
        ("d4", "beta", "2020-02-02"),
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "content", "ts_s"])
    ).selectExpr("doc_id", "content", "CAST(ts_s AS TIMESTAMP) AS ts")
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4)
    return search.load_store(path)


def test_date_range_from_inclusive_to_exclusive(spark, dated_store):
    ranges = [
        ("early", None, "2020-06-01"),
        ("mid", "2020-06-01", "2021-01-01"),
        ("late", "2021-01-01", None),
        ("all", None, None),
        ("none", "2030-01-01", None),
    ]
    got = (
        search.search_date_range_agg(
            spark, dated_store, _q(), ranges=ranges
        )
        .toPandas().set_index("rkey")["n_docs"].to_dict()
    )
    # d1 at 2020-06-01 falls in 'mid' (from inclusive), not 'early'
    # (to exclusive); d4 doesn't match 'alpha'
    assert got == {"early": 1, "mid": 2, "late": 1, "all": 4, "none": 0}


def test_terms_agg_order_by_count_desc_with_floor(spark, pc_store):
    got = (
        search.search_terms_agg(
            spark, pc_store, _q("child text"), group_col="lang",
            order_by="count_desc", min_doc_count=2, size=2,
        )
        .toPandas().sort_values("group").reset_index(drop=True)
    )
    # children c0..c5 all match 'child text': en x4, de x1, fr x1 —
    # floor 2 keeps only en; size 2 can't resurrect dropped buckets
    assert list(got["group"]) == ["en"]
    assert list(got["n_docs"]) == [4]


def test_terms_agg_order_by_rejects_after_key_combo(spark, pc_store):
    with pytest.raises(EngineError):
        search.search_terms_agg(
            spark, pc_store, _q("child"), group_col="lang",
            order_by="count_desc", after_key="a",
        )


def test_min_score_floors_at_presentation_precision(spark, pc_store):
    full = search.search(
        spark, pc_store, _q("child text"), k=10
    ).toPandas()
    floor = sorted(round(s, 6) for s in full["score"])[2]
    got = search.search_min_score(
        spark, pc_store, _q("child text"), min_score=floor, k=10
    ).toPandas()
    keep = [d for d, s in zip(full["doc_id"], full["score"])
            if round(s, 6) >= floor]
    assert sorted(got["doc_id"]) == sorted(keep)


def test_suggest_completions_ctx_ranks_in_context(spark, pc_store):
    pr = pd.DataFrame(
        [(0, "c", "en"), (1, "c", "fr")],
        columns=["qid", "prefix", "context"],
    )
    got = search.suggest_completions_ctx(
        spark, pc_store, pr, context_col="lang", k=5
    ).toPandas()
    en = got[got["qid"] == 0].set_index("suggestion")["df_ctx"].to_dict()
    # en-context docs: p0, c0, c2, c3, c5 — 'child' appears in c0,c2,c3,c5
    assert en.get("child") == 4
    fr = got[got["qid"] == 1].set_index("suggestion")["df_ctx"].to_dict()
    assert fr.get("child") == 1  # only c4 is fr


def test_moving_percentiles_window_excludes_current(spark, pc_store):
    got = (
        search.search_moving_percentiles(
            spark, pc_store, _q("child text"), interval=1.0, window=2,
            pct=0.5,
        )
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    # child docs have dl 3 (all six) -> single bucket; parents don't
    # match -> first (only) bucket has a null moving value
    assert pd.isna(got.iloc[0]["moving_pct_r"])


def test_moving_percentiles_sliding_median(spark, dated_store):
    got = (
        search.search_moving_percentiles(
            spark, dated_store, _q("alpha"), interval=1.0, window=3,
            pct=0.5, value_col="dl",
        )
        .toPandas().sort_values("bucket").reset_index(drop=True)
    )
    # every alpha doc is 1 token -> one bucket only
    assert len(got) == 1 and pd.isna(got.iloc[0]["moving_pct_r"])


def test_bucket_correlation_self_is_one(spark, pc_store):
    # query matching EVERYTHING -> fg == bg -> corr 1 (given >= 2
    # distinct buckets: parents dl=3? children dl=3; parents 'alpha
    # parent zero' dl=3 too... use dl buckets of width 1 over the mixed
    # store: all dl equal -> corr undefined; instead check the shape
    got = search.search_bucket_correlation(
        spark, pc_store, _q("child text alpha parent beta zero one two"),
        interval=1.0,
    ).toPandas()
    assert list(got.columns) == ["qid", "n_buckets", "corr_r"]
    assert int(got["n_buckets"][0]) >= 1


def test_composite_two_source_pairs_and_cursor(spark, pc_store):
    base = search.search_composite_agg(
        spark, pc_store, _q("child text"), group_col="lang",
        interval=1.0,
    ).toPandas().sort_values(["group", "bucket"]).reset_index(drop=True)
    # en x4, de x1, fr x1 children, all dl=3 -> pairs (de,3),(en,3),(fr,3)
    assert list(base["group"]) == ["de", "en", "fr"]
    assert list(base["n_docs"]) == [1, 4, 1]
    page = search.search_composite_agg(
        spark, pc_store, _q("child text"), group_col="lang",
        interval=1.0, size=1, after=("de", 3.0),
    ).toPandas()
    assert list(page["group"]) == ["en"]
