"""span_multi (prefix-in-span, SpanOr rewrite) and script_fields
(whitelisted derived fields on hits)."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

_DOCS = [
    ("d0", "merge window open"),
    ("d1", "merged window close"),
    ("d2", "merge pane window"),
    ("d3", "window merge"),
    ("d4", "mercury rising fast"),
    ("d5", "slow merge window"),
]


@pytest.fixture(scope="module")
def sm_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_span_multi"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      positions=True)
    return search.load_store(path)


def _q(text):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def test_span_multi_matches_expanded_spans_only(spark, sm_store):
    got = (
        search.search_span_multi(spark, sm_store, _q("mer* window"))
        .toPandas().sort_values("doc_id")
    )
    # 'merge window' (d0) and 'merged window' (d1) match; d2 has an
    # intervening token, d3 is reversed, d4 'mercury' isn't followed by
    # window, d5 matches via 'merge window'
    assert sorted(got["doc_id"]) == ["d0", "d1", "d5"]


def test_span_multi_equals_explicit_span_or(spark, sm_store):
    got = (
        search.search_span_multi(spark, sm_store, _q("mer* window"))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    # the rewrite target, spelled by hand over the dictionary expansions
    cl = pd.DataFrame(
        [(0, "merge window"), (0, "merged window"),
         (0, "mercury window")],
        columns=["qid", "clause"],
    )
    want = (
        search.search_span_or(spark, sm_store, cl)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert [round(s, 9) for s in got["score"]] == [
        round(s, 9) for s in want["score"]
    ]


def test_span_multi_expansion_cap_is_term_ascending(spark, sm_store):
    # term-ascending: 'mercury' < 'merge' < 'merged'; cap 1 keeps only
    # 'mercury' (no 'mercury window' anywhere), cap 2 adds 'merge'
    got1 = search.search_span_multi(
        spark, sm_store, _q("mer* window"), max_expansions=1
    ).toPandas()
    assert len(got1) == 0
    got2 = search.search_span_multi(
        spark, sm_store, _q("mer* window"), max_expansions=2
    ).toPandas()
    assert sorted(got2["doc_id"]) == ["d0", "d5"]


def test_span_multi_rejects_zero_or_two_stars(spark, sm_store):
    with pytest.raises(EngineError):
        search.search_span_multi(spark, sm_store, _q("merge window"))
    with pytest.raises(EngineError):
        search.search_span_multi(spark, sm_store, _q("mer* win*"))


def test_span_multi_absent_prefix_is_empty(spark, sm_store):
    got = search.search_span_multi(spark, sm_store, _q("zzz* window"))
    assert got.count() == 0


def test_script_fields_values_and_base_ranking(spark, sm_store):
    got = (
        search.search_script_fields(
            spark, sm_store, _q("merge window"),
            scripts={"dl_x2_r": "dl * 2", "scaled_r": "_score / 2"},
        )
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    base = (
        search.search(spark, sm_store, _q("merge window"))
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert set(got["doc_id"]) == set(base["doc_id"])
    row = got[got["doc_id"] == "d0"].iloc[0]
    assert row["dl_x2_r"] == 6.0  # d0 'merge window open' is 3 tokens
    # scaled_r rounds the UNROUNDED score/2 — compare with tolerance
    assert abs(row["scaled_r"] - row["score_r"] / 2) < 1e-6
    row3 = got[got["doc_id"] == "d3"].iloc[0]
    assert row3["dl_x2_r"] == 4.0  # d3 'window merge' is 2 tokens


def test_script_fields_rejects_unknown_identifier(spark, sm_store):
    with pytest.raises(EngineError):
        search.search_script_fields(
            spark, sm_store, _q("merge"), scripts={"x": "evil_col + 1"}
        )


def test_script_fields_rejects_reserved_name(spark, sm_store):
    with pytest.raises(EngineError):
        search.search_script_fields(
            spark, sm_store, _q("merge"), scripts={"doc_id": "dl"}
        )


@pytest.fixture(scope="module")
def mf_pos_store(spark, tmp_path_factory):
    """Multi-field store WITH positions (content + src)."""
    path = str(tmp_path_factory.mktemp("r4_mfpos"))
    rows = [
        ("d0", "merge window open", "alpha"),
        ("d1", "merged window close", "beta"),
        ("d2", "merge pane window", "alpha"),
        ("d3", "window merge", "gamma"),
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "content", "src"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      positions=True, fields=("content", "src"))
    return search.load_store(path)


def test_script_query_filters_on_predicate(spark, mf_pos_store):
    # mf dl is total tokens across fields: d0=4 d1=4 d2=4 d3=3
    got = search.search_script_query(
        spark, mf_pos_store, _q("merge window"), "dl % 2 = 1",
        field="content",
    ).toPandas()
    assert list(got["doc_id"]) == ["d3"]
    assert set(got["score"]) == {1.0}


def test_script_query_rejects_score_identifier(spark, mf_pos_store):
    with pytest.raises(EngineError):
        search.search_script_query(
            spark, mf_pos_store, _q("merge"), "_score > 1"
        )


def test_matched_queries_names_and_scores(spark, mf_pos_store):
    cl = pd.DataFrame(
        [(0, "a", "merge"), (0, "b", "window close")],
        columns=["qid", "name", "clause"],
    )
    got = (
        search.search_matched_queries(spark, mf_pos_store, cl,
                                      field="content")
        .toPandas().set_index("doc_id")
    )
    # d1 'merged window close': clause a misses ('merged' != 'merge')
    assert got.loc["d1", "matched"] == "b"
    assert got.loc["d0", "matched"] == "a,b"
    assert got.loc["d3", "matched"] == "a,b"
    # score equals the plain bool-should score over the union of terms
    base = (
        search.search(spark, mf_pos_store,
                      _q("merge window close"), field="content")
        .toPandas().set_index("doc_id")
    )
    for d in got.index:
        assert abs(got.loc[d, "score"] - base.loc[d, "score"]) < 1e-9


def test_multi_match_phrase_best_fields(spark, mf_pos_store):
    got = search.multi_match_phrase(
        spark, mf_pos_store, _q("merge window"),
        {"content": 1.0, "src": 2.0}, tie_breaker=0.0,
    ).toPandas()
    # phrase occurs only in d0's content
    assert list(got["doc_id"]) == ["d0"]
    # single-token phrase hits the src field with boost
    got2 = search.multi_match_phrase(
        spark, mf_pos_store, _q("alpha"), {"content": 1.0, "src": 2.0}
    ).toPandas()
    assert sorted(got2["doc_id"]) == ["d0", "d2"]


def test_multi_match_phrase_tie_breaker_adds_second_field(
    spark, mf_pos_store
):
    # 'merge' is a one-token phrase present in content (d0,d2,d3) only;
    # with tie_breaker the (absent) src side adds nothing — scores equal
    # the plain phrase score
    a = search.multi_match_phrase(
        spark, mf_pos_store, _q("merge"), {"content": 1.0, "src": 1.0},
        tie_breaker=0.5,
    ).toPandas().set_index("doc_id")["score"]
    b = search.search_phrase(
        spark, mf_pos_store, _q("merge"), field="content"
    ).toPandas().set_index("doc_id")["score"]
    assert set(a.index) == set(b.index)
    for d in a.index:
        assert abs(a[d] - b[d]) < 1e-9
