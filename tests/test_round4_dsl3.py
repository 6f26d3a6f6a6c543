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
