"""Point-in-time (as-of) reads over the immutable batch log and the
sliced scroll export."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, manage, search

_DOCS = [
    ("d0", "alpha beta", "en", 0),
    ("d1", "alpha gamma", "en", 0),
    ("d2", "alpha delta", "de", 0),
    ("d3", "beta gamma", "de", 0),
]

_CFG = IndexerConfig(index="docs", id_field="docid", version_field="version")


def _corpus(spark):
    return spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["docid", "content", "lang", "version"])
    )


@pytest.fixture(scope="module")
def pit_store(spark, tmp_path_factory):
    """b0 = base build; b1 = delete_by_query('delta'); b2 =
    update_by_query re-indexing d0 at version 1."""
    path = str(tmp_path_factory.mktemp("pit"))
    build.build_index(_corpus(spark), _CFG, path, segment_docs=8,
                      num_buckets=4)
    st = search.load_store(path)
    res = manage.delete_by_query(
        spark, st, pd.DataFrame([(0, "delta")], columns=["qid", "query"])
    )
    assert res["deleted"] == 1
    st = search.load_store(path)
    manage.update_by_query(
        spark, _corpus(spark), st, _CFG,
        pd.DataFrame([(0, "beta")], columns=["qid", "query"]),
        {"content": "concat(content, ' zzmod')", "version": "version + 1"},
    )
    return search.load_store(path)


def _live_ids(spark, store, batch):
    return {
        r["doc_id"]
        for r in manage.live_as_of(spark, store, batch).collect()
    }


def test_live_as_of_replays_batch_prefix(spark, pit_store):
    assert _live_ids(spark, pit_store, 0) == {"d0", "d1", "d2", "d3"}
    assert _live_ids(spark, pit_store, 1) == {"d0", "d1", "d3"}
    # b2 re-indexed d0/d3 (beta matches) at v1 — still live, once
    assert _live_ids(spark, pit_store, 2) == {"d0", "d1", "d3"}
    # as-of accepts 'bN' strings too
    assert _live_ids(spark, pit_store, "b0") == {"d0", "d1", "d2", "d3"}


def test_count_as_of_multi_batch(spark, pit_store):
    got = manage.count_as_of(spark, pit_store, [0, 1], group_col="lang")
    rows = {(r["batch"], r["group"]): r["n_live"] for r in got.collect()}
    assert rows == {(0, "en"): 2, (0, "de"): 2, (1, "en"): 2, (1, "de"): 1}


def test_search_as_of_pins_candidates(spark, pit_store):
    q = pd.DataFrame([(0, "delta")], columns=["qid", "query"])
    old = manage.search_as_of(spark, pit_store, q, 0).toPandas()
    assert list(old["doc_id"]) == ["d2"]  # visible in the past
    now = manage.search_as_of(spark, pit_store, q, 2).toPandas()
    assert now.empty  # deleted at b1
    # the re-indexed doc surfaces exactly once at the latest batch
    qb = pd.DataFrame([(0, "zzmod")], columns=["qid", "query"])
    cur = manage.search_as_of(spark, pit_store, qb, 2).toPandas()
    assert sorted(cur["doc_id"]) == ["d0", "d3"]
    # ...and not before its batch existed
    assert manage.search_as_of(spark, pit_store, qb, 1).toPandas().empty


def test_scroll_sliced_disjoint_and_complete(spark, pit_store):
    full = {
        d
        for page in search.scroll(spark, pit_store, "alpha", page_size=2)
        for d in page["doc_id"]
    }
    seen = []
    for s in range(3):
        for page in search.scroll_sliced(
            spark, pit_store, "alpha", s, 3, page_size=1
        ):
            seen.extend(page["doc_id"])
    assert sorted(seen) == sorted(full)  # disjoint + complete
    with pytest.raises(EngineError):
        next(search.scroll_sliced(spark, pit_store, "alpha", 3, 3))
