"""span_containing / span_within: kernel fuzz vs exhaustive
enumeration (the round-3 harness pattern) + end-to-end store checks."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search
from tests.test_round3 import _mk_by_term


def _brute_contain(docs_tokens, big, little, mode):
    out = []
    lb, ll = len(big), len(little)
    for i, d in enumerate(docs_tokens):
        bigs = [p for p in range(len(d) - lb + 1)
                if list(d[p:p + lb]) == list(big)]
        lits = [p for p in range(len(d) - ll + 1)
                if list(d[p:p + ll]) == list(little)]
        pairs = (
            (b, l) for b in bigs for l in lits
        )
        if any(b <= l and l + ll <= b + lb for b, l in pairs):
            out.append(i)
    return out


_doc_strat = st.lists(st.sampled_from("abc"), min_size=0, max_size=12)


@settings(max_examples=200, deadline=None)
@given(
    docs=st.lists(_doc_strat, min_size=1, max_size=6),
    big=st.lists(st.sampled_from("abc"), min_size=1, max_size=3),
    little=st.lists(st.sampled_from("abc"), min_size=1, max_size=3),
    mode=st.sampled_from(["containing", "within"]),
)
def test_contain_kernel_matches_brute_force(docs, big, little, mode):
    by = _mk_by_term(docs)
    if any(t not in by for t in set(big) | set(little)):
        return  # absent term kills the qid in production
    keep, other = (big, little) if mode == "containing" else (little, big)
    cand = np.arange(len(docs), dtype=np.int64)
    stride = 64
    starts = search._span_chain_starts(by, list(keep), cand, stride)
    want = _brute_contain(docs, big, little, mode)
    if starts is None or starts.size == 0:
        assert want == []
        return
    ostarts = search._span_chain_starts(by, list(other), cand, stride)
    kept = search._span_contain_filter(
        starts, ostarts, stride, len(keep), len(other),
        keep_is_big=(mode == "containing"),
    )
    got = sorted(np.unique(kept // stride).tolist())
    assert got == want


@pytest.fixture(scope="module")
def span_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_span_contain"))
    docs = [
        ("d0", "x slow hash batch y"),      # trigram present
        ("d1", "slow hash z hash batch"),   # pieces, never the trigram
        ("d2", "slow hash batch slow hash"),
        ("d3", "hash batch only"),
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "content"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, num_buckets=4, positions=True)
    return search.load_store(path)


def test_span_containing_end_to_end(spark, span_store):
    q = pd.DataFrame(
        [(0, "slow hash batch", "hash batch")],
        columns=["qid", "big", "little"],
    )
    got = search.search_span_containing(
        spark, span_store, q, k=10, mode="containing"
    ).toPandas()
    assert sorted(got["doc_id"]) == ["d0", "d2"]


def test_span_within_end_to_end(spark, span_store):
    q = pd.DataFrame(
        [(0, "slow hash batch", "slow hash")],
        columns=["qid", "big", "little"],
    )
    got = search.search_span_containing(
        spark, span_store, q, k=10, mode="within"
    ).toPandas()
    assert sorted(got["doc_id"]) == ["d0", "d2"]
    with pytest.raises(EngineError):
        search.search_span_containing(
            spark, span_store, q, k=10, mode="overlaps"
        )
