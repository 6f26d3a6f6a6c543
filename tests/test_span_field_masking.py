"""span_field_masking: cross-field span composition fuzzed against an
exhaustive position-pair enumeration (the test discipline the other span
kernels use, tests/test_round3.py)."""

import random

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.functions import bm25
from dynamo2es_lambda_spark.plans import build, search

VOCAB = ["ant", "bee", "cat", "dog", "elk", "fox"]


@pytest.fixture(scope="module")
def fuzz_store(spark, tmp_path_factory):
    rng = random.Random(99)
    docs = []
    for i in range(60):
        fa = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 14)))
        fb = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 8)))
        docs.append((f"d{i:02d}", fa, fb))
    path = str(tmp_path_factory.mktemp("sfm"))
    corpus = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "alpha", "beta"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=16, num_buckets=4,
        fields=("alpha", "beta"), positions=True,
    )
    return search.load_store(path), docs


def _brute(docs, ta, tb, slop):
    """Exhaustive reference: unordered cross-field window + summed
    per-field BM25."""
    win = 1 + slop
    toks_a = {d: fa.split() for d, fa, _ in docs}
    toks_b = {d: fb.split() for d, _, fb in docs}
    n = len(docs)
    avg_a = sum(len(v) for v in toks_a.values()) / n
    avg_b = sum(len(v) for v in toks_b.values()) / n
    df_a = sum(1 for v in toks_a.values() if ta in v)
    df_b = sum(1 for v in toks_b.values() if tb in v)
    out = {}
    for d, _fa, _fb in docs:
        pa = [i for i, t in enumerate(toks_a[d]) if t == ta]
        pb = [i for i, t in enumerate(toks_b[d]) if t == tb]
        if not any(abs(x - y) <= win for x in pa for y in pb):
            continue
        s = 0.0
        for tf, df, dl, avg in (
            (len(pa), df_a, len(toks_a[d]), avg_a),
            (len(pb), df_b, len(toks_b[d]), avg_b),
        ):
            s += float(
                bm25.idf(float(n), np.array([float(df)]))[0]
                * (bm25.K1 + 1.0)
                * bm25.tf_norm(
                    np.array([tf]), np.array([float(dl)]), avg
                )[0]
            )
        out[d] = s
    return out


def test_span_field_masking_fuzz_vs_exhaustive(spark, fuzz_store):
    store, docs = fuzz_store
    rng = random.Random(5)
    nontrivial = 0
    for trial in range(12):
        ta, tb = rng.choice(VOCAB), rng.choice(VOCAB)
        slop = rng.randint(0, 4)
        q = pd.DataFrame(
            [(0, ta, "alpha", tb, "beta")],
            columns=["qid", "term_a", "field_a", "term_b", "field_b"],
        )
        rows = search.search_span_field_masking(
            spark, store, q, slop=slop, k=100
        ).collect()
        got = {r.doc_id: r.score for r in rows}
        want = _brute(docs, ta, tb, slop)
        assert set(got) == set(want), (trial, ta, tb, slop)
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-9), (trial, d)
        nontrivial += bool(want)
    assert nontrivial >= 6  # the fuzz actually exercised matches


def test_span_field_masking_guards(spark, fuzz_store):
    store, _ = fuzz_store
    q = pd.DataFrame(
        [(0, "ant bee", "alpha", "cat", "beta")],
        columns=["qid", "term_a", "field_a", "term_b", "field_b"],
    )
    with pytest.raises(EngineError):
        search.search_span_field_masking(spark, store, q)
    same = pd.DataFrame(
        [(0, "ant", "alpha", "ant", "alpha")],
        columns=["qid", "term_a", "field_a", "term_b", "field_b"],
    )
    with pytest.raises(EngineError):
        search.search_span_field_masking(spark, store, same)
