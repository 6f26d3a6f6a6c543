"""Pipeline ops IV: training-window chunking and the interpolated
trigram-LM perplexity filter."""

import math

import pandas as pd
import pytest

from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.operators import chunking, lm


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


# --------------------------------------------------------- chunk_windows

def test_chunk_windows_overlap_and_short_tail(spark):
    # 10 tokens, window=4, stride=3 -> starts 0,3,6,9; last window len 1
    d = _docs(spark, [("d1", " ".join(f"t{i}" for i in range(10)))])
    got = (
        chunking.chunk_windows(d, window=4, stride=3)
        .toPandas().sort_values("start").reset_index(drop=True)
    )
    assert list(got["start"]) == [0, 3, 6, 9]
    assert list(got["win_id"]) == [0, 1, 2, 3]
    assert list(got["n_win_tokens"]) == [4, 4, 4, 1]
    assert list(got["first_tok"]) == ["t0", "t3", "t6", "t9"]


def test_chunk_windows_disjoint_tiling_covers_every_token(spark):
    d = _docs(spark, [("d1", " ".join(f"t{i}" for i in range(9)))])
    got = chunking.chunk_windows(d, window=3, stride=3).toPandas()
    assert int(got["n_win_tokens"].sum()) == 9  # exact partition
    assert sorted(got["start"]) == [0, 3, 6]


def test_chunk_windows_empty_doc_and_validation(spark):
    d = _docs(spark, [("d1", ""), ("d2", "one")])
    got = chunking.chunk_windows(d, window=4, stride=4).toPandas()
    assert set(got["doc_id"]) == {"d2"}  # zero-token doc dropped
    with pytest.raises(EngineError):
        chunking.chunk_windows(d, window=2, stride=3)  # gap drops tokens
    with pytest.raises(EngineError):
        chunking.chunk_windows(d, window=0, stride=1)


# ---------------------------------------------------- trigram perplexity

def test_trigram_perplexity_hand_computed(spark):
    # corpus: one doc "a b a b a" -> trigrams: "a b a", "b a b", "a b a"
    d = _docs(spark, [("d1", "a b a b a")])
    k = 0.5
    l1, l2, l3 = 0.2, 0.3, 0.5
    got = lm.trigram_perplexity(
        d, k_smooth=k, lambdas=(l1, l2, l3)
    ).toPandas()
    assert list(got["n_trigrams"]) == [3]
    # counts: c(a)=3 c(b)=2 T=5 V=2; c(a b)=2 c(b a)=2;
    # c(a b a)=2 c(b a b)=1
    kv = k * 2
    p_aba = (l1 * (3 + k) / (5 + kv)      # w3=a
             + l2 * (2 + k) / (2 + kv)    # c(b a)/c(b)
             + l3 * (2 + k) / (2 + kv))   # c(a b a)/c(a b)
    p_bab = (l1 * (2 + k) / (5 + kv)
             + l2 * (2 + k) / (3 + kv)    # c(a b)/c(a)
             + l3 * (1 + k) / (2 + kv))   # c(b a b)/c(b a)
    want = -(2 * math.log2(p_aba) + math.log2(p_bab)) / 3
    assert abs(float(got["nll_r"][0]) - round(want, 6)) < 1e-6


def test_trigram_perplexity_short_docs_excluded(spark):
    d = _docs(spark, [("d1", "a b"), ("d2", "x y z w")])
    got = lm.trigram_perplexity(d).toPandas()
    assert set(got["doc_id"]) == {"d2"}


def test_trigram_perplexity_lambda_validation(spark):
    d = _docs(spark, [("d1", "a b c")])
    with pytest.raises(EngineError):
        lm.trigram_perplexity(d, lambdas=(0.5, 0.5, 0.5))


def test_trigram_perplexity_rare_trigrams_score_worse(spark):
    # d_common repeats one pattern; d_rare is a one-off sequence.
    common = " ".join(["p q r"] * 6)
    d = _docs(spark, [
        ("c1", common), ("c2", common), ("c3", common),
        ("r1", "zz yy xx ww vv"),
    ])
    got = lm.trigram_perplexity(d).toPandas().set_index("doc_id")
    assert float(got.loc["r1", "nll_r"]) > float(got.loc["c1", "nll_r"])
