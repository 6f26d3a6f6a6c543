"""BPE tokenizer training: pair counting + merge learning vs a pure-
Python reference implementation (the classic Sennrich-style loop)."""

import collections
import re

import pandas as pd
import pytest

from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.functions import analysis
from dynamo2es_lambda_spark.operators import bpe


def _ref_bpe(texts, n_merges, min_count=2):
    """Reference BPE on word counts: arg-max pair (count desc, pair
    asc), greedy left-to-right fuse."""
    words = collections.Counter()
    for t in texts:
        words.update(analysis.tokenize_series(pd.Series([t]))[0])
    vocab = {tuple(w): n for w, n in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        best = [
            (p, c) for p, c in pairs.items() if c >= min_count
        ]
        if not best:
            break
        pair, cnt = min(best, key=lambda x: (-x[1], x[0]))
        merges.append((pair[0], pair[1], cnt))
        out = {}
        for syms, n in vocab.items():
            acc = []
            for x in syms:
                if acc and acc[-1] == pair[0] and x == pair[1]:
                    acc[-1] = pair[0] + pair[1]
                else:
                    acc.append(x)
            out[tuple(acc)] = out.get(tuple(acc), 0) + n
        vocab = out
    return merges


_TEXTS = [
    "the cat sat on the mat",
    "the hats were newest lowest widest",
    "lower low lowest newer new news",
    "aaa abab ababab banana bandana",
]


def test_learn_merges_matches_reference(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(_TEXTS)), "text": _TEXTS})
    )
    got = bpe.bpe_learn_merges(docs, 8, min_count=2)
    want = _ref_bpe(_TEXTS, 8, min_count=2)
    assert got == want


def test_pair_counts_weighted_and_overlapping(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["aaa aaa", "ab"]})
    )
    got = {
        r["pair"]: r["n_pairs"]
        for r in bpe.bpe_pair_counts(docs, min_count=1).collect()
    }
    # "aaa" x2: overlapping (a,a) pairs count twice per word
    assert got["a a"] == 4
    assert got["a b"] == 1
    with pytest.raises(EngineError):
        bpe.bpe_pair_counts(docs, min_count=0)
    with pytest.raises(EngineError):
        bpe.bpe_learn_merges(docs, 0)


def test_learn_merges_stops_when_dry(spark):
    # every word is a single char: no pairs at all
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": "a b c d"}, index=[0])
    )
    assert bpe.bpe_learn_merges(docs, 5) == []


@pytest.mark.parametrize("bs", [1, 3, 8, 32])
def test_batched_merges_equal_sequential(spark, bs):
    """The batch rule must be invisible: any batch_size produces the
    exact sequential merge list (r5 — one job per batch, not per
    merge)."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(_TEXTS)), "text": _TEXTS})
    )
    got = bpe.bpe_learn_merges(docs, 16, min_count=2, batch_size=bs)
    want = _ref_bpe(_TEXTS, 16, min_count=2)
    assert got == want, f"batch_size={bs}"


def test_batched_merges_tie_heavy_corpus(spark):
    """Adversarial ties: many pairs share counts and symbols — the
    barrier rule must fall back toward sequential without diverging."""
    texts = ["ab ab cd cd ac bd", "abcd abcd dcba", "aa bb cc dd aa bb"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    for bs in (2, 4, 16):
        got = bpe.bpe_learn_merges(docs, 10, min_count=2, batch_size=bs)
        want = _ref_bpe(texts, 10, min_count=2)
        assert got == want, f"batch_size={bs}"


def _ref_encode(word, merges):
    """Reference apply (Sennrich order): each merge in sequence, greedy
    left-to-right across the word."""
    syms = list(word)
    for a, b, *_ in merges:
        acc = []
        for x in syms:
            if acc and acc[-1] == a and x == b:
                acc[-1] = a + b
            else:
                acc.append(x)
        syms = acc
    return syms


def test_encode_fertility_matches_reference(spark):
    """bpe_encode_tokens (rank-greedy apply on the distinct-word vocab)
    must reproduce the sequential reference encoding's token counts."""
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(len(_TEXTS)),
            "text": _TEXTS,
            "lang": ["a", "a", "b", "b"],
        })
    )
    merges = bpe.bpe_learn_merges(docs, 12, min_count=2)
    got = {
        r["lang"]: (r["n_words"], r["n_bpe_tokens"], r["fertility_r"])
        for r in bpe.bpe_encode_tokens(docs, merges).collect()
    }
    want = {}
    for lang in ("a", "b"):
        texts = [t for t, g in zip(_TEXTS, ["a", "a", "b", "b"])
                 if g == lang]
        words = []
        for t in texts:
            words.extend(analysis.tokenize_series(pd.Series([t]))[0])
        n_bpe = sum(len(_ref_encode(w, merges)) for w in words)
        want[lang] = (len(words), n_bpe, round(n_bpe / len(words), 6))
    assert got == want


def test_encode_rejects_empty_merges(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["a b"], "lang": ["x"]})
    )
    with pytest.raises(EngineError):
        bpe.bpe_encode_tokens(docs, [])
