"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape = BASELINE.json input_hint: (repo, path, commit, lang, content), all
strings. Randomness is counter-based (splitmix64 on the doc index), so the
corpus for doc i is identical regardless of partitioning, batch boundaries,
or parallelism — generation scales out via ``spark.range(n).mapInPandas``
with no driver bottleneck and no wall-clock/global-RNG state.

df/tf distributions are Zipf-ish over a fixed 500-entry vocabulary mixing
snake_case, camelCase, PascalCase, keywords, digits and punctuation, so hot
terms exist (skew-handling is exercised) and the code-aware tokenizer has
real boundaries to split.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

SEED = 42
LANGS = ["py", "js", "java", "go", "rs"]
_EXT = {"py": "py", "js": "js", "java": "java", "go": "go", "rs": "rs"}

_SYLL = ["get", "set", "run", "load", "parse", "read", "write", "merge",
         "split", "index", "query", "token", "score", "doc", "term", "block",
         "batch", "shard", "node", "tree", "hash", "list", "map", "heap",
         "sort", "scan", "join", "agg", "push", "pull", "sync", "flush"]
_KEYWORDS = ["def", "class", "import", "return", "function", "for", "while",
             "if", "else", "try", "catch", "self", "this", "new", "null",
             "true", "false", "int", "str", "void", "const", "let", "var",
             "pub", "fn", "struct", "impl", "match", "async", "await"]


def vocabulary() -> list[str]:
    """Fixed 500-entry vocabulary; index order is part of the contract."""
    vocab: list[str] = []
    vocab += _KEYWORDS                                            # 30 hot
    n = len(_SYLL)
    for i in range(170):                                          # snake_case
        a, b = _SYLL[i % n], _SYLL[(i * 7 + 3) % n]
        vocab.append(f"{a}_{b}_{i % 10}")
    for i in range(150):                                          # camelCase
        a, b, c = _SYLL[i % n], _SYLL[(i * 5 + 1) % n], _SYLL[(i * 11 + 2) % n]
        vocab.append(a + b.capitalize() + c.capitalize())
    for i in range(75):                                           # PascalCase
        a, b = _SYLL[(i * 3) % n], _SYLL[(i * 13 + 5) % n]
        vocab.append(a.capitalize() + b.capitalize() + "Handler")
    for i in range(40):                                           # punctuated
        vocab.append(f"{_SYLL[i % n]}({i})")
    for i in range(35):                                           # digits etc.
        vocab.append(f"x{i} = {i * 17};")
    assert len(vocab) == 500
    return vocab


_VOCAB = np.array(vocabulary(), dtype=object)
# Zipf-ish sampling weights over vocab ranks (s=1.1), fixed.
_W = 1.0 / np.power(np.arange(1, 501, dtype=np.float64), 1.1)
_CDF = np.cumsum(_W / _W.sum())


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the counter-based RNG."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(counter: np.ndarray) -> np.ndarray:
    """counter → float64 in [0, 1)."""
    return (_splitmix64(counter) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )


def corpus_pdf(ids: np.ndarray, tokens_scale: int = 1) -> pd.DataFrame:
    """Generate corpus rows for the given doc indices (vectorized).

    ``tokens_scale`` multiplies document length (1 → 50-200 tokens, the unit
    test default; 8 → ~0.4-1.6k tokens, realistic source-file sizes for
    CPU-bound benchmarking)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    base = ids.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(SEED)
    lens = (50 + (_splitmix64(base) % np.uint64(150)).astype(np.int64)) * int(
        tokens_scale
    )
    total = int(lens.sum())
    doc_of_tok = np.repeat(np.arange(n), lens)
    pos_in_doc = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    counters = base[doc_of_tok] + np.uint64(7) * pos_in_doc.astype(np.uint64) \
        + np.uint64(1)
    tok_idx = np.searchsorted(_CDF, _uniform(counters), side="right")
    tokens = _VOCAB[np.clip(tok_idx, 0, 499)]
    content = (
        pd.Series(tokens)
        .groupby(doc_of_tok, sort=True)
        .agg(" ".join)
        .to_numpy()
    )
    lang = np.array(LANGS, dtype=object)[(ids % len(LANGS))]
    w1 = _VOCAB[(_splitmix64(base + np.uint64(2)) % np.uint64(30)).astype(int)]
    repo = np.array([f"org{i % 7}/repo{i % 23}" for i in ids], dtype=object)
    path = np.array(
        [
            f"src/{w}/{'mod'}_{i}.{_EXT[lg]}"
            for w, i, lg in zip(w1, ids, lang)
        ],
        dtype=object,
    )
    commit = np.array(
        [hashlib.sha1(f"commit-{i}".encode()).hexdigest() for i in ids],
        dtype=object,
    )
    return pd.DataFrame(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": content,
        }
    )


def corpus_df(spark, n_docs: int, partitions: int = 32, tokens_scale: int = 1):
    """Distributed deterministic corpus: spark.range → mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield corpus_pdf(pdf["id"].to_numpy(), tokens_scale)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(
            gen,
            schema="repo string, path string, commit string, "
            "lang string, content string",
        )
    )


def queries_pdf() -> pd.DataFrame:
    """Reference query set (FIXTURES.md §3): common/rare/identifier/absent/
    multi-term cases. Deterministic, derived from the fixed vocabulary."""
    vocab = vocabulary()
    qs = [
        "def",                        # hottest keyword
        "return function",            # two hot terms
        vocab[30],                    # a snake_case identifier (splits)
        vocab[200],                   # a camelCase identifier (splits)
        vocab[499],                   # rare tail entry
        "zzznotaterm",                # absent → empty result
        f"import {vocab[205]}",       # hot + camel
        "class struct impl",          # three keywords
        vocab[420],                   # punctuated entry
        "query token score",          # mid-frequency trio
    ]
    return pd.DataFrame(
        {"qid": np.arange(len(qs), dtype=np.int64), "query": qs,
         "k": np.full(len(qs), 10, dtype=np.int64)}
    )
