"""The Arrow/RE2 ASCII fast path of the build's counting pipeline must
produce the exact row multiset of the pinned pandas tokenizer + counting
kernel, and must refuse (return None) whenever a batch holds non-ASCII
text so the pandas path stays authoritative there."""

import random
import string

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark.functions.analysis import (
    term_freqs_from_tokens,
    term_rows_arrow_fast,
    tokenize_series,
)


def _reference(doc_ids, texts):
    toks = tokenize_series(texts)
    dl = toks.map(len).to_numpy(dtype=np.int64)
    return term_freqs_from_tokens(doc_ids, toks, dl)


def _normalize(df):
    return (
        df.sort_values(["doc_int", "term"], ignore_index=True)
        if len(df)
        else df
    )


ALPH = (
    string.ascii_letters + string.digits + "_-./:, \t\n(){}[]#@!$%^&*"
)


def _rand_text(rng, n):
    return "".join(rng.choice(ALPH) for _ in range(n))


def test_fuzz_matches_pandas_kernel():
    rng = random.Random(1234)
    for trial in range(30):
        n = rng.randint(1, 40)
        texts = []
        for _ in range(n):
            kind = rng.random()
            if kind < 0.1:
                texts.append(None)
            elif kind < 0.2:
                texts.append("")
            elif kind < 0.4:
                # camel/acronym-heavy
                texts.append(
                    " ".join(
                        rng.choice(
                            ["HTTPServer", "fooBar", "XMLHttpRequest2Go",
                             "snake_case_id", "ABCDef", "FOO2bar",
                             "v2Beta3", "a1B2c3D4"]
                        )
                        for _ in range(rng.randint(1, 8))
                    )
                )
            else:
                texts.append(_rand_text(rng, rng.randint(0, 200)))
        s = pd.Series(texts, dtype=object)
        ids = np.arange(n, dtype=np.int64) * 7 - 3
        fast = term_rows_arrow_fast(ids, s)
        assert fast is not None
        ref = _reference(ids, s)
        pd.testing.assert_frame_equal(
            _normalize(fast), _normalize(ref), check_like=False
        )


def test_non_ascii_falls_back():
    s = pd.Series(["plain ascii", "naïve café"], dtype=object)
    assert term_rows_arrow_fast(np.array([0, 1], dtype=np.int64), s) is None


def test_empty_and_separator_only():
    s = pd.Series(["", "   ", "___", None], dtype=object)
    ids = np.arange(4, dtype=np.int64)
    fast = term_rows_arrow_fast(ids, s)
    ref = _reference(ids, s)
    assert fast is not None and len(fast) == 0 and len(ref) == 0
    assert list(fast.columns) == list(ref.columns)
    assert [str(t) for t in fast.dtypes] == [str(t) for t in ref.dtypes]


@pytest.mark.parametrize("txt,want", [
    ("HTTPServer", ["http", "server"]),
    ("fooBar baz_Qux", ["foo", "bar", "baz", "qux"]),
    ("FOO2bar", ["foo2bar"]),
    ("Server2Go", ["server2", "go"]),
])
def test_pinned_analyzer_vectors(txt, want):
    s = pd.Series([txt], dtype=object)
    fast = term_rows_arrow_fast(np.array([0], dtype=np.int64), s)
    assert fast is not None
    got = sorted(fast["term"].tolist())
    assert got == sorted(set(want))
    ref = _reference(np.array([0], dtype=np.int64), s)
    assert sorted(ref["term"].tolist()) == got
