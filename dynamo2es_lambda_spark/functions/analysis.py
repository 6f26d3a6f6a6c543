"""Code-aware text analysis (tokenizer), shared by engine and oracle.

The reference delegates analysis to Elasticsearch when it ships the document
body (/root/reference/lib/handler.js:100); the engine implements the analyzer
itself (BASELINE.json north_star: "code-aware tokenizer with camelCase/
snake_case splitting").

One pinned, deterministic algorithm with three equivalent implementations —
cross-checked by tests so every consumer tokenizes identically:

1. :func:`tokenize_series` — vectorized pandas (engine pandas-UDF path + the
   pure-Python oracle). No per-row Python: `.str` ops only.
2. :func:`spark_tokens_expr` — Spark SQL expression (built-in functions only,
   stays inside whole-stage codegen; used where an expression is preferable
   to an Arrow hop).
3. :func:`duckdb_tokens_sql` — DuckDB SQL fragment (the driver's independent
   correctness oracle).

Algorithm (applied in this exact order):
  a. split ``HTTPServer`` → ``HTTP Server``   (ACRONYM boundary)
  b. split ``fooBar``     → ``foo Bar``       (camelCase boundary)
  c. lowercase
  d. split on runs of non-[a-z0-9] (this also splits snake_case on ``_``)
  e. drop empty tokens
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Pinned regexes. Same patterns compile identically under Python re (pandas),
# Java regex (Spark), and RE2 (DuckDB) for the ASCII constructs used here.
ACRONYM_BOUNDARY = r"([A-Z]+)([A-Z][a-z])"
CAMEL_BOUNDARY = r"([a-z0-9])([A-Z])"
TOKEN_SPLIT = r"[^a-z0-9]+"
TOKEN_RUN = r"[a-z0-9]+"  # findall(TOKEN_RUN) ≡ split(TOKEN_SPLIT) − empties


def normalize_series(s: pd.Series) -> pd.Series:
    """Boundary-split + lowercase, vectorized."""
    s = s.fillna("")
    s = s.str.replace(ACRONYM_BOUNDARY, r"\1 \2", regex=True)
    s = s.str.replace(CAMEL_BOUNDARY, r"\1 \2", regex=True)
    return s.str.lower()


def tokenize_series(s: pd.Series) -> pd.Series:
    """Series[str] → Series[list[str]] of code-aware tokens.

    findall of alnum runs ≡ split on non-alnum with empties dropped (the
    form the SQL dialects use) — one C pass, no per-list Python filter.
    """
    return normalize_series(s).str.findall(TOKEN_RUN)


def token_count_series(s: pd.Series) -> pd.Series:
    """Series[str] → Series[int64] document length |d| in tokens."""
    return tokenize_series(s).map(len).astype("int64")


_EMPTY_TF = pd.DataFrame(
    {
        "doc_int": pd.Series([], dtype="int64"),
        "term": pd.Series([], dtype="object"),
        "tf": pd.Series([], dtype="int64"),
        "dl": pd.Series([], dtype="int64"),
    }
)


def term_freqs_from_tokens(
    doc_ids: np.ndarray, token_lists: pd.Series, dls: np.ndarray
) -> pd.DataFrame:
    """(doc, term, tf, dl) from pre-tokenized lists — the counting kernel.

    Pure numpy: factorize terms once (single hash pass over the strings),
    then count (doc, term_code) pairs via int64-key np.unique. An
    object-dtype pandas groupby here was memory-bandwidth-bound and scaled
    badly past ~8 cores; the integer path is ~4× cheaper.
    """
    lens = dls.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return _EMPTY_TF.copy()
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists])
    codes, uniq = pd.factorize(flat, sort=False)
    n_uniq = len(uniq)
    doc_ord = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
    key = doc_ord * np.int64(n_uniq) + codes
    uk, cnt = np.unique(key, return_counts=True)
    d = (uk // n_uniq).astype(np.int64)
    c = (uk % n_uniq).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_int": np.asarray(doc_ids, dtype=np.int64)[d],
            "term": np.asarray(uniq, dtype=object)[c],
            "tf": cnt.astype(np.int64),
            "dl": lens[d],
        }
    )


def term_freqs_positions_from_tokens(
    doc_ids: np.ndarray, token_lists: pd.Series, dls: np.ndarray
) -> pd.DataFrame:
    """(doc, term, tf, dl, pos_bytes) — the positional variant of the
    counting kernel (phrase-query support, Lucene ``.pos`` analog).

    Same integer-key trick as :func:`term_freqs_from_tokens`, plus a stable
    sort so each (doc, term) group's token positions stay ascending; the
    group's positions are delta-coded (first absolute) and varbyte-packed in
    ONE vectorized pass (functions/codec.varbyte_encode_grouped).
    """
    from . import codec

    lens = dls.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        out = _EMPTY_TF.copy()
        out["pos_bytes"] = pd.Series([], dtype="object")
        return out
    flat = np.concatenate([np.asarray(t, dtype=object) for t in token_lists])
    codes, uniq = pd.factorize(flat, sort=False)
    n_uniq = len(uniq)
    doc_ord = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
    doc_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_in_doc = np.arange(total, dtype=np.int64) - doc_start[doc_ord]
    key = doc_ord * np.int64(n_uniq) + codes
    order = np.argsort(key, kind="stable")  # within-group original order
    skey = key[order]
    spos = pos_in_doc[order]
    change = np.concatenate(([True], skey[1:] != skey[:-1]))
    gstart = np.nonzero(change)[0]
    gsize = np.diff(np.append(gstart, skey.size)).astype(np.int64)
    # delta-code positions within each group; group's first stays absolute
    deltas = spos.copy()
    rest = np.nonzero(~change)[0]
    deltas[rest] = spos[rest] - spos[rest - 1]
    pos_payloads = codec.varbyte_encode_grouped(deltas, gsize)
    gkey = skey[gstart]
    d = (gkey // n_uniq).astype(np.int64)
    c = (gkey % n_uniq).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_int": np.asarray(doc_ids, dtype=np.int64)[d],
            "term": np.asarray(uniq, dtype=object)[c],
            "tf": gsize,
            "dl": lens[d],
            "pos_bytes": pd.Series(pos_payloads, dtype="object"),
        }
    )


def term_rows_arrow_fast(
    doc_ids: np.ndarray, texts: pd.Series
) -> pd.DataFrame | None:
    """ASCII-only Arrow/RE2 fast path of the build's counting pipeline:
    the exact row multiset of ``term_freqs_from_tokens(doc_ids,
    tokenize_series(texts), dls)`` — same values, same dtypes — computed
    without per-element Python regex. Returns None when the batch holds
    any non-ASCII text (the caller falls back to the pandas path): for
    pure-ASCII input RE2's ``\\1 \\2`` rewrites, ``ascii_lower`` and the
    regex split are byte-equivalent to the pinned Python-re pipeline,
    which is fuzz-asserted in tests.

    Row ORDER may differ from the pandas kernel (dictionary slots vs
    factorize codes assign in the same first-occurrence order, but the
    contract here is only the multiset): every consumer canonicalizes by
    sorting on (term, seg, doc_int) before encoding, so stores come out
    identical either way (guide §4.2 — hand whole batches to native
    code)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts.fillna(""), type=pa.string())
    if len(arr) == 0:
        return _EMPTY_TF.copy()
    if not pc.all(pc.string_is_ascii(arr)).as_py():
        return None
    a = pc.replace_substring_regex(
        arr, pattern=ACRONYM_BOUNDARY, replacement=r"\1 \2"
    )
    a = pc.replace_substring_regex(
        a, pattern=CAMEL_BOUNDARY, replacement=r"\1 \2"
    )
    a = pc.ascii_lower(a)
    lists = pc.split_pattern_regex(a, pattern=TOKEN_SPLIT)
    flat = lists.values
    lens_raw = np.diff(np.asarray(lists.offsets)).astype(np.int64)
    # split() emits "" at a leading/trailing separator — findall() never
    # does; drop them and count the per-doc survivors (the true dl)
    ne_mask = pc.not_equal(flat, "")
    ne_np = ne_mask.to_numpy(zero_copy_only=False)
    doc_of_raw = np.repeat(
        np.arange(len(lens_raw), dtype=np.int64), lens_raw
    )
    lens = np.bincount(
        doc_of_raw[ne_np], minlength=len(lens_raw)
    ).astype(np.int64)
    if int(lens.sum()) == 0:
        return _EMPTY_TF.copy()
    enc = pc.filter(flat, ne_mask).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary
    n_uniq = len(uniq)
    doc_ord = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
    key = doc_ord * np.int64(n_uniq) + codes
    uk, cnt = np.unique(key, return_counts=True)
    d = (uk // n_uniq).astype(np.int64)
    c = (uk % n_uniq).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_int": np.asarray(doc_ids, dtype=np.int64)[d],
            "term": uniq.take(
                pa.array(c, type=pa.int64())
            ).to_pandas().to_numpy(dtype=object),
            "tf": cnt.astype(np.int64),
            "dl": lens[d],
        }
    )


def term_freqs_frame(doc_ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Vectorized (doc, term, tf, dl) from parallel id/text series.
    Returns columns: doc_int (int64), term (str), tf (int64), dl (int64)."""
    toks = tokenize_series(texts)
    dl = toks.map(len).to_numpy(dtype=np.int64)
    return term_freqs_from_tokens(
        np.asarray(doc_ids.values, dtype=np.int64), toks, dl
    )


# --- SQL-dialect equivalents (cross-checked in tests/test_tokenizer.py) ---


def spark_normalize_sql(col: str) -> str:
    """Spark SQL expression: normalized (boundary-split, lowercased) text."""
    return (
        "lower(regexp_replace(regexp_replace("
        f"{col}, '{ACRONYM_BOUNDARY}', '$1 $2'), "
        f"'{CAMEL_BOUNDARY}', '$1 $2'))"
    )


def spark_tokens_expr(col: str) -> str:
    """Spark SQL expression: array<string> of tokens (built-ins only)."""
    return (
        f"filter(split({spark_normalize_sql(col)}, '{TOKEN_SPLIT}'), "
        "t -> t != '')"
    )


def duckdb_normalize_sql(col: str) -> str:
    """DuckDB SQL fragment: normalized text (RE2 backrefs use \\1)."""
    return (
        "lower(regexp_replace(regexp_replace("
        f"{col}, '{ACRONYM_BOUNDARY}', '\\1 \\2', 'g'), "
        f"'{CAMEL_BOUNDARY}', '\\1 \\2', 'g'))"
    )


def duckdb_tokens_sql(col: str) -> str:
    """DuckDB SQL fragment: LIST(VARCHAR) of tokens."""
    return (
        f"list_filter(string_split_regex({duckdb_normalize_sql(col)}, "
        f"'{TOKEN_SPLIT}'), t -> t != '')"
    )


# ----------------------------------------- search_as_you_type subfields
# ES's search_as_you_type field type materializes word-shingle subfields
# (._2gram/._3gram) and an edge-n-gram prefix subfield (._index_prefix)
# at INDEX time so type-ahead queries are pure term lookups. The engine
# derives the same streams from the root tokens — vectorized numpy over
# the flat token array, no per-token Python in the build kernel's hot
# path beyond the object-dtype joins numpy itself performs.

def _flat_tokens(token_lists: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lens = token_lists.map(len).to_numpy(dtype=np.int64)
    if int(lens.sum()) == 0:
        return np.empty(0, dtype=object), np.empty(0, np.int64), lens
    flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in token_lists]
    )
    doc_ord = np.repeat(np.arange(len(token_lists), dtype=np.int64), lens)
    return flat, doc_ord, lens


def sayt_shingle_tokens(
    token_lists: pd.Series, g: int
) -> tuple[pd.Series, np.ndarray]:
    """Per-doc ``g``-gram word shingles ('w1_w2') from root token lists.
    Windows never cross document boundaries. → (Series[list], dl)."""
    flat, doc_ord, lens = _flat_tokens(token_lists)
    out_lens = np.maximum(lens - (g - 1), 0)
    n = flat.size
    if n < g:
        empty = pd.Series(
            [np.empty(0, dtype=object)] * len(token_lists),
            index=token_lists.index,
        )
        return empty, out_lens
    w = n - g + 1
    sh = flat[:w]
    valid = np.ones(w, dtype=bool)
    for j in range(1, g):
        sh = sh + "_" + flat[j:w + j]
        valid &= doc_ord[:w] == doc_ord[j:w + j]
    sh = sh[valid]
    parts = np.split(sh, np.cumsum(out_lens)[:-1])
    return pd.Series(parts, index=token_lists.index), out_lens


def sayt_prefix_tokens(
    token_lists: pd.Series, max_chars: int
) -> tuple[pd.Series, np.ndarray]:
    """Per-doc edge-n-gram streams: every token contributes its prefixes
    of length 1..min(len, max_chars) (so a typed prefix of ≤ max_chars
    is an EXACT dictionary term). → (Series[list], dl)."""
    flat, doc_ord, lens = _flat_tokens(token_lists)
    if flat.size == 0:
        empty = pd.Series(
            [np.empty(0, dtype=object)] * len(token_lists),
            index=token_lists.index,
        )
        return empty, np.zeros(len(token_lists), dtype=np.int64)
    s = pd.Series(flat, dtype=object)
    tlen = s.str.len().to_numpy()
    parts, ords = [], []
    for p in range(1, int(max_chars) + 1):
        m = tlen >= p
        if not m.any():
            break
        parts.append(s.str.slice(0, p).to_numpy(dtype=object)[m])
        ords.append(doc_ord[m])
    allp = np.concatenate(parts)
    allo = np.concatenate(ords)
    order = np.argsort(allo, kind="stable")
    allp = allp[order]
    out_lens = np.bincount(allo, minlength=len(token_lists)).astype(np.int64)
    pieces = np.split(allp, np.cumsum(out_lens)[:-1])
    return pd.Series(pieces, index=token_lists.index), out_lens
