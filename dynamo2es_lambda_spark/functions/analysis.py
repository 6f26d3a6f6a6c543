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

import pandas as pd

# Pinned regexes. Same patterns compile identically under Python re (pandas),
# Java regex (Spark), and RE2 (DuckDB) for the ASCII constructs used here.
ACRONYM_BOUNDARY = r"([A-Z]+)([A-Z][a-z])"
CAMEL_BOUNDARY = r"([a-z0-9])([A-Z])"
TOKEN_SPLIT = r"[^a-z0-9]+"


def normalize_series(s: pd.Series) -> pd.Series:
    """Boundary-split + lowercase, vectorized."""
    s = s.fillna("")
    s = s.str.replace(ACRONYM_BOUNDARY, r"\1 \2", regex=True)
    s = s.str.replace(CAMEL_BOUNDARY, r"\1 \2", regex=True)
    return s.str.lower()


def tokenize_series(s: pd.Series) -> pd.Series:
    """Series[str] → Series[list[str]] of code-aware tokens."""
    parts = normalize_series(s).str.split(TOKEN_SPLIT, regex=True)
    # drop '' artifacts from leading/trailing separators (vectorized explode-
    # free path would keep them; list comprehension over small lists is the
    # pandas-idiomatic filter here and runs per Arrow batch, not per row)
    return parts.map(lambda ts: [t for t in ts if t])


def token_count_series(s: pd.Series) -> pd.Series:
    """Series[str] → Series[int64] document length |d| in tokens."""
    return tokenize_series(s).map(len).astype("int64")


def term_freqs_frame(doc_ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Vectorized (doc, term, tf, dl) from parallel id/text series.

    Explode-based: one pandas explode + groupby per Arrow batch.
    Returns columns: doc_int (int64), term (str), tf (int64), dl (int64).
    """
    toks = tokenize_series(texts)
    dl = toks.map(len).astype("int64")
    frame = pd.DataFrame(
        {"doc_int": doc_ids.values, "dl": dl.values, "term": toks.values}
    )
    frame = frame.explode("term", ignore_index=True)
    frame = frame.dropna(subset=["term"])
    if frame.empty:
        return pd.DataFrame(
            {
                "doc_int": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
                "dl": pd.Series([], dtype="int64"),
            }
        )
    out = (
        frame.groupby(["doc_int", "dl", "term"], sort=False)
        .size()
        .rename("tf")
        .reset_index()
    )
    out["doc_int"] = out["doc_int"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    out["dl"] = out["dl"].astype("int64")
    return out[["doc_int", "term", "tf", "dl"]]


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
