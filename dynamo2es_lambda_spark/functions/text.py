"""Text-analysis Column helpers for training-data pipelines.

All pure built-in expressions (whole-stage codegen, no UDFs): language-ID
heuristic, quality scoring, BPE-ish token counting, document fingerprinting.
Each has an exactly-equivalent DuckDB SQL form in plans/entry_queries.py —
the driver's independent oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .analysis import spark_tokens_expr

# small fixed stopword lists for the lang-ID heuristic (public knowledge)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "por", "para"],
}
# Dialect-portable regexes: '\t'/'\n' written as backslash-letter pairs —
# Spark's SQL literal layer unescapes them to real chars, DuckDB passes them
# through to RE2 which interprets them as the same chars. Identical effect.
PUNCT_RE = "[^a-zA-Z0-9 \\t\\n]"
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"
STOPWORDS = LANG_STOPWORDS["en"]
ROLL_P1 = 1000003       # token-level hash modulus
ROLL_P2 = 1000000007    # rolling modulus
ROLL_MULT = 131


def tokens(col: str) -> Column:
    return F.expr(spark_tokens_expr(col))


def n_tokens(col: str) -> Column:
    return F.expr(f"cast(size({spark_tokens_expr(col)}) as bigint)")


def bpe_token_count(col: str) -> Column:
    """BPE-ish pre-tokenizer count: alpha runs | digit runs | single symbol."""
    return F.expr(
        f"cast(size(regexp_extract_all(lower({col}), '{BPE_RE}', 0)) as bigint)"
    )


def punct_ratio(col: str) -> Column:
    return F.expr(
        f"cast(size(regexp_extract_all({col}, '{PUNCT_RE}', 0)) as double)"
        f" / greatest(length({col}), 1)"
    )


def stopword_ratio(col: str) -> Column:
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(
        f"cast(size(filter({spark_tokens_expr(col)}, "
        f"t -> array_contains(array({stoplist}), t))) as double) / "
        f"greatest(size({spark_tokens_expr(col)}), 1)"
    )


def quality_score(col: str) -> Column:
    """Composite [0,1] quality heuristic: length + punctuation + stopwords."""
    return (
        F.least(n_tokens(col) / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))) * 0.3
        + F.least(stopword_ratio(col) * 5.0, F.lit(1.0)) * 0.3
    )


def lang_hits(col: str, lang: str) -> Column:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return F.expr(
        f"cast(size(filter({spark_tokens_expr(col)}, "
        f"t -> array_contains(array({words}), t))) as bigint)"
    )


def lang_id(col: str) -> Column:
    """Deterministic argmax over stopword-hit counts (ties: en>de>fr>es)."""
    h = {lg: lang_hits(col, lg) for lg in LANG_STOPWORDS}
    return (
        F.when((h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]), "en")
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["es"]), "de")
        .when(h["fr"] >= h["es"], "fr")
        .otherwise("es")
    )


def fingerprint_md5(col: str) -> Column:
    """Normalized-content fingerprint: md5 over the token stream."""
    return F.expr(f"md5(array_join({spark_tokens_expr(col)}, ' '))")


def fingerprint_rolling(col: str) -> Column:
    """Polynomial rolling hash over tokens (mod {ROLL_P2}), duplicating the
    DuckDB list_reduce fold exactly: seed = first element, left fold."""
    toks = spark_tokens_expr(col)
    vals = (
        f"transform({toks}, t -> pmod(cast(length(t) as bigint) * 31 "
        f"+ ascii(t), {ROLL_P1}))"
    )
    return F.expr(
        f"aggregate(slice({vals}, 2, greatest(size({vals}) - 1, 0)), "
        f"element_at({vals}, 1), "
        f"(a, b) -> pmod(a * {ROLL_MULT} + b, {ROLL_P2}))"
    )


# PII scrubbing — the redaction pass a training pipeline runs before text
# reaches tokenization. Patterns restricted to syntax that means the SAME
# thing in Java regex (Spark regexp_replace) and RE2 (DuckDB): character
# classes, bounded repetition, \b word boundaries, non-capturing groups.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
     "<IP>"),
    ("phone",
     "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b",
     "<PHONE>"),
]


def scrub_pii(col: str) -> Column:
    """Redact emails, IPv4 addresses, and simple phone numbers with typed
    placeholders — patterns applied in PII_PATTERNS order (email first, so
    an address is never half-eaten by the IP rule's digit runs)."""
    out = F.col(col)
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(col: str, kind: str) -> Column:
    """Occurrences of one PII pattern (``email``/``ipv4``/``phone``) —
    counted on the RAW text, pre-redaction. The pattern's backslashes are
    doubled for the SQL literal layer (Spark unescapes ``'\\b'`` in a SQL
    string to a backspace character; the Column-API ``regexp_replace`` in
    :func:`scrub_pii` takes the raw pattern and needs no doubling)."""
    pat = {n: p for n, p, _ in PII_PATTERNS}[kind]
    sql_pat = pat.replace("\\", "\\\\")
    return F.expr(
        f"cast(size(regexp_extract_all({col}, '{sql_pat}', 0)) as bigint)"
    )
