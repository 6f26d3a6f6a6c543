"""BPE tokenizer training: the corpus-side half of byte-pair-encoding —
adjacent-symbol pair counting and iterative merge learning.

Scale shape (the part that matters at 100 TB): the corpus is touched
exactly ONCE, by the word-frequency aggregation. Everything after —
pair counts, every merge iteration — runs on the word-VOCABULARY frame
(zipfian: orders of magnitude smaller than the corpus), exactly how
GPT-2-style BPE trainers operate on word-count tables. Merge learning
is n_merges vocabulary-sized jobs, zero further corpus scans.

All symbol manipulation is Spark SQL array/lambda expressions
(whole-stage codegen) — no Python in any per-row path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import EngineError
from ..functions.analysis import spark_tokens_expr

_CHARS = "transform(sequence(1, length(w)), i -> substring(w, i, 1))"


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, n): word frequency over the pinned tokenizer's tokens — the
    single corpus-sized aggregation in this module."""
    return (
        docs.select(
            F.explode(F.expr(spark_tokens_expr(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair, n_pairs) from a (syms, n) vocabulary frame: adjacent
    symbol pairs weighted by word frequency, one explode + hash agg."""
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN "
        "transform(sequence(1, size(syms) - 1), "
        "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) "
        "ELSE array() END"
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("n_pairs"))
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """→ (pair, n_pairs): corpus-wide adjacent CHARACTER pair counts —
    the statistic BPE's first merge decision reads. Pairs are
    space-joined symbol pairs within words (word boundaries never pair,
    the standard pre-tokenized BPE setup); counts weight by word
    frequency; ``min_count`` drops the noise tail (at web scale the
    singleton tail is most of the dictionary)."""
    if min_count < 1:
        raise EngineError("bpe_pair_counts wants min_count >= 1")
    vocab = _word_counts(docs, text_col).select(
        F.expr(_CHARS).alias("syms"), "n"
    )
    return _pair_counts(vocab).filter(
        F.col("n_pairs") >= int(min_count)
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges: repeatedly take the most frequent
    adjacent pair (count desc, pair asc — deterministic tiebreak) and
    fuse it everywhere, greedy left-to-right within a word (``aaa``
    under merge (a,a) → ``[aa, a]``, reference BPE behavior).

    Each iteration = one vocabulary-sized job for the arg-max plus a
    lazy column rewrite (an ``aggregate`` fold — codegen); the vocab is
    localCheckpoint'ed every few steps so lineage stays flat. Stops
    early when no pair reaches ``min_count``. Returns
    ``[(left, right, count), ...]`` in merge order — model state,
    driver-sized by definition."""
    if n_merges < 1:
        raise EngineError("bpe_learn_merges wants n_merges >= 1")
    vocab = _word_counts(docs, text_col).select(
        F.expr(_CHARS).alias("syms"), "n"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for step in range(int(n_merges)):
        top = (
            _pair_counts(vocab)
            .filter(F.col("n_pairs") >= int(min_count))
            .orderBy(F.col("n_pairs").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b, int(top[0]["n_pairs"])))
        fused = (a + b).replace("'", "\\'")
        qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
        vocab = vocab.withColumn(
            "syms",
            F.expr(
                "aggregate(syms, cast(array() as array<string>), "
                "(acc, x) -> "
                f"CASE WHEN size(acc) >= 1 AND element_at(acc, -1) = '{qa}'"
                f" AND x = '{qb}' THEN "
                f"concat(slice(acc, 1, size(acc) - 1), array('{fused}')) "
                "ELSE concat(acc, array(x)) END)"
            ),
        )
        if (step + 1) % 4 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges
