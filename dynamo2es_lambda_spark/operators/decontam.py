"""Training-set decontamination: flag corpus documents that share word
n-grams with a benchmark/eval set — the standard n-gram-overlap
decontamination step an LLM training-data pipeline runs so evaluation
examples don't leak into the training corpus.

Scale shape: the benchmark side is tiny next to the corpus (eval sets are
thousands of docs, the corpus is billions), so its distinct n-gram set is
BROADCAST and the corpus-side n-gram stream never shuffles — one map-side
semi/inner join plus a per-doc aggregation whose input is only the
matching grams. Tokenization is the engine's pinned analyzer in its
Spark-SQL form (JVM-side, no Python), n-grams derive from the token array
with one ``transform`` over index ranges — the same built-in-only pattern
as operators/lm.py's bigrams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import spark_tokens_expr


def _ngrams_expr(n: int) -> str:
    """SQL expr: word n-grams of the ``_toks`` array, space-joined."""
    return (
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence({n}, size(_toks)), "
        f"i -> array_join(slice(_toks, i - {n} + 1, {n}), ' ')) "
        "ELSE array() END"
    )


def _doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """→ (doc_id, gram) with per-doc DISTINCT n-grams."""
    return (
        df.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.expr(spark_tokens_expr(text_col)).alias("_toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(f"array_distinct({_ngrams_expr(n)})")
            ).alias("gram"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """→ (doc_id, n_hits): corpus docs sharing ≥1 word ``n``-gram with any
    benchmark document, with the count of DISTINCT shared n-grams. Docs
    with no overlap are absent (filter the corpus by anti-joining on
    doc_id to drop contaminated docs — see ``decontaminate``).

    The benchmark's distinct n-gram set is broadcast: corpus rows never
    shuffle for the join, and only matching (doc, gram) rows reach the
    final per-doc count."""
    bt = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.expr(spark_tokens_expr(bt)).alias("_toks"))
        .select(F.explode(F.expr(_ngrams_expr(n))).alias("gram"))
        .distinct()
    )
    grams = _doc_grams(docs, id_col, text_col, n)
    return (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """The filter form: ``docs`` minus every row ``ngram_contamination``
    flags — a broadcast-anti-joined clean corpus, same columns as the
    input."""
    bad = ngram_contamination(
        docs, benchmark, n, id_col, text_col, bench_text_col
    ).select(F.col("doc_id").alias("_bad_id"))
    return docs.join(
        F.broadcast(bad),
        F.col(id_col).cast("string") == F.col("_bad_id"),
        "left_anti",
    )


def embedding_contamination(
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic decontamination: → (vec_id, max_cos_r, contaminated) for
    every corpus vector, where max_cos_r is its best cosine similarity
    against ANY eval-set vector (rounded 6dp) and contaminated flags
    max_cos ≥ tau — the embedding-space complement of the n-gram overlap
    check (paraphrased eval leakage that shares no 8-gram).

    Scale shape mirrors ngram_contamination: the eval side is
    benchmark-sized and BROADCAST; the corpus side streams map-side
    through one codegen'd dot-product expression (operators/ann.py's
    cosine_expr — no Python, no shuffle) into a per-vector max. For
    eval sets too large to broadcast, pre-reduce them with
    cosine_near_dup_lsh's bucketing instead."""
    from .ann import cosine_expr

    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    ev = F.broadcast(
        eval_emb.select(F.col(vec_col).alias("_evec"))
    )
    return (
        corpus_emb.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec")
        )
        .join(ev)
        .groupBy("vec_id")
        .agg(
            F.round(
                F.max(F.expr(cosine_expr("_cvec", "_evec"))), 6
            ).alias("max_cos_r")
        )
        .withColumn("contaminated", F.col("max_cos_r") >= float(tau))
    )
