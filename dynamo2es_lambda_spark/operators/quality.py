"""Repetition-based quality filtering — the Gopher-style "repetitious
document" signals (Rae et al. 2021, published filter set) a training-data
pipeline applies before tokenization, adapted to token streams:

- ``uniq_ratio``     distinct tokens / total tokens (low → boilerplate)
- ``top_bigram_frac``  tokens covered by the single most frequent bigram
  (count × 2 / n_tok) — catches "foo bar foo bar foo bar" loops
- ``dup_trigram_frac`` fraction of trigram OCCURRENCES whose trigram
  appears more than once — catches longer-period repetition

Scale shape: n-gram counting is explode → two-level groupBy keyed by
(doc_id, gram) then doc_id — partial aggregation map-side, shuffle volume
bounded by per-doc distinct grams, never a per-row O(len × distinct)
higher-order-function scan. All exact integer counts; the only floats are
the final rounded ratios, so results are bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import EngineError
from ..functions.analysis import spark_tokens_expr


def _gram_expr(n: int) -> str:
    return (
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence({n}, size(_toks)), "
        f"i -> array_join(slice(_toks, i - {n} + 1, {n}), ' ')) "
        "ELSE array() END"
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tok, uniq_ratio_r, top_bigram_frac_r,
    dup_trigram_frac_r), ratios rounded to 6 dp; the repetition fractions
    are 0 for docs too short to form the n-gram."""
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.expr(spark_tokens_expr(text_col)).alias("_toks"),
    )
    counts = base.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tok"),
        F.size(F.array_distinct("_toks")).cast("long").alias("n_uniq"),
    )

    def gram_agg(n: int, agg_cols: list) -> DataFrame:
        return (
            base.select(
                "doc_id", F.explode(F.expr(_gram_expr(n))).alias("g")
            )
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(*agg_cols)
        )

    bi = gram_agg(2, [F.max("c").alias("bi_max")])
    tri = gram_agg(
        3,
        [
            F.sum(F.when(F.col("c") > 1, F.col("c"))).alias("tri_dup"),
            F.sum("c").alias("tri_tot"),
        ],
    )
    out = (
        counts.join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.round(
                F.col("n_uniq") / F.greatest(F.col("n_tok"), F.lit(1)), 6
            ).alias("uniq_ratio_r"),
            F.round(
                F.coalesce(F.col("bi_max"), F.lit(0)) * 2.0
                / F.greatest(F.col("n_tok"), F.lit(1)),
                6,
            ).alias("top_bigram_frac_r"),
            F.round(
                F.coalesce(F.col("tri_dup"), F.lit(0))
                / F.greatest(F.coalesce(F.col("tri_tot"), F.lit(0)),
                             F.lit(1)),
                6,
            ).alias("dup_trigram_frac_r"),
        )
    )
    return out


def quality_percentile_filter(
    docs: DataFrame,
    pct: float = 0.25,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Corpus-relative adaptive quality gate: drop every doc whose
    quality score sits below the corpus's ``pct`` quantile — the
    percentile-threshold variant of the fixed-cutoff documents_clean
    gate (real pipelines tune "drop the worst X%", not an absolute
    score). Emits per-lang kept counts + mean kept score.

    The threshold is ONE exact interpolated percentile over the
    6-dp-rounded scores (rounding first keeps the quantile
    oracle-replicable), broadcast back as a scalar — two aggregations
    total, no sort of the corpus."""
    from ..functions import text as T

    if not 0.0 <= pct <= 1.0:
        raise EngineError("pct must be in [0, 1]")
    # materialize once: the threshold aggregation and the kept-count pass
    # both consume the scored frame — without this the regex-heavy quality
    # score runs twice over the corpus. Two narrow columns per doc.
    scored = docs.select(
        F.col(lang_col).alias("lang"),
        F.round(T.quality_score(text_col), 6).alias("q_r"),
    ).localCheckpoint(eager=True)
    thr = scored.agg(F.expr(f"percentile(q_r, {pct})").alias("_t"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .filter(F.col("q_r") >= F.col("_t"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.avg("q_r"), 6).alias("avg_q_r"),
        )
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams — boilerplate mining: the
    n-grams a dedup / filtering pass should inspect first (repeated
    headers, navigation chrome, license blurbs surface at the top).
    → (rank, ngram, n_occurrences, n_docs): total occurrences and the
    number of distinct docs containing the n-gram, ranked by
    (occurrences desc, ngram asc — deterministic).

    Plan: ONE explode of the already-tokenized stream into n-gram rows,
    ONE hash aggregation computing both counts (partial map-side — the
    shuffle carries only distinct (ngram, doc) partials), then a
    top-k rank window over the aggregate. At 100 TB the aggregate is
    vocabulary-sized (n-gram types), far below the corpus, and the
    window sees only that aggregate — no corpus sort, no driver
    collect beyond the k rows the caller asked for."""
    if n < 1 or k < 1:
        raise EngineError("top_ngrams needs n >= 1 and k >= 1")
    from pyspark.sql import Window

    from ..functions.layout import spread_if_narrow

    # the n-gram explosion + map-side partial agg is the heavy map
    # pipelined onto this scan — spread a provably narrow input first
    # (measured 1.14 s -> 0.64 s on the single-row-group driver table)
    docs = spread_if_narrow(docs, "doc_id")
    grams = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(spark_tokens_expr(text_col)).alias("_toks"),
    ).select(
        "doc_id", F.explode(F.expr(_gram_expr(n))).alias("ngram")
    )
    agg = grams.groupBy("ngram").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    # orderBy + limit plans as TakeOrderedAndProject — per-partition
    # top-k partials, never a global sort or a one-task window over the
    # (potentially billions-of-types) n-gram vocabulary
    cut = agg.orderBy(
        F.col("n_occurrences").desc(), F.col("ngram").asc()
    ).limit(int(k))
    w = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("ngram").asc()
    )
    return (
        cut.withColumn("rank", F.row_number().over(w))
        .select("rank", "ngram", "n_occurrences", "n_docs")
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 2,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, the public C4
    recipe): keep lines that END IN TERMINAL PUNCTUATION (. ! ? ") and
    have at least ``min_words_per_line`` words and do not mention
    "javascript"; drop the whole document when fewer than
    ``min_kept_lines`` lines survive, or it contains "lorem ipsum" or a
    curly brace (template/boilerplate markers).

    Everything is one codegen projection (split / filter lambdas /
    rlike) — no shuffle, no UDF; at 100 TB this is a map-only pass.
    → (doc_id, n_lines, n_kept, keep_doc, clean_text) with clean_text
    NULL for dropped docs."""
    if min_words_per_line < 1 or min_kept_lines < 1:
        raise EngineError("c4_clean wants positive line/word minimums")
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: ln.rlike('[.!?"]\\s*$')
        & (F.size(F.split(F.trim(ln), " +")) >= int(min_words_per_line))
        & ~F.lower(ln).contains("javascript"),
    )
    doc_bad = (
        F.lower(F.col(text_col)).contains("lorem ipsum")
        | F.col(text_col).contains("{")
    )
    keep_doc = (~doc_bad) & (F.size(kept) >= int(min_kept_lines))
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        keep_doc.alias("keep_doc"),
        F.when(keep_doc, F.array_join(kept, "\n")).alias("clean_text"),
    )
