"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a small TARGET corpus, by scoring each raw doc
with the log importance ratio of two bag-of-hashed-ngrams models.

Pipeline shape (all built-in Column expressions, no Python in the hot
path):

1. Feature map: unigrams + bigrams of the pinned analyzer's tokens,
   hashed into ``n_buckets`` ids with the engine's portable md5-prefix
   hash (the same pinned hash the LSH/sampling operators use, so the
   DuckDB oracle reproduces bucket assignment bit-for-bit).
2. Two multinomials: bucket probabilities of the TARGET sample and the
   RAW corpus, Laplace-smoothed (+1 / +n_buckets). Both are one
   aggregation producing ``n_buckets`` rows — model state, not data.
3. Per-doc score: ``log w(x) = Σ_b c_b(x) · (log p_b − log q_b)``,
   computed by broadcast-joining the bucket log-ratio table into the
   per-doc bucket counts — map-side only; the lone shuffle is the
   per-doc count aggregation.
4. Resampling: deterministic top-k by (log-weight desc, doc_id asc).
   (The paper adds Gumbel noise for a soft sample; the engine pins the
   deterministic variant so two clusters — and the oracle — select the
   identical subset. Seeded noise drops in as one extra md5 column if
   ever needed.)

At 100 TB: the target model is benchmark-sized, the raw model is one
n_buckets-row aggregation over the corpus, and scoring is a broadcast
join — no corpus-×-corpus interaction anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..errors import EngineError
from ..functions.analysis import spark_tokens_expr

N_BUCKETS = 64


def _bucket_counts(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """→ (doc_id, bucket, c): hashed unigram+bigram counts per doc.
    Spreads a narrow scan first: the md5-per-gram feature hash is the
    expensive map pipelined onto it (functions/layout)."""
    from ..functions.layout import spread_if_narrow

    df = spread_if_narrow(df, id_col)
    toks = spark_tokens_expr(text_col)
    bigrams = (
        "CASE WHEN size(_toks) >= 2 THEN "
        "transform(sequence(2, size(_toks)), "
        "i -> concat(element_at(_toks, i - 1), ' ', element_at(_toks, i))) "
        "ELSE array() END"
    )
    return (
        df.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.expr(toks).alias("_toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(f"concat(_toks, {bigrams})")
            ).alias("gram"),
        )
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
                .cast("long") % n_buckets
            ).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )


def _bucket_logprobs(
    counts: DataFrame, n_buckets: int, name: str
) -> DataFrame:
    """Laplace-smoothed multinomial over hashed buckets → (bucket, <name>).

    Buckets never observed still get a smoothed probability: the dense
    bucket domain is sequence(0, n_buckets-1), model-sized."""
    spark = counts.sparkSession
    totals = counts.groupBy("bucket").agg(F.sum("c").alias("n_b"))
    dense = spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    return (
        dense.join(totals, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
        )
        .withColumn("_tot", F.sum("n_b").over(Window.partitionBy()))
        .select(
            "bucket",
            F.log(
                (F.col("n_b") + 1.0) / (F.col("_tot") + float(n_buckets))
            ).alias(name),
        )
    )


def dsir_weights(
    spark: SparkSession,
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-raw-doc DSIR log importance weight → (doc_id, logw)."""
    if n_buckets < 2:
        raise EngineError("dsir needs n_buckets >= 2")
    # materialize once: the raw bucket counts feed BOTH the q-model
    # aggregation and the scoring join — without this the whole
    # tokenize → md5 → per-doc count pipeline runs twice over the raw
    # corpus. The frame is ≤ n_buckets rows per doc (far below token
    # volume at any scale).
    raw_counts = _bucket_counts(
        raw, id_col, text_col, n_buckets
    ).localCheckpoint(eager=True)
    tgt_counts = _bucket_counts(target, id_col, text_col, n_buckets)
    p = _bucket_logprobs(tgt_counts, n_buckets, "logp")
    q = _bucket_logprobs(raw_counts, n_buckets, "logq")
    ratio = p.join(q, "bucket").select(
        "bucket", (F.col("logp") - F.col("logq")).alias("lr")
    )
    return (
        raw_counts.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("lr")).alias("logw"))
    )


def dsir_select(
    spark: SparkSession,
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Deterministic DSIR resampling: the ``k`` raw docs most target-like
    by log importance weight (6-dp rounded, doc_id tie-break) →
    (rank, doc_id, logw_r)."""
    if k < 1:
        raise EngineError("dsir_select needs k >= 1")
    w = dsir_weights(spark, raw, target, id_col, text_col, n_buckets)
    # TakeOrdered (per-partition top-k + driver merge of k·P rows) does
    # the global cut — no single-partition window over the corpus; the
    # rank window then runs on the k-row result only.
    top = (
        w.withColumn("logw_r", F.round("logw", 6))
        .orderBy(F.col("logw_r").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )
    win = Window.orderBy(F.col("logw_r").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(win)).select(
        "rank", "doc_id", "logw_r"
    )
