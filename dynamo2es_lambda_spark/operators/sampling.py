"""Deterministic stratified sampling — the corpus-mixing step of a
training-data pipeline: keep each stratum (source, language, quality
bucket, …) at its own target rate, reproducibly.

The keep decision is a pure function of the ROW KEY, not of partitioning,
ordering, or cluster size: ``u(key) = int(md5(key)[:8], 16) / 2^32`` and a
row survives iff ``u < rate[stratum]``. That makes the sample (a) exactly
re-computable on any cluster (re-runs and incremental jobs agree), (b) a
map-side FILTER — no shuffle, no sort, no sampling state — and (c)
cross-engine checkable (md5 exists in every SQL engine, so a DuckDB
oracle reproduces the exact row set; Spark's xxhash64 does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import EngineError


def hash_uniform(col: str) -> F.Column:
    """u in [0, 1): first 8 md5 hex chars of the key as an integer / 2^32.
    Deterministic and engine-portable (DuckDB twin:
    ``('0x' || substr(md5(key), 1, 8))::BIGINT / 4294967296.0``)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``rates[s]``
    (``default_rate`` for unlisted strata), decided by the row's key hash.
    Same columns as the input. Rates outside [0, 1] are rejected."""
    for s, r in rates.items():
        if not 0.0 <= float(r) <= 1.0:
            raise EngineError(f"rate for stratum {s!r} must be in [0, 1]")
    if not 0.0 <= float(default_rate) <= 1.0:
        raise EngineError("default_rate must be in [0, 1]")
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(
            F.col(strata_col).cast("string") == str(s), F.lit(float(r))
        ).otherwise(rate)
    return df.filter(hash_uniform(key_col) < rate)


def temperature_mix_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_frac: float = 1.0,
) -> dict[str, float]:
    """Per-stratum keep rates for TEMPERATURE-FLATTENED corpus mixing —
    the multilingual-pretraining recipe (mBERT/XLM-R style): stratum
    mass ``p_s ∝ n_s^alpha`` (alpha < 1 upsamples low-resource strata
    relative to their natural share), scaled so the expected kept total
    is ``target_frac`` of the corpus, clamped per-stratum at 1.0 (a
    stratum cannot be kept more than once — the standard clamp; the
    realized total then lands slightly under target when a small stratum
    saturates).

    One stratum-count aggregation (driver-side result is strata-sized);
    feed the returned dict to :func:`stratified_sample` for the
    shuffle-free md5-keyed filter."""
    if not 0.0 < float(alpha) <= 1.0:
        raise EngineError("alpha must be in (0, 1]")
    if not 0.0 < float(target_frac) <= 1.0:
        raise EngineError("target_frac must be in (0, 1]")
    counts = {
        str(r[strata_col]): int(r["count"])
        for r in df.groupBy(strata_col).count().collect()
    }
    mass = {s: float(n) ** float(alpha) for s, n in sorted(counts.items())}
    z = sum(mass[s] for s in sorted(mass))
    total = sum(counts.values()) * float(target_frac)
    return {
        s: min(1.0, total * mass[s] / z / counts[s])
        for s in sorted(counts)
    }


def token_budget_sample(
    df: DataFrame,
    budget: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum TOKEN-BUDGET fill: keep documents of each stratum,
    in deterministic md5(key) shuffle order, until the stratum's
    cumulative token count reaches ``budget`` — how a training-data
    pipeline targets "N tokens per language", not "N docs" (docs vary
    100× in length; a doc-count cap skews the mix toward short docs).

    The doc that CROSSES the budget is kept (budget is a floor, the
    standard fill-then-stop), everything after it in hash order drops.
    → (stratum, n_docs, n_tokens): per-stratum kept counts, the
    audit summary a mixing step consumes.

    Plan: token counts are a codegen'd expression (or a provided
    column), the fill is ONE cumulative-sum window per stratum
    partition (docs hash-shuffle within their stratum — no global
    sort), and the output aggregation rides the same partitioning.
    Deterministic: md5 order and exact integer sums."""
    if budget < 1:
        raise EngineError("token budget must be >= 1")
    if tokens_col is None:
        from ..functions.analysis import spark_tokens_expr

        toks = F.size(F.expr(spark_tokens_expr(text_col)))
    else:
        toks = F.col(tokens_col).cast("long")
    from pyspark.sql import Window

    base = df.select(
        F.col(strata_col).cast("string").alias("stratum"),
        F.md5(F.col(key_col).cast("string")).alias("_h"),
        toks.cast("long").alias("_t"),
    )
    w = Window.partitionBy("stratum").orderBy(F.col("_h").asc())
    kept = base.withColumn(
        "_cum", F.sum("_t").over(w)
    ).filter(F.col("_cum") - F.col("_t") < F.lit(int(budget)))
    return kept.groupBy("stratum").agg(
        F.count("*").alias("n_docs"),
        F.sum("_t").alias("n_tokens"),
    )
