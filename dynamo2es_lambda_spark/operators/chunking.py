"""Training-window chunking: split long documents into overlapping
fixed-size token windows — the context-window preparation step a
training pipeline runs after cleaning (long docs become several training
rows; short docs flow to sequence packing, operators/packing.py, which
solves the complementary problem).

Window starts are the arithmetic progression 0, stride, 2·stride, …
strictly below the doc's token count, so chunk identity is a pure
function of (doc_id, token count) — deterministic, resumable, and
replicable by a SQL oracle with generate_series. One projection with a
sequence + posexplode; no shuffle at all (chunking is embarrassingly
parallel per doc)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import EngineError
from ..functions.analysis import spark_tokens_expr


def chunk_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, win_id, start, n_win_tokens, first_tok): one row per
    training window. ``win_id = start / stride`` (deterministic, no
    ordinality dependence); the last window of a doc may be short
    (n_win_tokens < window) — downstream padding or packing decides its
    fate. Docs with zero tokens produce no windows.

    ``stride < window`` gives overlapping windows (the usual training
    prep); ``stride == window`` gives a disjoint tiling."""
    if window < 1 or stride < 1:
        raise EngineError("chunk_windows wants window >= 1 and stride >= 1")
    if stride > window:
        raise EngineError(
            "stride > window would drop tokens between windows"
        )
    toks = F.expr(spark_tokens_expr(text_col))
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        toks.alias("_toks"),
    ).withColumn("_n", F.size("_toks")).filter(F.col("_n") > 0)
    starts = F.sequence(
        F.lit(0), F.col("_n") - 1, F.lit(int(stride))
    )
    return (
        base.withColumn("start", F.explode(starts))
        .select(
            "doc_id",
            (F.col("start") / int(stride)).cast("long").alias("win_id"),
            F.col("start").cast("long").alias("start"),
            F.least(
                F.lit(int(window)), F.col("_n") - F.col("start")
            ).cast("long").alias("n_win_tokens"),
            F.element_at("_toks", F.col("start") + 1).alias("first_tok"),
        )
    )
