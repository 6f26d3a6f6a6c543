"""Deterministic dense doc-ID assignment (SURVEY.md §4.2 item 5).

Postings delta-compress best over dense, sorted integer IDs. The assignment
must be deterministic under any parallelism (rank-identity + resume depend on
it), so ``monotonically_increasing_id`` is out. Two-pass scheme:

  1. range-repartition + sort by the string doc_id → disjoint, ordered
     partitions;
  2. count rows per partition (tiny driver-side list; the shuffle files from
     pass 1 are reused by Spark, so this does not recompute the input);
  3. mapInPandas assigns ``offset[pid] + running_count`` — each doc's ID is
     its rank in the global doc_id sort order, independent of partition
     boundaries or batch sizes.

Scale: the shuffle is one pass over (doc_id, payload) — unavoidable for a
global order; at 100 TB you'd range-partition on doc_id into ~10k partitions
and the per-partition counts remain a trivially small driver list.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add ``doc_int`` = rank of ``order_col`` in global ascending order.

    Returns (df_with_doc_int, total_row_count) — the count is a free
    byproduct of the offset pass, saving callers an extra job."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, doc_int long"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = offsets[pid] + seen
            seen += len(pdf)
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_int"] = np.arange(base, base + len(pdf), dtype=np.int64)
            yield pdf

    return parted.mapInPandas(assign, schema=out_schema), acc


def assign_dense_ids_tokenized(
    df: DataFrame,
    order_col: str = "doc_id",
    content_col: str = "content",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Fused variant for the index build: assigns ``doc_int`` AND tokenizes
    in the same Python pass, emitting ``dl`` + ``toks`` (array<string>)
    instead of the raw content — the corpus crosses the Arrow boundary once
    and is tokenized exactly once (the separate doc_lengths pass would
    tokenize a second time just to count).

    The pre-shuffle plan stays pure JVM (scan → field-map → range exchange),
    so the offsets count job pays no Python cost.
    """
    from ..functions.analysis import tokenize_series

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != content_col
    )
    out_schema = f"{fields}, doc_int long, dl long, toks array<string>"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = offsets[pid] + seen
            seen += len(pdf)
            toks = tokenize_series(pdf[content_col])
            pdf = pdf.drop(columns=["_pid", content_col])
            pdf["doc_int"] = np.arange(base, base + len(pdf), dtype=np.int64)
            pdf["dl"] = toks.map(len).to_numpy(dtype=np.int64)
            pdf["toks"] = toks.values
            yield pdf

    return parted.mapInPandas(assign, schema=out_schema), acc


def assign_tokenize_count(
    df: DataFrame,
    order_col: str = "doc_id",
    content_col: str = "content",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Maximally-fused build pass: ONE Python crossing emits everything the
    index build needs — term rows (doc_int, term, tf, dl) interleaved with
    one doc-marker row per document (term IS NULL) carrying the doc metadata
    (doc_id, routing, version, sha256, dl).

    Downstream splits JVM-side: ``filter(term IS NULL)`` → doc_stats,
    ``filter(term IS NOT NULL)`` → posting input. Compared to emitting token
    arrays and re-reading them, this halves Arrow IPC volume and removes a
    whole Python stage — the build's wall clock was IPC-latency-bound, not
    CPU-bound (event-log analysis, 2026-08).
    """
    from ..functions.analysis import term_freqs_from_tokens, tokenize_series

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    meta_cols = [f.name for f in df.schema.fields if f.name != content_col]
    meta_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != content_col
    )
    out_schema = (
        f"doc_int long, term string, tf long, dl long, {meta_schema}"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = offsets[pid] + seen
            seen += len(pdf)
            doc_int = np.arange(base, base + len(pdf), dtype=np.int64)
            toks = tokenize_series(pdf[content_col])
            dl = toks.map(len).to_numpy(dtype=np.int64)
            term_rows = term_freqs_from_tokens(doc_int, toks, dl)
            doc_rows = pdf[meta_cols].copy()
            doc_rows.insert(0, "doc_int", doc_int)
            doc_rows.insert(1, "term", None)
            doc_rows.insert(2, "tf", np.int64(0))
            doc_rows.insert(3, "dl", dl)
            out = pd.concat([doc_rows, term_rows], ignore_index=True)
            yield out[["doc_int", "term", "tf", "dl", *meta_cols]]

    return parted.mapInPandas(run, schema=out_schema), acc
