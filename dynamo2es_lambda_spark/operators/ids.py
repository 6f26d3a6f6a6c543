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
