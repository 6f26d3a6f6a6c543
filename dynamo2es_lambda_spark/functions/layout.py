"""Input-layout helpers: adaptive spreading of narrow scans.

The driver's test tables are single parquet files with ONE row group, so
a scan over them is a single task no matter how many cores exist — and
every map-heavy stage pipelined onto that scan (shingle explosion, k×md5
hash families, regex chains) runs single-core until the first exchange
(guide §2.5 "input skew: one huge unsplittable file").

``spread_if_narrow`` repartitions a frame by a deterministic key ONLY
when the underlying file layout provably exposes less parallelism than
the cluster: the decision reads file sizes and row-group counts from
parquet footers driver-side (no Spark job). On a real multi-file table
(the 100 TB case) the estimate exceeds the parallelism and the frame
passes through untouched — no extra corpus exchange at scale. Non-file
sources (createDataFrame test fixtures, checkpoints) also pass through.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _estimated_scan_tasks(df: DataFrame) -> int | None:
    """Upper-bound estimate of the scan's task count from parquet
    footers: per file, min(row groups, size/maxPartitionBytes splits) —
    a file cannot parallelize beyond its row-group count. None when the
    source is not a small set of local parquet files."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file source
        return None
    if not files or len(files) > 64:
        # many files: the scan parallelizes on file count alone
        return len(files) if files else None
    try:
        import pyarrow.parquet as pq

        max_bytes = 128 * 1024 * 1024
        try:
            raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes")
            digits = "".join(c for c in raw if c.isdigit())
            if digits:
                max_bytes = int(digits) * (
                    1024 * 1024 if raw.lower().endswith(("m", "mb")) else 1
                )
        except Exception:  # noqa: BLE001
            pass
        est = 0
        for f in files:
            path = f[len("file:"):] if f.startswith("file:") else f
            if not os.path.isfile(path):
                return None
            n_rg = pq.ParquetFile(path).metadata.num_row_groups
            n_split = max(1, math.ceil(os.path.getsize(path) / max_bytes))
            est += max(1, min(n_rg, n_split))
        return est
    except Exception:  # noqa: BLE001
        return None


def spread_if_narrow(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition ``df`` to the default parallelism on ``key_col``
    (deterministic — never round-robin, see guide §2.5 on rand-derived
    keys) iff the source scan provably exposes under half the cluster's
    parallelism. No-op on multi-file tables and non-file sources."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001
        return df
    est = _estimated_scan_tasks(df)
    if est is None or est * 2 >= par:
        return df
    return df.repartition(par, F.col(key_col))
