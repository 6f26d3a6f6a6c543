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
    """Add ``doc_int`` = dense contiguous id in (hash-bucket, ``order_col``)
    order: ids cover exactly [0, N) and are a pure function of the DATA.

    Two passes, both keyed by ``_pid = pmod(abs(xxhash64(order_col)),
    DENSE_ID_BUCKETS)`` — a data-derived bucket, NOT a physical partition
    id:

    1. a column-pruned, map-side-combined count per _pid (+ a
       countDistinct duplicate audit) → driver prefix offsets;
    2. the single full-width shuffle groups rows by _pid (sorted by
       (order_col) within), and each row's id = offset[_pid] + its rank
       inside the bucket.

    Physical-plan-derived keys (spark_partition_id, RangePartitioner
    boundaries) are deliberately avoided: range-sample boundaries are not
    guaranteed identical across the two actions, which could misalign
    offsets against data (see this module's top docstring on why ids must
    be functions of the data). Returns (df_with_doc_int, total_rows).

    Raises :class:`EngineError` on duplicate ``order_col`` values — a
    duplicate would silently occupy two dense ids (the hash-id mode's
    collision audit cannot see it)."""
    from ..errors import EngineError

    # logical id-buckets are a FIXED constant → ids are a pure function of
    # the data alone, identical on any cluster size; num_partitions is only
    # the physical shuffle width (performance knob, no effect on ids)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    pid_col = F.pmod(
        F.abs(F.xxhash64(F.col(order_col))), F.lit(DENSE_ID_BUCKETS)
    )
    with_pid = df.withColumn("_pid", pid_col)
    stats = with_pid.groupBy("_pid").agg(
        F.count("*").alias("cnt"),
        F.countDistinct(order_col).alias("n_ids"),
    ).collect()
    dups = sum(r["cnt"] - r["n_ids"] for r in stats)
    if dups:
        raise EngineError(
            f"duplicate {order_col} values ({dups}) — dense ids require "
            "unique ids; dedup the corpus (dedup_versions=True) first"
        )
    counts = {r["_pid"]: r["cnt"] for r in stats}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    parted = with_pid.repartition(n, "_pid").sortWithinPartitions(
        "_pid", order_col
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, doc_int long"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # several _pid buckets can share one physical partition; rows come
        # sorted by (_pid, order_col), so per-bucket running counters give
        # each row its in-bucket rank regardless of Arrow batch boundaries
        seen: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pids = pdf["_pid"].to_numpy(np.int64)
            ids = np.empty(len(pdf), dtype=np.int64)
            change = np.concatenate(([True], pids[1:] != pids[:-1]))
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], len(pdf))
            for lo, hi in zip(starts, ends):
                pid = int(pids[lo])
                base = offsets[pid] + seen.get(pid, 0)
                seen[pid] = seen.get(pid, 0) + (hi - lo)
                ids[lo:hi] = np.arange(base, base + (hi - lo), dtype=np.int64)
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_int"] = ids
            yield pdf

    return parted.mapInPandas(assign, schema=out_schema), acc



def tokenize_terms_rows(
    with_id: DataFrame,
    content_col: str = "content",
    positions: bool = False,
    fields: tuple[str, ...] | None = None,
    edge_ngrams: tuple[int, ...] | None = None,
    prefix_max: int = 10,
) -> DataFrame:
    """TERM rows only — (doc_int, term, tf, dl[, pos_bytes]) — from a frame
    carrying ``doc_int``. The narrow half of the split build pass: the old
    fused pass interleaved one doc-marker row per document and therefore
    shipped every marker metadata column as a NULL on all ~60× more
    numerous term rows, through Arrow, the (term_bucket, seg) exchange and
    its sort (UnsafeRow spends fixed width per field even when null —
    measured ~25% of the whole segment write at sf0.1). Markers are now a
    separate JVM-only projection (:func:`marker_dl_cols` feeds it); this pass receives
    and emits only what the posting encoder needs."""
    from ..functions.analysis import (
        sayt_prefix_tokens,
        sayt_shingle_tokens,
        term_freqs_from_tokens,
        term_freqs_positions_from_tokens,
        term_rows_arrow_fast,
        tokenize_series,
    )

    fld_cols: dict[str, str] = {}
    if fields:
        # nested dotted paths → internally-named flat columns for the
        # Arrow hop (name-based pruning
        # forbids literal dotted column names)
        for i, fld in enumerate(fields):
            if edge_ngrams and i > 0:
                continue  # synthetic subfield: derived, not a column
            if "." in fld:
                safe = f"_fld_{i}"
                while safe in with_id.columns:
                    safe += "_"
                with_id = with_id.withColumn(safe, F.col(fld))
                fld_cols[fld] = safe
            else:
                fld_cols[fld] = fld
        src_cols = ["doc_int", *sorted(set(fld_cols.values()))]
    else:
        src_cols = ["doc_int", content_col]
    pos_part = ", pos_bytes binary" if positions else ""
    out_schema = f"doc_int long, term string, tf long, dl long{pos_part}"
    kernel = (
        term_freqs_positions_from_tokens
        if positions
        else term_freqs_from_tokens
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_int = pdf["doc_int"].to_numpy(dtype=np.int64)
            if fields:
                frames = []
                root_toks = None
                for fld in fields:
                    if edge_ngrams and root_toks is not None:
                        if fld.endswith("._index_prefix"):
                            toks, dl_f = sayt_prefix_tokens(
                                root_toks, prefix_max
                            )
                        else:
                            g = int(fld.rsplit("._", 1)[1][:-4])
                            toks, dl_f = sayt_shingle_tokens(root_toks, g)
                    else:
                        tr = None
                        if not positions and not edge_ngrams:
                            # ASCII Arrow/RE2 fast path (guide §4.2);
                            # None → pandas fallback below
                            tr = term_rows_arrow_fast(
                                doc_int, pdf[fld_cols[fld]]
                            )
                        if tr is not None:
                            if len(tr):
                                tr = tr.copy()
                                tr["term"] = fld + ":" + tr["term"]
                            frames.append(tr)
                            continue
                        toks = tokenize_series(pdf[fld_cols[fld]].fillna(""))
                        dl_f = toks.map(len).to_numpy(dtype=np.int64)
                        if edge_ngrams:
                            root_toks = toks
                    tr = kernel(doc_int, toks, np.asarray(dl_f, np.int64))
                    if len(tr):
                        tr = tr.copy()
                        tr["term"] = fld + ":" + tr["term"]
                    frames.append(tr)
                yield pd.concat(frames, ignore_index=True)
            else:
                if not positions:
                    fast = term_rows_arrow_fast(doc_int, pdf[content_col])
                    if fast is not None:
                        yield fast
                        continue
                toks = tokenize_series(pdf[content_col])
                dl = toks.map(len).to_numpy(dtype=np.int64)
                yield kernel(doc_int, toks, dl)

    return with_id.select(*src_cols).mapInPandas(run, schema=out_schema)


def marker_dl_cols(
    content_col: str,
    fields: tuple[str, ...] | None,
    edge_ngrams: tuple[int, ...] | None,
    prefix_max: int = 10,
):
    """(dl Column, field_dls Column | None) for the JVM-side doc markers —
    token counts via the pinned analyzer's Spark-SQL form (equivalent to
    the pandas tokenizer by construction; cross-checked in tests)."""
    from ..functions.analysis import spark_tokens_expr

    def _n(col: str):
        # coalesce: the pandas tokenizer fillna("")s — null text is dl 0,
        # never size(NULL)
        inner = spark_tokens_expr("coalesce(" + col + ", '')")
        return F.expr(f"size({inner})").cast("long")

    if not fields:
        return _n(content_col), None
    if edge_ngrams:
        root = _n(content_col)
        toks = F.expr(spark_tokens_expr("coalesce(" + content_col + ", '')"))
        parts = [root]
        for fld in fields[1:]:
            if fld.endswith("._index_prefix"):
                parts.append(
                    F.aggregate(
                        toks,
                        F.lit(0).cast("long"),
                        lambda acc, t: acc
                        + F.least(
                            F.length(t).cast("long"),
                            F.lit(int(prefix_max)).cast("long"),
                        ),
                    )
                )
            else:
                g = int(fld.rsplit("._", 1)[1][:-4])
                parts.append(F.greatest(root - F.lit(g - 1), F.lit(0)))
        fd = F.array(*parts)
    else:
        fd = F.array(*[_n(f_) for f_ in fields])
    dl = F.aggregate(
        fd, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return dl, fd


DENSE_BATCH_SHIFT = 44  # dense ids: (batch_idx << 44) | rank — disjoint
                        # per-batch ranges, up to ~5*10^5 batches of 2^44 docs
DENSE_ID_BUCKETS = 65536  # fixed logical bucket count for dense-id order —
                          # a constant so ids never depend on cluster size
