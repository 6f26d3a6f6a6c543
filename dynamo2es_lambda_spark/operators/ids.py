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



def assign_tokenize_count(
    df: DataFrame,
    content_col: str = "content",
    batch_name: str = "b0",
    positions: bool = False,
    fields: tuple[str, ...] | None = None,
    edge_ngrams: tuple[int, ...] | None = None,
    prefix_max: int = 10,
) -> DataFrame:
    """Maximally-fused build pass: ONE Python crossing emits everything the
    index build needs — term rows (doc_int, term, tf, dl) interleaved with
    one doc-marker row per document (term IS NULL) carrying the doc metadata
    (doc_id, routing, version, sha256, dl).

    ``doc_int = xxhash64(doc_id, batch_name)`` — a pure function of the DATA.
    Task- or partition-derived ids are NOT safe here: AQE re-plans stages,
    windows emit nondeterministic row orders, and retries re-execute tasks,
    all of which changed task-identity-based ids between emissions (observed:
    colliding ids from spark_partition_id() AND TaskContext under an
    AQE-coalesced window). A data hash is identical under any plan, retry,
    or parallelism — and makes per-batch rebuilds byte-reproducible.
    Uniqueness is probabilistic (64-bit; collision audit in
    plans/build._finalize_store); the batch salt keeps a document's versions
    in different batches distinct for liveness tracking.

    Trade-off vs dense ranked ids: posting deltas average ~2^64/N instead of
    ~N/df, so varbyte spends ~8 bytes/doc instead of 1-2. The alternative
    costs a full corpus range-shuffle + sort; see assign_dense_ids for that
    mode when storage size dominates build cost.

    Downstream splits JVM-side: ``filter(term IS NULL)`` → doc_stats,
    ``filter(term IS NOT NULL)`` → posting input. Globally-ordered ids are
    unnecessary for rank identity: every top-k cut keeps score ties and the
    final tie-break is the doc_id string (plans/search.py).
    """
    with_id = df.withColumn(
        "doc_int", F.xxhash64(F.col("doc_id"), F.lit(batch_name))
    )
    return tokenize_count_rows(
        with_id, content_col, positions, fields=fields,
        edge_ngrams=edge_ngrams, prefix_max=prefix_max,
    )


def tokenize_count_rows(
    with_id: DataFrame,
    content_col: str = "content",
    positions: bool = False,
    fields: tuple[str, ...] | None = None,
    edge_ngrams: tuple[int, ...] | None = None,
    prefix_max: int = 10,
) -> DataFrame:
    """The fused tokenize/count pass over a frame that ALREADY carries
    ``doc_int`` (hash- or dense-assigned): one Python crossing emitting term
    rows interleaved with doc-marker rows (term IS NULL).

    ``fields``: multi-field mode (ES documents have many indexed fields —
    the reference's field mapping emits them, lib/handler.js:100). Each
    listed column is tokenized independently; terms are qualified
    ``"<field>:<token>"`` so ALL fields share ONE posting namespace (same
    single-shuffle build, same bucket pruning), and each term row carries
    ITS field's token count as ``dl`` — so the per-posting inlined dl, and
    therefore every BM25 length norm, is field-local for free. Doc markers
    carry ``dl`` = total tokens plus ``field_dls`` (per-field counts in
    ``fields`` order) for the per-field avgdl aggregation at finalize.

    ``edge_ngrams``: search_as_you_type mode — ``fields`` is then the
    SYNTHETIC tuple ``(root, root._2gram, ..., root._index_prefix)``
    where only the root is a corpus column; shingle and edge-prefix
    token streams are derived from the root's tokens in the same fused
    pass (functions/analysis.sayt_shingle_tokens / sayt_prefix_tokens)
    and indexed as ordinary qualified per-field postings — so the
    type-ahead subfields get field-local dl/avgdl/BM25 for free and a
    typed prefix of ≤ ``prefix_max`` chars is ONE exact term lookup.
    """
    from ..functions.analysis import (
        sayt_prefix_tokens,
        sayt_shingle_tokens,
        term_freqs_from_tokens,
        term_freqs_positions_from_tokens,
        tokenize_series,
    )

    fld_cols: dict[str, str] = {}
    if fields:
        # nested fields: a dotted path ("meta.author") is a Spark struct
        # accessor, not a pandas column — project it to an INTERNALLY-NAMED
        # top-level column so the Arrow hop hands the kernel a plain string
        # column, while the qualified term prefix stays the dotted path. A
        # literal dotted COLUMN name ("meta.author") is deliberately avoided:
        # Catalyst's name-based pruning resolves it as nested access into
        # the sibling struct and silently drops the projection (observed on
        # Spark 4.1).
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
    drop = (
        set(fields) | set(fld_cols.values()) if fields else {content_col}
    )
    meta_cols = [
        f.name
        for f in with_id.schema.fields
        if f.name not in drop and f.name != "doc_int"
    ]
    meta_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in with_id.schema.fields
        if f.name in meta_cols
    )
    pos_part = ", pos_bytes binary" if positions else ""
    fd_part = ", field_dls array<bigint>" if fields else ""
    out_schema = (
        f"doc_int long, term string, tf long, dl long{pos_part}{fd_part}, "
        f"{meta_schema}"
    )
    term_cols = (
        ["doc_int", "term", "tf", "dl"]
        + (["pos_bytes"] if positions else [])
        + (["field_dls"] if fields else [])
    )
    kernel = (
        term_freqs_positions_from_tokens if positions else term_freqs_from_tokens
    )
    # meta columns of NESTED Spark type (structs riding through a
    # nested-field build): concat pads them with float NaN on term rows,
    # which Arrow's struct/array converter rejects — they must be None
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_meta = [
        f.name
        for f in with_id.schema.fields
        if f.name in meta_cols
        and isinstance(f.dataType, (StructType, ArrayType, MapType))
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_int = pdf["doc_int"].to_numpy(dtype=np.int64)
            field_dls = None
            if fields:
                frames = []
                per_field_dl = []
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
                        toks = tokenize_series(pdf[fld_cols[fld]].fillna(""))
                        dl_f = toks.map(len).to_numpy(dtype=np.int64)
                        if edge_ngrams:
                            root_toks = toks
                    per_field_dl.append(np.asarray(dl_f, dtype=np.int64))
                    tr = kernel(doc_int, toks, dl_f)
                    if len(tr):
                        tr = tr.copy()
                        tr["term"] = fld + ":" + tr["term"]
                    frames.append(tr)
                term_rows = pd.concat(frames, ignore_index=True)
                term_rows["field_dls"] = None
                dl = np.sum(per_field_dl, axis=0, dtype=np.int64)
                field_dls = [
                    [int(f[i]) for f in per_field_dl]
                    for i in range(len(pdf))
                ]
            else:
                toks = tokenize_series(pdf[content_col])
                dl = toks.map(len).to_numpy(dtype=np.int64)
                term_rows = kernel(doc_int, toks, dl)
            doc_rows = pdf[meta_cols].copy()
            doc_rows.insert(0, "doc_int", doc_int)
            doc_rows.insert(1, "term", None)
            doc_rows.insert(2, "tf", np.int64(0))
            doc_rows.insert(3, "dl", dl)
            if positions:
                doc_rows.insert(4, "pos_bytes", None)
            if fields:
                doc_rows["field_dls"] = field_dls
            out = pd.concat([doc_rows, term_rows], ignore_index=True)
            for c in complex_meta:
                out[c] = [
                    None if isinstance(v, float) and np.isnan(v) else v
                    for v in out[c]
                ]
            yield out[[*term_cols, *meta_cols]]

    return with_id.mapInPandas(run, schema=out_schema)


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
    separate JVM-only projection (:func:`marker_rows`); this pass receives
    and emits only what the posting encoder needs."""
    from ..functions.analysis import (
        sayt_prefix_tokens,
        sayt_shingle_tokens,
        term_freqs_from_tokens,
        term_freqs_positions_from_tokens,
        tokenize_series,
    )

    fld_cols: dict[str, str] = {}
    if fields:
        # nested dotted paths → internally-named flat columns for the
        # Arrow hop (see tokenize_count_rows for why name-based pruning
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


def assign_dense_tokenize_count(
    df: DataFrame,
    content_col: str = "content",
    batch_idx: int = 0,
    positions: bool = False,
    num_partitions: int | None = None,
    fields: tuple[str, ...] | None = None,
    edge_ngrams: tuple[int, ...] | None = None,
    prefix_max: int = 10,
) -> tuple[DataFrame, int]:
    """Dense-id variant of the build pass: ``doc_int = (batch_idx << 44) +
    rank(doc_id)``. Rank-dense ids make posting deltas ~N/df instead of
    ~2^64/N, shrinking doc_bytes to 1-2 varbyte bytes per posting (see
    SCALE.md §1 "Index size"), at the cost of assign_dense_ids' range
    shuffle + per-partition offset pass. Deterministic: rank in global
    doc_id sort order, independent of partitioning (operators/ids.py top
    docstring). Returns (rows, doc_count)."""
    from ..errors import EngineError

    if batch_idx >= (1 << (63 - DENSE_BATCH_SHIFT)):
        raise EngineError(
            f"dense-id batch namespace exhausted (batch {batch_idx} ≥ "
            f"2^{63 - DENSE_BATCH_SHIFT}); compact_store to fold batches"
        )
    with_id, n = assign_dense_ids(
        df, order_col="doc_id", num_partitions=num_partitions
    )
    if batch_idx:
        with_id = with_id.withColumn(
            "doc_int",
            F.col("doc_int") + F.lit(batch_idx << DENSE_BATCH_SHIFT),
        )
    return tokenize_count_rows(
        with_id, content_col, positions, fields=fields,
        edge_ngrams=edge_ngrams, prefix_max=prefix_max,
    ), n
