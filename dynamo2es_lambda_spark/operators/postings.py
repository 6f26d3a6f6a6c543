"""Inverted-index construction: tokenize → segment-salted posting blocks.

Design (SURVEY.md §2.2, §4.2):

- ``tokenize``: one mapInPandas pass over (doc_int, content) → rows
  (doc_int, term, tf, dl). Vectorized pandas (functions/analysis.py); the
  Arrow hop is the only JVM↔Python crossing on the build path.

- ``build_posting_blocks``: ONE shuffle, keyed by (term, seg) where
  ``seg = doc_int // seg_size`` — segments are disjoint, ordered doc-ID
  ranges. This is the salted repartition-by-term of the north rule: a hot
  term ("def", "the") spreads over all segments, so no single task owns a
  hot term's full posting list. Because segments partition the doc-ID space
  in order, a term's global posting list is just its segment lists
  concatenated in seg order — the salt is removed by ordering, not by a
  second merge shuffle.

- Each (term, seg) group is delta+varbyte block-encoded (functions/codec.py)
  with block-max metadata; output rows are per-block → parquet min/max
  column stats give term-level and doc-range pruning for free.

- ``df(t)`` = sum of block n_docs per term — a cheap agg over block metadata
  (not over postings), persisted as term_stats.

Scale notes: shuffle volume is exactly the postings (irreducible); map-side
the tokenizer already emits (term, tf) aggregated per doc. seg_size controls
skew: S ≈ 2-4× cluster cores bounds the biggest (term, seg) task at
seg_size docs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import analysis, codec

TOKENS_SCHEMA = "doc_int long, term string, tf long, dl long"
BLOCKS_SCHEMA = (
    "term string, seg int, block_id int, n_docs int, doc_first long, "
    "doc_last long, max_tf int, min_dl int, doc_bytes binary, "
    "tf_bytes binary, dl_bytes binary"
)


def tokenize(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_int, content) → (doc_int, term, tf, dl)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield analysis.term_freqs_frame(pdf["doc_int"], pdf[content_col])

    return docs.select("doc_int", content_col).mapInPandas(
        run, schema=TOKENS_SCHEMA
    )


def term_rows_from_tokens(docs: DataFrame) -> DataFrame:
    """(doc_int, dl, toks array<string>) → (doc_int, term, tf, dl).

    Consumes the pre-tokenized arrays from assign_dense_ids_tokenized —
    counting only, no second tokenizer pass.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield analysis.term_freqs_from_tokens(
                pdf["doc_int"].to_numpy(dtype=np.int64),
                pdf["toks"],
                pdf["dl"].to_numpy(dtype=np.int64),
            )

    return docs.select("doc_int", "dl", "toks").mapInPandas(
        run, schema=TOKENS_SCHEMA
    )


def doc_lengths(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Adds ``dl`` (token count) via a scalar pandas UDF — no shuffle."""
    count_udf = F.pandas_udf(analysis.token_count_series, "long")
    return docs.withColumn("dl", count_udf(F.col(content_col)))


_BLOCK_COLS = [
    "term", "seg", "block_id", "n_docs", "doc_first", "doc_last",
    "max_tf", "min_dl", "doc_bytes", "tf_bytes", "dl_bytes",
]


def build_posting_blocks(
    tokens: DataFrame,
    n_docs: int,
    num_segments: int,
    shuffle_partitions: int | None = None,
    doc_base: int = 0,
    seg_offset: int = 0,
) -> DataFrame:
    """tokens → block rows, one shuffle on (term, seg).

    Implementation note: NOT groupBy().applyInPandas — that pays a Python
    call + DataFrame construction per (term, seg) group (tens of thousands
    of tiny groups ⇒ the per-group overhead dominated the build by ~3×).
    Instead: repartition on (term, seg) + sortWithinPartitions, then ONE
    mapInPandas per partition that streams sorted groups across Arrow batch
    boundaries (a tail buffer carries the last, possibly-incomplete group).
    Memory bound = largest single (term, seg) group = seg_size postings.
    """
    spark = tokens.sparkSession
    seg_size = max(1, -(-n_docs // num_segments))  # ceil
    n_shuffle = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    # seg ids are batch-local ranks plus a per-batch offset: doc_int carries
    # a large batch stride (plans/build.py BATCH_STRIDE), which would
    # overflow int32 if divided directly
    tok = tokens.withColumn(
        "seg",
        ((F.col("doc_int") - F.lit(doc_base)) / F.lit(seg_size)).cast("int")
        + F.lit(seg_offset),
    )
    parted = tok.repartition(n_shuffle, "term", "seg").sortWithinPartitions(
        "term", "seg", "doc_int"
    )

    def encode_stream(batches):
        import numpy as np

        carry: pd.DataFrame | None = None
        rows: list[dict] = []

        def flush_group(g: pd.DataFrame) -> None:
            blocks = codec.encode_blocks(
                g["doc_int"].to_numpy(),
                g["tf"].to_numpy(),
                g["dl"].to_numpy(),
            )
            term = g["term"].iat[0]
            seg = int(g["seg"].iat[0])
            for b in blocks:
                b["term"] = term
                b["seg"] = seg
                rows.append(b)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            change = (
                pdf["term"].ne(pdf["term"].shift())
                | pdf["seg"].ne(pdf["seg"].shift())
            ).to_numpy()
            change[0] = True
            starts = np.nonzero(change)[0]
            last_start = starts[-1]
            head = pdf.iloc[:last_start]
            carry = pdf.iloc[last_start:].copy()
            if len(head):
                for _, g in head.groupby(["term", "seg"], sort=False):
                    flush_group(g)
            if rows:
                yield pd.DataFrame(rows, columns=_BLOCK_COLS)
                rows = []
        if carry is not None and len(carry):
            flush_group(carry)
        if rows:
            yield pd.DataFrame(rows, columns=_BLOCK_COLS)

    return parted.mapInPandas(encode_stream, schema=BLOCKS_SCHEMA)


def term_stats(blocks: DataFrame) -> DataFrame:
    """Per-term document frequency from block metadata (cheap)."""
    return blocks.groupBy("term").agg(F.sum("n_docs").alias("df"))
