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


def doc_lengths(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Adds ``dl`` (token count) via a scalar pandas UDF — no shuffle."""
    count_udf = F.pandas_udf(analysis.token_count_series, "long")
    return docs.withColumn("dl", count_udf(F.col(content_col)))


def build_posting_blocks(
    tokens: DataFrame, n_docs: int, num_segments: int
) -> DataFrame:
    """tokens → block rows, one shuffle on (term, seg)."""
    seg_size = max(1, -(-n_docs // num_segments))  # ceil

    def encode(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, seg = key
        pdf = pdf.sort_values("doc_int")
        blocks = codec.encode_blocks(
            pdf["doc_int"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["dl"].to_numpy(),
        )
        out = pd.DataFrame(blocks)
        out.insert(0, "term", term)
        out.insert(1, "seg", seg)
        return out

    return (
        tokens.withColumn("seg", (F.col("doc_int") / F.lit(seg_size)).cast("int"))
        .groupBy("term", "seg")
        .applyInPandas(encode, schema=BLOCKS_SCHEMA)
    )


def term_stats(blocks: DataFrame) -> DataFrame:
    """Per-term document frequency from block metadata (cheap)."""
    return blocks.groupBy("term").agg(F.sum("n_docs").alias("df"))
