"""Inverted-index construction: tokenized term rows → segment-salted
posting blocks.

Design (SURVEY.md §2.2, §4.2; split build pass since round 6):

- term rows come from ONE mapInPandas pass (operators/ids.
  tokenize_terms_rows) over (doc_int, content): (doc_int, term, tf, dl
  [, pos_bytes]) — the only JVM↔Python crossing on the build path, and
  the only payload the exchange below ever carries (doc-stat markers are
  a separate shuffle-free JVM projection, plans/build._build_batch_once).

- ``encode_term_blocks``: ONE shuffle, keyed by (term_bucket, seg) where
  ``seg = doc_int >> seg_shift`` — segments are disjoint, ordered doc-ID
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
the tokenizer already emits (term, tf) aggregated per doc. segment_docs
bounds the biggest single (term, seg) group; shuffle_partitions spreads
(bucket, seg) cells across tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import analysis, codec

TOKENS_SCHEMA = "doc_int long, term string, tf long, dl long"
BLOCKS_SCHEMA = (
    "term string, seg long, block_id int, n_docs int, doc_first long, "
    "doc_last long, max_tf int, min_dl int, doc_bytes binary, "
    "tf_bytes binary, dl_bytes binary, pos_bytes binary"
)


_BLOCK_COLS = [
    "term", "seg", "block_id", "n_docs", "doc_first", "doc_last",
    "max_tf", "min_dl", "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes",
]


DEFAULT_SEGMENT_DOCS = 4096


def seg_shift_for(n_docs: int, segment_docs: int = DEFAULT_SEGMENT_DOCS) -> int:
    """Right-shift turning a 64-bit hash doc_int into its segment id such
    that segments average ~segment_docs docs (hash ids are uniform)."""
    import math

    n_segs = max(1, round(max(n_docs, 1) / segment_docs))
    bits = max(0, math.ceil(math.log2(n_segs)))
    # clamp to [1, 63]: the JVM shifts modulo 64, so shift=64 would be a
    # no-op and give one segment per document
    return min(max(64 - bits, 1), 63)


def encode_term_blocks(
    rows: DataFrame,
    num_buckets: int = 64,
    seg_shift: int = 52,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Narrow successor of :func:`build_segments`'s block half: TERM rows
    only — (doc_int, term, tf, dl[, pos_bytes]) from
    ids.tokenize_terms_rows — through the ONE (term_bucket, seg)-keyed
    exchange and the per-(term, seg) delta+varbyte block encode. Doc-stat
    markers no longer ride this exchange (they are a JVM-only projection
    written separately, plans/build._build_batch_once), so the shuffle
    and its sort move exactly the posting payload — no per-term-row null
    metadata width. → BLOCKS_SCHEMA + term_bucket."""
    spark = rows.sparkSession
    n_shuffle = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    tok = rows.withColumn(
        "seg", F.shiftright(F.col("doc_int"), seg_shift)
    ).withColumn(
        "term_bucket",
        F.pmod(F.abs(F.xxhash64("term")), F.lit(num_buckets)),
    )
    parted = tok.repartition(
        n_shuffle, "term_bucket", "seg"
    ).sortWithinPartitions("term", "seg", "doc_int")
    out_schema = f"{BLOCKS_SCHEMA}, term_bucket long"

    def encode_stream(batches):
        import numpy as np

        carry: pd.DataFrame | None = None
        blocks: list[dict] = []

        def flush_group(g: pd.DataFrame) -> None:
            pos = (
                g["pos_bytes"].to_numpy(dtype=object)
                if "pos_bytes" in g.columns
                else None
            )
            bl = codec.encode_blocks(
                g["doc_int"].to_numpy(dtype=np.int64),
                g["tf"].to_numpy(dtype=np.int64),
                g["dl"].to_numpy(dtype=np.int64),
                pos_payloads=pos,
            )
            term = g["term"].iat[0]
            seg = int(g["seg"].iat[0])
            bucket = int(g["term_bucket"].iat[0])
            for b in bl:
                b["term"] = term
                b["seg"] = seg
                b["term_bucket"] = bucket
                blocks.append(b)

        def emit() -> pd.DataFrame | None:
            if not blocks:
                return None
            bdf = pd.DataFrame(
                blocks, columns=[*_BLOCK_COLS, "term_bucket"]
            )
            blocks.clear()
            if "pos_bytes" not in bdf.columns or bdf["pos_bytes"].isna().all():
                bdf["pos_bytes"] = None
            return bdf

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
            import numpy as np

            last_start = np.nonzero(change)[0][-1]
            head = pdf.iloc[:last_start]
            carry = pdf.iloc[last_start:].copy()
            if len(head):
                for _, g in head.groupby(["term", "seg"], sort=False):
                    flush_group(g)
            out = emit()
            if out is not None:
                yield out
        if carry is not None and len(carry):
            flush_group(carry)
        out = emit()
        if out is not None:
            yield out

    return parted.mapInPandas(encode_stream, schema=out_schema)


def term_stats(blocks: DataFrame) -> DataFrame:
    """Per-term document frequency from block metadata (cheap). Carries the
    term's storage bucket so query planning never re-hashes terms JVM-side —
    the df lookup read doubles as the partition-pruning map."""
    return blocks.groupBy("term").agg(
        F.sum("n_docs").alias("df"),
        F.first("term_bucket").alias("term_bucket"),
    )
