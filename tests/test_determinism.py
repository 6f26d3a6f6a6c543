"""Determinism under parallelism (SURVEY.md §5.2.7): the committed index is
a pure function of the DATA — independent of input partitioning and shuffle
width. doc_ints are data hashes, (term, seg) groups are hash-range slices,
and block boundaries fall every BLOCK_SIZE docs of a fully-sorted group, so
two builds under different parallelism must produce byte-identical posting
rows (not merely rank-identical query results)."""

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.plans import build, search
from dynamo2es_lambda_spark.sources import store_io, synthetic

CFG = IndexerConfig(index="code")
N = 250

BLOCK_COLS = ["term", "seg", "block_id", "n_docs", "doc_first", "doc_last",
              "max_tf", "min_dl", "doc_bytes", "tf_bytes", "dl_bytes",
              "pos_bytes"]


def _build(spark, path, input_parts, shuffle_parts):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        corpus = spark.createDataFrame(
            synthetic.corpus_pdf(np.arange(N))
        ).repartition(input_parts)
        build.build_index(
            corpus, CFG, path, segment_docs=64, num_buckets=8, positions=True
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _blocks_pdf(spark, path) -> pd.DataFrame:
    pdf = (
        store_io.read_blocks(spark, path)
        .select(*BLOCK_COLS)
        .toPandas()
        .sort_values(["term", "seg", "block_id"], ignore_index=True)
    )
    for c in ("doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes"):
        pdf[c] = pdf[c].map(bytes)
    return pdf


def test_index_bytes_identical_across_parallelism(spark, tmp_path_factory):
    a = str(tmp_path_factory.mktemp("det_a"))
    b = str(tmp_path_factory.mktemp("det_b"))
    _build(spark, a, input_parts=2, shuffle_parts=3)
    _build(spark, b, input_parts=13, shuffle_parts=16)

    pa = _blocks_pdf(spark, a)
    pb = _blocks_pdf(spark, b)
    pd.testing.assert_frame_equal(pa, pb)

    sa = search.load_store(a)
    sb = search.load_store(b)
    assert sa.meta == sb.meta

    da = sa.doc_stats(spark).toPandas().sort_values(
        "doc_int", ignore_index=True
    )
    db = sb.doc_stats(spark).toPandas().sort_values(
        "doc_int", ignore_index=True
    )
    pd.testing.assert_frame_equal(
        da[sorted(da.columns)], db[sorted(db.columns)]
    )

    # and identical query output, including WAND + phrase paths
    q = synthetic.queries_pdf()
    ra = search.search(spark, sa, q, k=10, algo="wand").orderBy(
        "qid", "rank").toPandas()
    rb = search.search(spark, sb, q, k=10, algo="wand").orderBy(
        "qid", "rank").toPandas()
    pd.testing.assert_frame_equal(ra, rb)


def test_index_identical_regardless_of_row_order(spark, tmp_path_factory):
    """Shuffling the input ROW ORDER changes nothing: ids are data hashes
    and every group is fully sorted before encoding."""
    a = str(tmp_path_factory.mktemp("ord_a"))
    b = str(tmp_path_factory.mktemp("ord_b"))
    pdf = synthetic.corpus_pdf(np.arange(N))
    shuffled = pdf.sample(frac=1.0, random_state=3).reset_index(drop=True)

    for path, frame in ((a, pdf), (b, shuffled)):
        corpus = spark.createDataFrame(frame).repartition(7)
        build.build_index(
            corpus, CFG, path, segment_docs=64, num_buckets=8, positions=True
        )
    pd.testing.assert_frame_equal(_blocks_pdf(spark, a), _blocks_pdf(spark, b))


def test_hot_term_skew_bounded_by_segments(spark, tmp_path_factory):
    """North-rule skew defense: a hot term's postings split across hash-range
    segments, so no single (term, seg) task group exceeds the segment's doc
    count — verified on the corpus's hottest keyword."""
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("skew"))
    corpus = spark.createDataFrame(synthetic.corpus_pdf(np.arange(N)))
    build.build_index(corpus, CFG, path, segment_docs=32, num_buckets=8)

    groups = (
        store_io.read_blocks(spark, path)
        .groupBy("term", "seg")
        .agg(F.sum("n_docs").alias("n"))
        .toPandas()
    )
    hot = groups.groupby("term")["n"].sum().idxmax()
    hot_rows = groups[groups["term"] == hot]
    total = int(hot_rows["n"].sum())
    # the hottest term appears in most docs, yet is spread over many segments
    assert total > N // 2, (hot, total)
    assert len(hot_rows) >= 4, "hot term must span multiple segments"
    # no (term, seg) cell exceeds its segment's doc population: with ~32-doc
    # hash-range segments allow generous variance, still far below N
    assert int(groups["n"].max()) <= 32 * 4, int(groups["n"].max())
