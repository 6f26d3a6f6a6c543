"""corpus_minhash_overlap: sketch-vs-exact cross-corpus Jaccard."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.operators import dedup
from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_identical_halves_full_overlap(spark):
    texts = ["alpha beta gamma delta epsilon zeta", "one two three four five"]
    rows = [(i, texts[i % 2]) for i in range(8)]
    r = dedup.corpus_minhash_overlap(
        _df(spark, rows), side_col=(F.col("doc_id") % 2 == 0), k=16
    ).collect()[0]
    # both halves contain both texts' shingles? no: even ids -> texts[0],
    # odd -> texts[1]; sets are DISJOINT
    assert r.n_inter == 0 and r.exact_j_r == 0.0
    assert r.minhash_matches == 0 and r.est_j_r == 0.0

    rows2 = [(i, texts[0]) for i in range(8)]
    r2 = dedup.corpus_minhash_overlap(
        _df(spark, rows2), side_col=(F.col("doc_id") % 2 == 0), k=16
    ).collect()[0]
    assert r2.exact_j_r == 1.0 and r2.est_j_r == 1.0
    assert r2.n_a == r2.n_b == r2.n_union == r2.n_inter == 4


def test_estimator_tracks_exact_jaccard(spark):
    # half-shared shingle sets: J = shared/(shared + 2*own)
    shared = " ".join(f"s{i} t{i} u{i}" for i in range(30))
    own_a = " ".join(f"a{i} b{i} c{i}" for i in range(15))
    own_b = " ".join(f"x{i} y{i} z{i}" for i in range(15))
    rows = [(0, shared + " " + own_a), (1, shared + " " + own_b)]
    r = dedup.corpus_minhash_overlap(
        _df(spark, rows), side_col=(F.col("doc_id") % 2 == 0), k=256
    ).collect()[0]
    assert r.n_union > r.n_inter > 0
    # k=256 permutations: standard error ~ sqrt(J(1-J)/k) < 0.031
    assert r.est_j_r == pytest.approx(r.exact_j_r, abs=0.12)


def test_overlap_guards(spark):
    df = _df(spark, [(0, "a b c")])
    with pytest.raises(EngineError):
        dedup.corpus_minhash_overlap(df, side_col=F.lit(True), k=0)
    with pytest.raises(EngineError):
        dedup.corpus_minhash_overlap(df, side_col=F.lit(True), n=0)
