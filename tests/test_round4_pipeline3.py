"""Pipeline ops III: deterministic domain clustering over embeddings
and the percentile-threshold adaptive quality gate."""

import hashlib

import pandas as pd
import pytest

from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.operators import ann, quality


def _emb(spark):
    # two tight groups on orthogonal axes + a stray
    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),
        (2, [0.0, 1.0], "b"),
        (3, [0.1, 0.9], "b"),
        (4, [0.7, 0.7], "a"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )


def test_cluster_label_stats_deterministic_assignment(spark):
    got = ann.cluster_label_stats(_emb(spark), k=2).toPandas()
    # centroids: first 2 vec_ids in md5-order
    order = sorted(range(5), key=lambda i: hashlib.md5(str(i).encode())
                   .hexdigest())
    cents = {str(order[0]), str(order[1])}
    assert set(got["cluster"]) <= cents
    assert got["n"].sum() == 5  # every vector assigned exactly once
    # mean cosine is a valid cohesion value
    assert ((got["avg_cos_r"] >= -1) & (got["avg_cos_r"] <= 1)).all()
    # rerun is bit-identical (no RNG anywhere)
    again = ann.cluster_label_stats(_emb(spark), k=2).toPandas()
    a = got.sort_values(["cluster", "label"]).reset_index(drop=True)
    b = again.sort_values(["cluster", "label"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_cluster_label_stats_k1_and_validation(spark):
    got = ann.cluster_label_stats(_emb(spark), k=1).toPandas()
    assert len(got) == got["label"].nunique()
    assert got["n"].sum() == 5
    with pytest.raises(EngineError):
        ann.cluster_label_stats(_emb(spark), k=0)


def _docs(spark):
    rows = [
        ("d0", "short", "en"),
        ("d1", "the and is of a solid longer document " * 10, "en"),
        ("d2", "x y z w", "de"),
        ("d3", "the of and in good words here too " * 8, "de"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )


def test_quality_percentile_filter_drops_worst_quartile(spark):
    got = quality.quality_percentile_filter(
        _docs(spark), pct=0.5
    ).toPandas()
    # pct=0.5 keeps the top half (>= interpolated median): the two
    # long stopword-rich docs beat the two fragments
    assert got["n_kept"].sum() == 2
    assert set(got["lang"]) == {"en", "de"}
    # pct=0 keeps everything
    all_kept = quality.quality_percentile_filter(
        _docs(spark), pct=0.0
    ).toPandas()
    assert all_kept["n_kept"].sum() == 4
    with pytest.raises(EngineError):
        quality.quality_percentile_filter(_docs(spark), pct=1.5)
