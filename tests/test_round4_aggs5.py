"""extended_stats_bucket / variable_width_histogram / categorize_text:
the late round-4 aggregation family over the engine's indexed docs
(the reference ships whole documents to the engine's aggregations,
lib/handler.js:100)."""

import math

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search

# texts chosen so 'alpha' matches d0..d7 with dl spread over several
# histogram buckets; d8 matches nothing. Digits in the log-like texts
# are the variable parts categorize_text must strip.
_DOCS = [
    ("d0", "alpha error connecting to host 42"),
    ("d1", "alpha error connecting to host 7 retry 3"),
    ("d2", "alpha error connecting to host 9999"),
    ("d3", "alpha timeout waiting for reply 12"),
    ("d4", "alpha timeout waiting for reply"),
    ("d5", "alpha disk full on node 3"),
    ("d6", "alpha one two three four five six seven eight nine ten"),
    ("d7", "alpha"),
    ("d8", "beta other doc"),
]


@pytest.fixture(scope="module")
def log_store_corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_aggs5"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4)
    return search.load_store(path), corpus


def _q(text="alpha"):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


def _dls(corpus_rows):
    return {d: len(t.split()) for d, t in corpus_rows}


def test_extended_stats_bucket_matches_manual(spark, log_store_corpus):
    store, _ = log_store_corpus
    interval = 4.0
    rows = search.search_extended_stats_bucket(
        spark, store, _q(), interval=interval
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    dls = _dls(_DOCS[:8]).values()
    from collections import Counter

    hist = Counter(math.floor(dl / interval) * interval for dl in dls)
    counts = list(hist.values())
    mean = sum(counts) / len(counts)
    var = sum((c - mean) ** 2 for c in counts) / len(counts)
    assert r.n_buckets == len(counts)
    assert r.sum_bucket == sum(counts) == 8
    assert r.sum_sq_bucket == sum(c * c for c in counts)
    assert r.variance_r == pytest.approx(var, abs=1e-6)
    assert r.std_upper_r == pytest.approx(mean + 2 * var**0.5, abs=1e-6)
    assert r.std_lower_r == pytest.approx(mean - 2 * var**0.5, abs=1e-6)


def test_variable_width_histogram_partitions_match_set(
    spark, log_store_corpus
):
    store, _ = log_store_corpus
    out = search.search_variable_width_histogram(
        spark, store, _q(), n_buckets=3
    ).collect()
    assert sum(r.n_docs for r in out) == 8
    assert len(out) == 3
    # buckets are value-contiguous and ordered: ranges must not overlap
    by_bucket = sorted(out, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.max_v <= b.min_v
        assert a.min_v <= a.max_v
    # equal-frequency: sizes differ by at most 1 (ntile contract)
    sizes = [r.n_docs for r in by_bucket]
    assert max(sizes) - min(sizes) <= 1


def test_variable_width_histogram_single_bucket_is_global_stats(
    spark, log_store_corpus
):
    store, _ = log_store_corpus
    rows = search.search_variable_width_histogram(
        spark, store, _q(), n_buckets=1
    ).collect()
    assert len(rows) == 1
    dls = list(_dls(_DOCS[:8]).values())
    assert rows[0].n_docs == 8
    assert rows[0].min_v == min(dls)
    assert rows[0].max_v == max(dls)
    assert rows[0].avg_v_r == pytest.approx(sum(dls) / 8, abs=1e-6)


def test_variable_width_histogram_rejects_bad_buckets(
    spark, log_store_corpus
):
    store, _ = log_store_corpus
    with pytest.raises(EngineError):
        search.search_variable_width_histogram(
            spark, store, _q(), n_buckets=0
        )


def test_categorize_text_strips_digits_and_groups(spark, log_store_corpus):
    store, corpus = log_store_corpus
    out = search.search_categorize_text(
        spark, store, _q(), corpus, id_col="doc_id", text_col="content",
        max_tokens=4, size=10,
    ).collect()
    cats = {r.category: r for r in out}
    # d0/d1/d2 share 'alpha error connecting to' (digits dropped)
    assert cats["alpha error connecting to"].n_docs == 3
    assert cats["alpha error connecting to"].example_doc_id == "d0"
    # d3 (digit stripped) and d4 collapse to the same timeout pattern
    assert cats["alpha timeout waiting for"].n_docs == 2
    # top category is the 3-doc one
    assert out[0].rank == 1
    top = [r for r in out if r.rank == 1][0]
    assert top.category == "alpha error connecting to"


def test_categorize_text_size_truncates(spark, log_store_corpus):
    store, corpus = log_store_corpus
    out = search.search_categorize_text(
        spark, store, _q(), corpus, id_col="doc_id", text_col="content",
        max_tokens=4, size=2,
    ).collect()
    assert len(out) == 2
    assert sorted(r.rank for r in out) == [1, 2]


def test_sparse_vector_dot_product_exact(spark, log_store_corpus):
    store, _ = log_store_corpus
    # d1 has 'retry'; 'alpha' appears once in d0..d7; weights chosen so
    # the dot product is hand-checkable: score(d1) = 2*ln(2) + 1*ln(2)
    qv = pd.DataFrame(
        [(0, "retry", 2.0), (0, "alpha", 1.0), (0, "nosuchterm", 9.0)],
        columns=["qid", "term", "w"],
    )
    rows = search.search_sparse_vector(spark, store, qv, k=10).collect()
    by_id = {r.doc_id: r.score for r in rows}
    assert by_id["d1"] == pytest.approx(3.0 * math.log(2.0), abs=1e-9)
    assert by_id["d0"] == pytest.approx(math.log(2.0), abs=1e-9)
    assert "d8" not in by_id  # shares no term with the query vector


def test_sparse_vector_all_absent_terms_is_empty(spark, log_store_corpus):
    store, _ = log_store_corpus
    qv = pd.DataFrame([(0, "zzz", 1.0)], columns=["qid", "term", "w"])
    assert search.search_sparse_vector(spark, store, qv, k=5).count() == 0


def test_sparse_vector_rejects_bad_k(spark, log_store_corpus):
    store, _ = log_store_corpus
    qv = pd.DataFrame([(0, "alpha", 1.0)], columns=["qid", "term", "w"])
    with pytest.raises(EngineError):
        search.search_sparse_vector(spark, store, qv, k=0)


_IPDOCS = [
    ("i0", "alpha one", "10.0.0.5", "a"),
    ("i1", "alpha two", "10.0.0.9", "b"),
    ("i2", "alpha three", "192.168.1.1", "a"),
    ("i3", "alpha four", "255.255.255.255", "c"),
    ("i4", "beta x", "10.0.0.6", "a"),
]


@pytest.fixture(scope="module")
def ip_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_ip"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_IPDOCS, columns=["doc_id", "content", "ip", "src"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("ip", "src"),
    )
    return search.load_store(path)


def test_ip_range_brackets_from_inclusive_to_exclusive(spark, ip_store):
    out = search.search_ip_range_agg(
        spark, ip_store, _q(), [
            ("ten_low", "10.0.0.0", "10.0.0.9"),   # i0 only (to exclusive)
            ("from_ten", "10.0.0.0", None),         # i0 i1 i2 i3
            ("empty", "1.0.0.0", "1.0.0.1"),
            ("all", None, None),
        ], value_col="ip",
    ).collect()
    n = {r.range_key: r.n_docs for r in out}
    assert n == {"ten_low": 1, "from_ten": 4, "empty": 0, "all": 4}


def test_ip_range_rejects_bad_literal_and_empty_ranges(spark, ip_store):
    with pytest.raises(EngineError):
        search.search_ip_range_agg(
            spark, ip_store, _q(), [("x", "300.0.0.1", None)],
            value_col="ip",
        ).collect()
    with pytest.raises(EngineError):
        search.search_ip_range_agg(spark, ip_store, _q(), [])


def test_terms_partitions_are_disjoint_and_exhaustive(spark, ip_store):
    full = search.search_terms_agg(
        spark, ip_store, _q(), group_col="src"
    ).collect()
    parts = []
    for p in range(2):
        parts += search.search_terms_agg(
            spark, ip_store, _q(), group_col="src",
            partition=p, num_partitions=2,
        ).collect()
    assert sorted((r.group, r.n_docs) for r in parts) == sorted(
        (r.group, r.n_docs) for r in full
    )
    keys = [r.group for r in parts]
    assert len(keys) == len(set(keys))


def test_terms_partition_argument_validation(spark, ip_store):
    with pytest.raises(EngineError):
        search.search_terms_agg(
            spark, ip_store, _q(), group_col="src", partition=2,
            num_partitions=2,
        )
    with pytest.raises(EngineError):
        search.search_terms_agg(
            spark, ip_store, _q(), group_col="src", partition=1,
        )


def test_geohash_exprs_match_spec_vectors(spark):
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "lat": [42.605, 57.64911, 90.0, -90.0],
                "lon": [-5.603, 10.40744, 180.0, -180.0],
                "want": ["ezs42", "u4pru", "zzzzz", "00000"],
            }
        )
    )
    lat_q, lon_q, cell, b32 = search.geohash_exprs("lat", "lon", 5)
    got = (
        pts.select(
            "want",
            F.expr(lat_q).alias("_latq"),
            F.expr(lon_q).alias("_lonq"),
        )
        .select("want", F.expr(cell).alias("_cell"))
        .select("want", F.expr(b32).alias("gh"))
        .collect()
    )
    for r in got:
        assert r.gh == r.want


def test_geohash_grid_rejects_bad_precision(spark, ip_store):
    with pytest.raises(EngineError):
        search.search_geohash_grid(spark, ip_store, _q(), precision=0)
    with pytest.raises(EngineError):
        search.search_geohash_grid(spark, ip_store, _q(), precision=10)
