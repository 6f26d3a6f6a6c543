"""Round-4 metric/pipeline aggregation family + the doc_meta_cols marker
passthrough that feeds it (ES stores arbitrary doc fields and buckets
aggregations on them; the reference ships whole documents to ES,
lib/handler.js:100, so every stored field is aggregatable there)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search
from dynamo2es_lambda_spark.sources import store_io

# corpus: "alpha" in every doc, "beta" in half — match sets are easy to
# reason about; src/w are the extra doc fields the aggs bucket/weigh on
_DOCS = [
    # doc_id, text,                  src,  w
    ("d0", "alpha beta one",         "s0", 10),
    ("d1", "alpha beta two two",     "s0", 20),
    ("d2", "alpha three",            "s1", 30),
    ("d3", "alpha beta four",        "s1", 40),
    ("d4", "alpha five five five",   "s2", 50),
    ("d5", "alpha beta six",         "s2", 60),
]


@pytest.fixture(scope="module")
def agg_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_aggs"))
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "src", "w"])
    ).withColumn("w", F.col("w").cast("long"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("src", "w"),
    )
    return search.load_store(path)


def _q(text="alpha"):
    return pd.DataFrame([(0, text)], columns=["qid", "query"])


# --------------------------------------------- doc_meta_cols plumbing


def test_doc_meta_cols_on_markers_and_meta(spark, agg_store):
    ds = agg_store.doc_stats(spark)
    assert {"src", "w"} <= set(ds.columns)
    got = {r["doc_id"]: (r["src"], r["w"]) for r in ds.collect()}
    assert got["d3"] == ("s1", 40)
    assert agg_store.meta.get("doc_meta_cols") == ["src", "w"]


def test_doc_meta_cols_conflict_on_committed_store(
    spark, agg_store, tmp_path_factory
):
    corpus = spark.createDataFrame(
        pd.DataFrame(_DOCS, columns=["doc_id", "content", "src", "w"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    with pytest.raises(EngineError, match="doc_meta_cols"):
        build.build_index(
            corpus, cfg, agg_store.path, doc_meta_cols=("src",)
        )
    # omitting the value inherits: resume is a no-op, schema unchanged
    res = build.build_index(corpus, cfg, agg_store.path)
    assert res.skipped_batches == 1
    assert "w" in store_io.read_doc_stats(spark, agg_store.path).columns


# --------------------------------------------------------- metric aggs


def test_extended_stats_population_variance(spark, agg_store):
    # match set "beta": d0,d1,d3,d5 with dl 3,4,3,3
    row = search.search_extended_stats_agg(
        spark, agg_store, _q("beta"), value_col="dl"
    ).collect()[0]
    vals = [3.0, 4.0, 3.0, 3.0]
    mean = sum(vals) / 4
    var = sum((v - mean) ** 2 for v in vals) / 4  # population, ES default
    assert row["n_docs"] == 4
    assert row["sum_sq"] == sum(v * v for v in vals)
    assert row["variance_r"] == round(var, 6)
    assert row["std_dev_r"] == round(var ** 0.5, 6)


def test_string_stats_lengths(spark, agg_store):
    row = search.search_string_stats_agg(
        spark, agg_store, _q(), value_col="src"
    ).collect()[0]
    assert (row["n_docs"], row["min_len"], row["max_len"]) == (6, 2, 2)


def test_weighted_avg(spark, agg_store):
    # beta matches: (dl, w) = (3,10),(4,20),(3,40),(3,60)
    row = search.search_weighted_avg_agg(
        spark, agg_store, _q("beta"), value_col="dl", weight_col="w"
    ).collect()[0]
    expect = (3 * 10 + 4 * 20 + 3 * 40 + 3 * 60) / (10 + 20 + 40 + 60)
    assert row["weighted_avg_r"] == round(expect, 6)


def test_rare_terms_long_tail_only(spark, agg_store):
    # src buckets over "beta": s0→2, s1→1, s2→1 — cap 1 keeps the tail
    got = {
        r["group"]: r["n_docs"]
        for r in search.search_rare_terms_agg(
            spark, agg_store, _q("beta"), group_col="src", max_doc_count=1
        ).collect()
    }
    assert got == {"s1": 1, "s2": 1}
    with pytest.raises(EngineError):
        search.search_rare_terms_agg(
            spark, agg_store, _q(), group_col="src", max_doc_count=0
        )


def test_multi_terms_composite_buckets(spark, agg_store):
    res = search.search_multi_terms_agg(
        spark, agg_store, _q(), group_cols=("src", "w"), value_col="dl"
    ).collect()
    # every (src, w) pair is distinct in the fixture → six 1-doc buckets
    assert len(res) == 6 and all(r["n_docs"] == 1 for r in res)
    with pytest.raises(EngineError):
        search.search_multi_terms_agg(
            spark, agg_store, _q(), group_cols=("src",)
        )


def test_top_metrics_sorted_with_doc_id_ties(spark, agg_store):
    # dl desc over alpha: d1/d4 (4), then dl=3 ties break by doc_id asc
    res = search.search_top_metrics_agg(
        spark, agg_store, _q(), sort_col="dl", metric_col="w", size=3
    ).collect()
    got = [(r["rank"], r["doc_id"], r["metric_v"]) for r in
           sorted(res, key=lambda r: r["rank"])]
    assert got == [(1, "d1", 20.0), (2, "d4", 50.0), (3, "d0", 10.0)]


# ------------------------------------------------------- pipeline aggs


def test_histogram_pipeline_cumsum_and_derivative(spark, agg_store):
    res = search.search_histogram_pipeline(
        spark, agg_store, _q(), interval=1.0, value_col="dl"
    ).collect()
    rows = sorted(
        ((r["bucket"], r["n_docs"], r["cum_docs"], r["deriv"]) for r in res)
    )
    # dl histogram: 2.0→1 (d2), 3.0→3, 4.0→2; cum 1,4,6; deriv ∅,+2,−1
    assert rows == [(2.0, 1, 1, None), (3.0, 3, 4, 2), (4.0, 2, 6, -1)]


def test_stats_bucket_over_histogram_counts(spark, agg_store):
    row = search.search_stats_bucket(
        spark, agg_store, _q(), interval=1.0, value_col="dl"
    ).collect()[0]
    assert (row["n_buckets"], row["min_bucket"], row["max_bucket"],
            row["sum_bucket"]) == (3, 1, 3, 6)
    assert row["avg_bucket_r"] == 2.0


def test_bucket_sort_orders_and_truncates(spark, agg_store):
    res = search.search_bucket_sort(
        spark, agg_store, _q("beta"), group_col="src", size=2
    ).collect()
    got = [(r["rank"], r["group"], r["n_docs"]) for r in
           sorted(res, key=lambda r: r["rank"])]
    # counts: s0→2, s1→1, s2→1; tie s1/s2 breaks on bucket key asc
    assert got == [(1, "s0", 2), (2, "s1", 1)]


def test_adjacency_matrix_intersections(spark, agg_store):
    got = {
        r["bucket"]: r["n_docs"]
        for r in search.search_adjacency_matrix(
            spark, agg_store,
            {"b": "beta", "t": "two", "x": "absentzzz"},
        ).collect()
    }
    # b: 4 docs; t: d1 only; b∩t: d1; x empty → omitted entirely
    assert got == {"b": 4, "t": 1, "b&t": 1}


def test_sampler_restricts_to_top_scoring(spark, agg_store):
    # shard_size=1 over "beta": only the single best-scoring doc buckets
    res = search.search_sampler_terms(
        spark, agg_store, _q("beta"), shard_size=1, group_col="src"
    ).collect()
    assert len(res) == 1 and res[0]["n_docs"] == 1
    # the bucket is the top-1 doc's src (d1: highest tf via "two two"
    # doesn't matter for 'beta'; compute via the search path itself)
    top = search.search(
        spark, agg_store, _q("beta"), k=1, algo="exhaustive"
    ).collect()[0]
    src = {d[0]: d[2] for d in _DOCS}[top["doc_id"]]
    assert res[0]["group"] == src


# ----------------------- pipeline family II (moving_fn … bucket_selector)


def test_moving_fn_window_excludes_current(spark, agg_store):
    res = search.search_moving_fn(
        spark, agg_store, _q(), interval=1.0, window=2, fn="avg"
    ).collect()
    got = {r["bucket"]: r["moving_v"] for r in res}
    # buckets 2.0→1, 3.0→3, 4.0→2; window = 2 buckets BEFORE each
    assert got == {2.0: None, 3.0: 1.0, 4.0: 2.0}
    with pytest.raises(EngineError):
        search.search_moving_fn(
            spark, agg_store, _q(), interval=1.0, window=2, fn="median"
        )


def test_serial_diff_lag(spark, agg_store):
    res = search.search_serial_diff(
        spark, agg_store, _q(), interval=1.0, lag=2
    ).collect()
    got = {r["bucket"]: r["diff_v"] for r in res}
    assert got == {2.0: None, 3.0: None, 4.0: 1}  # 2 − 1 at lag 2


def test_percentiles_bucket_nearest_rank(spark, agg_store):
    res = search.search_percentiles_bucket(
        spark, agg_store, _q(), interval=1.0, percents=(1.0, 50.0, 100.0)
    ).collect()
    got = {r["percent"]: r["value"] for r in res}
    # counts sorted: [1, 2, 3] → p1→rank1=1, p50→rank2=2, p100→rank3=3
    assert got == {1.0: 1, 50.0: 2, 100.0: 3}
    with pytest.raises(EngineError):
        search.search_percentiles_bucket(
            spark, agg_store, _q(), interval=1.0, percents=(0.0,)
        )


def test_bucket_script_and_selector(spark, agg_store):
    res = search.search_bucket_script(
        spark, agg_store, _q("beta"), "sum_v / n_docs", group_col="src"
    ).collect()
    got = {r["group"]: r["script_v"] for r in res}
    # beta per src: s0 dl(3,4) → 3.5; s1 dl(3) → 3; s2 dl(3) → 3
    assert got == {"s0": 3.5, "s1": 3.0, "s2": 3.0}
    with pytest.raises(EngineError, match="references"):
        search.search_bucket_script(
            spark, agg_store, _q(), "sum_v + evil_col", group_col="src"
        )
    kept = search.search_bucket_selector(
        spark, agg_store, _q("beta"), "n_docs > 1", group_col="src"
    ).collect()
    assert {r["group"] for r in kept} == {"s0"}


# ------------------------------------- doc APIs: termvectors/analyze/mget


def test_termvectors_tf_df_from_index(spark, agg_store):
    res = search.termvectors(spark, agg_store, ["d1", "absent"]).collect()
    got = {r["term"]: (r["tf"], r["df"]) for r in res}
    assert all(r["doc_id"] == "d1" for r in res)
    # d1 = "alpha beta two two": tf(two)=2; df(alpha)=6, df(beta)=4
    assert got == {"alpha": (1, 6), "beta": (1, 4), "two": (2, 1)}
    with pytest.raises(EngineError):
        search.termvectors(spark, agg_store, [])


def test_analyze_positions(spark):
    res = search.analyze_texts(
        spark, pd.DataFrame([(7, "Alpha, beta ALPHA!")],
                            columns=["qid", "text"])
    ).collect()
    got = sorted((r["pos"], r["token"]) for r in res)
    assert got == [(0, "alpha"), (1, "beta"), (2, "alpha")]
    assert all(r["qid"] == 7 for r in res)


def test_mget_found_flags_and_validation(spark, agg_store):
    res = search.mget(
        spark, agg_store, ["d2", "ghost"], cols=("dl", "src")
    ).collect()
    got = {r["doc_id"]: (r["found"], r["dl"], r["src"]) for r in res}
    assert got == {"d2": (True, 2, "s1"), "ghost": (False, None, None)}
    with pytest.raises(EngineError, match="not on doc_stats"):
        search.mget(spark, agg_store, ["d2"], cols=("nope",))


# --------------------- geo / global / missing / dense-histogram / decontam


def test_geo_distance_filters_and_sorts(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_geo"))
    rows = [  # doc_id, content, lat, lon
        ("g0", "alpha", 0.0, 0.0),      # at origin
        ("g1", "alpha", 0.0, 1.0),      # ~111 km east
        ("g2", "alpha", 45.0, 90.0),    # far
        ("g3", "beta",  0.0, 0.1),      # near but doesn't match query
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "content", "lat", "lon"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("lat", "lon"),
    )
    st = search.load_store(path)
    res = search.search_geo_distance(
        spark, st, _q("alpha"), origin=(0.0, 0.0), distance_km=500.0
    ).collect()
    got = [(r["rank"], r["doc_id"]) for r in
           sorted(res, key=lambda r: r["rank"])]
    assert got == [(1, "g0"), (2, "g1")]       # g2 out of range, g3 no match
    assert res[0]["dist_km_r"] == 0.0
    bbox = search.search_geo_bounding_box(
        spark, st, _q("alpha"), box=(-10.0, -10.0, 10.0, 10.0)
    ).collect()
    assert {r["doc_id"] for r in bbox} == {"g0", "g1"}
    with pytest.raises(EngineError):
        search.search_geo_bounding_box(
            spark, st, _q("alpha"), box=(10.0, 0.0, -10.0, 5.0)
        )


def test_global_agg_whole_index_vs_match(spark, agg_store):
    row = search.search_global_agg(
        spark, agg_store, _q("beta"), value_col="dl"
    ).collect()[0]
    # match set beta: 4 docs avg (3+4+3+3)/4; global: all 6 docs
    assert (row["n_docs"], row["global_docs"]) == (4, 6)
    assert row["avg_v_r"] == round(13 / 4, 6)
    assert row["global_avg_r"] == round((3 + 4 + 2 + 3 + 4 + 3) / 6, 6)


def test_missing_agg_counts_nulls(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_missing"))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [("m0", "alpha", "t"), ("m1", "alpha", None),
             ("m2", "alpha", "u")],
            columns=["doc_id", "content", "tag"],
        )
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("tag",),
    )
    st = search.load_store(path)
    row = search.search_missing_agg(
        spark, st, _q("alpha"), check_col="tag"
    ).collect()[0]
    assert (row["n_docs"], row["value_count"], row["n_missing"]) == (3, 2, 1)


def test_histogram_dense_zero_fills_bounds(spark, agg_store):
    res = search.search_histogram_dense(
        spark, agg_store, _q(), interval=1.0, bounds=(0.0, 6.0)
    ).collect()
    got = {r["bucket"]: r["n_docs"] for r in res}
    # sparse buckets 2,3,4 keep counts; the rest of [0,6] zero-fill
    assert got == {0.0: 0, 1.0: 0, 2.0: 1, 3.0: 3, 4.0: 2, 5.0: 0, 6.0: 0}


def test_embedding_contamination_flags_near_eval(spark):
    from dynamo2es_lambda_spark.operators import decontam

    ev = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [[1.0, 0.0, 0.0]]})
    )
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [10, 11, 12],
             "embedding": [[0.9, 0.1, 0.0],    # near-parallel → flagged
                           [0.0, 1.0, 0.0],    # orthogonal
                           [-1.0, 0.0, 0.0]]}  # opposite
        )
    )
    got = {
        r["vec_id"]: r["contaminated"]
        for r in decontam.embedding_contamination(
            corpus, ev, tau=0.8
        ).collect()
    }
    assert got == {10: True, 11: False, 12: False}
    with pytest.raises(ValueError):
        decontam.embedding_contamination(corpus, ev, tau=0.0)


# ---------------------- filtered kNN / diversified sampler / geo buckets


@pytest.fixture(scope="module")
def knn_store(spark, tmp_path_factory):
    """Array-typed doc_meta_cols (the dense_vector analog) — also the
    regression fixture for NaN-padded array meta columns in the fused
    segment pass (operators/postings.build_segments emit)."""
    path = str(tmp_path_factory.mktemp("r4_knn"))
    rows = [
        ("k0", "alpha beta", [1.0, 0.0]),
        ("k1", "alpha",      [0.8, 0.6]),
        ("k2", "alpha beta", [0.0, 1.0]),
        ("k3", "gamma",      [1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "content", "vec"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("vec",),
    )
    return search.load_store(path)


def test_knn_filtered_cosine_topk(spark, knn_store):
    qv = pd.DataFrame({"qid": [0], "vec": [[1.0, 0.0]]})
    res = search.search_knn(
        spark, knn_store, _q("beta"), qv, k=2, vec_col="vec"
    ).collect()
    got = [(r["rank"], r["doc_id"], r["cos_r"]) for r in
           sorted(res, key=lambda r: r["rank"])]
    # filter "beta" keeps k0,k2; k1 (cos .8) and k3 (cos 1) don't match
    assert got == [(1, "k0", 1.0), (2, "k2", 0.0)]


def test_array_meta_cols_roundtrip(spark, knn_store):
    got = {
        r["doc_id"]: list(r["vec"])
        for r in knn_store.doc_stats(spark).collect()
    }
    assert got["k1"] == [0.8, 0.6]


def test_diversified_sampler_caps_per_group(spark, agg_store):
    res = search.search_diversified_sampler(
        spark, agg_store, _q(), shard_size=4, group_col="src",
        max_docs_per_value=1,
    ).collect()
    # 6 alpha matches over 3 srcs, cap 1 → exactly one doc per src
    assert len(res) == 3
    assert sorted(r["group"] for r in res) == ["s0", "s1", "s2"]
    full = search.search_diversified_sampler(
        spark, agg_store, _q(), shard_size=10, group_col="src",
        max_docs_per_value=2,
    ).collect()
    assert len(full) == 6  # cap 2 × 3 groups keeps everything


def test_geo_distance_agg_keeps_zero_rings(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_georing"))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [("r0", "alpha", 0.0, 0.0), ("r1", "alpha", 0.0, 1.0)],
            columns=["doc_id", "content", "lat", "lon"],
        )
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("lat", "lon"),
    )
    st = search.load_store(path)
    got = {
        r["ring"]: r["n_docs"]
        for r in search.search_geo_distance_agg(
            spark, st, _q("alpha"), origin=(0.0, 0.0),
            ranges=[(0.0, 50.0), (50.0, 500.0), (500.0, 1000.0)],
        ).collect()
    }
    # r0 at origin, r1 ~111 km; the 500-1000 ring is empty but present
    assert got == {"0.0-50.0": 1, "50.0-500.0": 1, "500.0-1000.0": 0}


def test_geotile_grid_cells(spark, agg_store, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_geotile"))
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [("t0", "alpha", 10.0, 20.0), ("t1", "alpha", 15.0, 25.0),
             ("t2", "alpha", -40.0, 100.0)],
            columns=["doc_id", "content", "lat", "lon"],
        )
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        corpus, cfg, path, segment_docs=8, num_buckets=4,
        doc_meta_cols=("lat", "lon"),
    )
    st = search.load_store(path)

    def osm_tile(lat, lon, z):
        # reference implementation: the published OSM slippy-map formula
        import math

        lat = max(min(lat, 85.0511287798066), -85.0511287798066)
        n = 2 ** z
        x = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
        rad = math.radians(lat)
        y = int((1.0 - math.asinh(math.tan(rad)) / math.pi) / 2.0 * n)
        return f"{z}/{x}/{min(max(y, 0), n - 1)}"

    for z in (0, 2, 7):
        got = {
            r["key"]: r["n_docs"]
            for r in search.search_geotile_grid(
                spark, st, _q("alpha"), zoom=z
            ).collect()
        }
        want = {}
        for lat, lon in [(10.0, 20.0), (15.0, 25.0), (-40.0, 100.0)]:
            k = osm_tile(lat, lon, z)
            want[k] = want.get(k, 0) + 1
        assert got == want, f"zoom={z}"


def test_normalize_agg_methods(spark, agg_store):
    # beta src counts: s0→2, s1→1, s2→1 (total 4)
    ps = {
        r["group"]: r["normalized_r"]
        for r in search.search_normalize_agg(
            spark, agg_store, _q("beta"), group_col="src",
            method="percent_of_sum",
        ).collect()
    }
    assert ps == {"s0": 0.5, "s1": 0.25, "s2": 0.25}
    r01 = {
        r["group"]: r["normalized_r"]
        for r in search.search_normalize_agg(
            spark, agg_store, _q("beta"), group_col="src",
            method="rescale_0_1",
        ).collect()
    }
    assert r01 == {"s0": 1.0, "s1": 0.0, "s2": 0.0}
    # single-bucket qid: spread 0 → null for scale-dependent methods
    one = search.search_normalize_agg(
        spark, agg_store, _q("three"), group_col="src",
        method="z-score",
    ).collect()
    assert len(one) == 1 and one[0]["normalized_r"] is None
    with pytest.raises(EngineError):
        search.search_normalize_agg(
            spark, agg_store, _q(), group_col="src", method="softmax"
        )


def test_knn_similarity_radius(spark, knn_store):
    """r5: the similarity floor drops distant candidates BEFORE the
    top-k cut — radius queries return fewer than k rows."""
    qv = pd.DataFrame({"qid": [0], "vec": [[1.0, 0.0]]})
    full = search.search_knn(
        spark, knn_store, _q("alpha"), qv, k=10, vec_col="vec"
    ).toPandas().sort_values("rank")
    # alpha matches k0 (cos 1.0), k1 (cos .8), k2 (cos 0.0)
    assert len(full) == 3
    rad = search.search_knn(
        spark, knn_store, _q("alpha"), qv, k=10, vec_col="vec",
        similarity=0.5,
    ).toPandas().sort_values("rank")
    assert list(rad["doc_id"]) == ["k0", "k1"]
    assert list(rad["rank"]) == [1, 2]
