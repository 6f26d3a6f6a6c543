"""Round-4 changes: index-time LM statistics (lm_stats table) replace the
phrase suggester's per-call corpus scans; keyword-only ``meta`` after-hooks;
CDC build gated on the post-transform-hook corpus (ADVICE round-3
findings + VERDICT round-3 tasks 1)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.operators import lm
from dynamo2es_lambda_spark.plans import build, cdc, search

# ------------------------------------------------ lm_stats: gram counts


def test_gram_counts_unigrams_and_bigrams(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"text": ["a b a", "b a"]})
    )
    got = {
        r["gram"]: r["cf"]
        for r in lm.gram_counts(docs, ("text",)).collect()
    }
    assert got == {
        "a": 3, "b": 2,            # unigram collection frequencies
        "a b": 1, "b a": 2,        # bigrams
    }


def test_gram_counts_qualified_multi_field(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"t1": ["x y"], "t2": ["y"]})
    )
    got = {
        r["gram"]: r["cf"]
        for r in lm.gram_counts(docs, ("t1", "t2"), qualify=True).collect()
    }
    assert got == {"t1:x": 1, "t1:y": 1, "t1:x y": 1, "t2:y": 1}


# ----------------------------- lm_stats: suggester reads index statistics

_CORPUS = (
    ["stream data pipeline runs"] * 5
    + ["steam vents data here", "steam engine data room",
       "steam cleaning data set"]
)


def _mk_docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [str(i) for i in range(len(_CORPUS))],
             "text": _CORPUS}
        )
    )


PROBES = pd.DataFrame(
    [(0, "strem data"), (1, "qq data")], columns=["qid", "text"]
)


def test_suggest_phrase_from_index_stats_matches_corpus_scan(
    spark, tmp_path_factory
):
    """A store built with lm_stats=True answers suggest_phrase WITHOUT a
    corpus DataFrame, identically to the legacy corpus-scan path."""
    docs = _mk_docs(spark)
    p_new = str(tmp_path_factory.mktemp("r4_lm_new"))
    p_old = str(tmp_path_factory.mktemp("r4_lm_old"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    corpus = docs.withColumnRenamed("text", "content")
    build.build_index(corpus, cfg, p_new, segment_docs=8, num_buckets=4,
                      lm_stats=True)
    build.build_index(corpus, cfg, p_old, segment_docs=8, num_buckets=4)
    s_new = search.load_store(p_new)
    assert s_new.meta["lm_stats"] is True
    assert os.path.isdir(os.path.join(p_new, "lm_stats"))
    got = search.suggest_phrase(spark, s_new, probes=PROBES, k=3).toPandas()
    legacy = search.suggest_phrase(
        spark, search.load_store(p_old), docs, PROBES, k=3
    ).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), legacy.reset_index(drop=True)
    )


def test_suggest_phrase_without_stats_or_docs_raises(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_lm_raise"))
    build.build_index(
        _mk_docs(spark).withColumnRenamed("text", "content"),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    with pytest.raises(Exception, match="lm_stats"):
        search.suggest_phrase(
            spark, search.load_store(path), probes=PROBES
        )


def test_suggest_phrase_multifield_field_local_model(
    spark, tmp_path_factory
):
    """On a multi-field store the LM is FIELD-LOCAL: V counts only the
    targeted field's dictionary, T its token total, grams its stream —
    so suggestions equal those of a single-field store over the same
    column (ADVICE r3: raw footer V over-counted)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [str(i) for i in range(len(_CORPUS))],
            "text": _CORPUS,
            # a second field with its own vocabulary that would skew V/T
            # if the model leaked across fields
            "source": ["alpha beta gamma delta epsilon zeta"] * len(_CORPUS),
        }
    )
    docs = spark.createDataFrame(pdf)
    p_mf = str(tmp_path_factory.mktemp("r4_lm_mf"))
    p_sf = str(tmp_path_factory.mktemp("r4_lm_sf"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(docs, cfg, p_mf, segment_docs=8, num_buckets=4,
                      fields=("text", "source"), lm_stats=True)
    build.build_index(
        docs.select("doc_id", docs["text"].alias("content")), cfg, p_sf,
        segment_docs=8, num_buckets=4, lm_stats=True,
    )
    mf = search.suggest_phrase(
        spark, search.load_store(p_mf), probes=PROBES, k=3, field="text"
    ).toPandas()
    sf = search.suggest_phrase(
        spark, search.load_store(p_sf), probes=PROBES, k=3
    ).toPandas()
    pd.testing.assert_frame_equal(
        mf.reset_index(drop=True), sf.reset_index(drop=True)
    )


def test_cdc_batch_extends_lm_stats(spark, tmp_path_factory):
    """An incremental CDC batch on an lm_stats store refreshes the gram
    table: post-apply counts equal a from-scratch build over the union."""
    path = str(tmp_path_factory.mktemp("r4_lm_cdc"))
    twin = str(tmp_path_factory.mktemp("r4_lm_cdc_twin"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    base = _mk_docs(spark).withColumnRenamed("text", "content")
    build.build_index(base, cfg, path, segment_docs=8, num_buckets=4,
                      lm_stats=True)
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_name": ["INSERT"],
                "doc_id": ["100"],
                "content": ["fresh stream data arrives"],
            }
        )
    ).selectExpr(
        "event_name",
        "named_struct('doc_id', doc_id) AS keys",
        "named_struct('doc_id', doc_id, 'content', content) AS new_image",
        "CAST(NULL AS struct<doc_id:string>) AS old_image",
    )
    cdc.apply_changes(events, cfg, path)
    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["100"],
                      "content": ["fresh stream data arrives"]})
    )
    build.build_index(base.unionByName(extra), cfg, twin,
                      segment_docs=8, num_buckets=4, lm_stats=True)
    got = {
        r["gram"]: r["cf"]
        for r in spark.read.parquet(
            os.path.join(path, "lm_stats")
        ).collect()
    }
    want = {
        r["gram"]: r["cf"]
        for r in spark.read.parquet(
            os.path.join(twin, "lm_stats")
        ).collect()
    }
    assert got == want
    assert got["stream data"] == 6  # 5 base + 1 CDC


# ------------------------------------------- nested-object field indexing


def test_nested_field_equals_flat_field(spark, tmp_path_factory):
    """Indexing a dotted struct path yields BIT-identical scores to
    indexing the same data as a flat column: the nested path is pure
    addressing, the BM25 plan (field-local df/avgdl/norms) is shared."""
    pdf = pd.DataFrame(
        {
            "doc_id": [str(i) for i in range(6)],
            "text": ["alpha beta"] * 6,
            "author": ["kay", "kay lee", "lee", "moss", "kay", "lee moss"],
        }
    )
    flat = spark.createDataFrame(pdf)
    nested = flat.select(
        "doc_id", "text",
        F.struct(F.col("author").alias("author")).alias("meta"),
    )
    p_n = str(tmp_path_factory.mktemp("r4_nested"))
    p_f = str(tmp_path_factory.mktemp("r4_flat"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(nested, cfg, p_n, segment_docs=8, num_buckets=4,
                      fields=("text", "meta.author"))
    build.build_index(flat, cfg, p_f, segment_docs=8, num_buckets=4,
                      fields=("text", "author"))
    s_n = search.load_store(p_n)
    assert s_n.meta["fields"] == ["text", "meta.author"]
    q = pd.DataFrame([(0, "kay lee"), (1, "moss")], columns=["qid", "query"])
    got = search.search(
        spark, s_n, q, k=10, field="meta.author"
    ).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    want = search.search(
        spark, search.load_store(p_f), q, k=10, field="author"
    ).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_nested_field_two_levels_and_validation(spark, tmp_path_factory):
    """Two-level nesting indexes and queries; malformed field names raise."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["1", "2"], "text": ["x", "y"]})
    ).select(
        "doc_id", "text",
        F.struct(
            F.struct(F.lit("deep value").alias("name")).alias("inner")
        ).alias("outer"),
    )
    path = str(tmp_path_factory.mktemp("r4_nested2"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(docs, cfg, path, segment_docs=8, num_buckets=4,
                      fields=("text", "outer.inner.name"))
    got = search.search(
        spark, search.load_store(path),
        pd.DataFrame([(0, "deep")], columns=["qid", "query"]),
        k=10, field="outer.inner.name",
    ).toPandas()
    assert set(got["doc_id"]) == {"1", "2"}
    for bad in ("a:b", "", "a..b", "a b", ".a"):
        with pytest.raises(Exception, match="invalid field name"):
            build.build_index(
                docs, cfg, str(tmp_path_factory.mktemp("r4_badfield")),
                fields=("text", bad),
            )


# -------------------------------------------- scroll deep export


def test_scroll_pages_reassemble_full_result(spark, tmp_path_factory):
    """Scrolling with a small page size reproduces the one-shot full
    result exactly — no dup, no gap, global order preserved."""
    path = str(tmp_path_factory.mktemp("r4_scroll"))
    rows = pd.DataFrame(
        {
            "doc_id": [str(i) for i in range(17)],
            "content": ["alpha " + "pad " * (i % 5) for i in range(17)],
        }
    )
    build.build_index(
        spark.createDataFrame(rows),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    full = search.search(
        spark, store, pd.DataFrame([(0, "alpha")], columns=["qid", "query"]),
        k=100,
    ).toPandas().sort_values("rank").reset_index(drop=True)
    pages = list(search.scroll(spark, store, "alpha", page_size=5))
    assert [len(p) for p in pages] == [5, 5, 5, 2]
    walked = pd.concat(pages, ignore_index=True)
    assert list(walked["doc_id"]) == list(full["doc_id"])
    assert walked["doc_id"].is_unique


# ---------------------- resume + north-rule sha over the new store shapes


def test_lm_stats_resume_skips_and_preserves(spark, tmp_path_factory):
    """A resumed build (all checkpoints present) must not rewrite or skew
    the gram table: second run skips every batch, lm_stats identical."""
    path = str(tmp_path_factory.mktemp("r4_lm_resume"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    corpus = _mk_docs(spark).withColumnRenamed("text", "content")
    build.build_index(corpus, cfg, path, segment_docs=8, num_buckets=4,
                      num_batches=2, lm_stats=True)
    before = {
        r["gram"]: r["cf"]
        for r in spark.read.parquet(
            os.path.join(path, "lm_stats")
        ).collect()
    }
    res = build.build_index(corpus, cfg, path, segment_docs=8,
                            num_buckets=4, num_batches=2, lm_stats=True)
    assert res.skipped_batches == 2 and res.n_docs == 0
    after = {
        r["gram"]: r["cf"]
        for r in spark.read.parquet(
            os.path.join(path, "lm_stats")
        ).collect()
    }
    assert before == after


def test_verify_sha256_nested_field_store(spark, tmp_path_factory):
    """North-rule per-row sha equality holds for dotted-path multi-field
    stores: the recomputation covers the same nested columns the build
    hashed."""
    docs = spark.createDataFrame(
        [("0", "alpha", ("kay",)), ("1", "beta", ("lee",))],
        "doc_id string, text string, meta struct<author:string>",
    )
    path = str(tmp_path_factory.mktemp("r4_sha_nested"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(docs, cfg, path, segment_docs=8, num_buckets=4,
                      fields=("text", "meta.author"))
    assert build.verify_sha256(docs, cfg, path) == 0
    tampered = spark.createDataFrame(
        [("0", "alpha", ("kay",)), ("1", "beta", ("zoe",))],
        "doc_id string, text string, meta struct<author:string>",
    )
    assert build.verify_sha256(tampered, cfg, path) == 1


# ------------------------------------------- CDC over nested-field stores


def test_cdc_batch_on_nested_field_store(spark, tmp_path_factory):
    """An incremental CDC batch whose new_image carries the struct column
    routes through the same dotted-path flattening as the base build —
    the new doc becomes searchable under the nested field."""
    path = str(tmp_path_factory.mktemp("r4_cdc_nested"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    base = spark.createDataFrame(
        [("0", "base text", ("kay",))],
        "doc_id string, text string, meta struct<author:string>",
    )
    build.build_index(base, cfg, path, segment_docs=8, num_buckets=4,
                      fields=("text", "meta.author"))
    events = spark.createDataFrame(
        [("INSERT", ("9",), ("9", "fresh text", ("zoe",)), None)],
        "event_name string, keys struct<doc_id:string>, "
        "new_image struct<doc_id:string, text:string, "
        "meta:struct<author:string>>, "
        "old_image struct<doc_id:string>",
    )
    cdc.apply_changes(events, cfg, path)
    store = search.load_store(path)
    got = search.search(
        spark, store,
        pd.DataFrame([(0, "zoe")], columns=["qid", "query"]),
        k=10, field="meta.author",
    ).toPandas()
    assert list(got["doc_id"]) == ["9"]


# -------------------- pinned / terms lookup / distance_feature / clusters


def test_pinned_promotes_in_order(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_pin"))
    build.build_index(
        spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": ["0", "1", "2", "3"],
                 "content": ["alpha alpha", "alpha", "alpha alpha alpha",
                             "other"]}
            )
        ),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "alpha")], columns=["qid", "query"])
    got = search.search_pinned(
        spark, store, q, {0: ["3", "1", "nosuchdoc"]}, k=10
    ).toPandas().sort_values("rank")
    # pins first in GIVEN order (3 then 1; missing id skipped), then
    # organic by score: doc 2 (tf 3) before doc 0 (tf 2); doc 1 already
    # pinned so it appears once
    assert list(got["doc_id"]) == ["3", "1", "2", "0"]
    assert list(got["pinned"]) == [1, 1, 0, 0]
    assert pd.isna(got.iloc[0]["score_r"])       # '3' has no organic match
    assert not pd.isna(got.iloc[1]["score_r"])   # '1' does


def test_terms_lookup_excludes_source(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_tl"))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ["0", "1", "2", "3"],
             "text": ["alpha beta", "alpha", "beta", "gamma"]}
        )
    )
    build.build_index(
        docs.withColumnRenamed("text", "content"),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "0")], columns=["qid", "lookup_id"])
    got = search.search_terms_lookup(
        spark, store, docs, q, k=10
    ).toPandas()
    assert set(got["doc_id"]) == {"1", "2"}  # share a term; '0' excluded


def test_distance_feature_adds_proximity_bonus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_df"))
    build.build_index(
        spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": ["0", "1"],
                 "content": ["alpha " + "pad " * 3,    # dl 4
                             "alpha " + "pad " * 49]}  # dl 50
            )
        ),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "alpha")], columns=["qid", "query"])
    plain = search.search(spark, store, q, k=10).toPandas()
    boosted = search.search_distance_feature(
        spark, store, q, origin=50.0, pivot=5.0, boost=10.0, k=10
    ).toPandas()
    p = dict(zip(plain["doc_id"], plain["score"]))
    b = dict(zip(boosted["doc_id"], boosted["score"]))
    # doc 1 sits AT the origin → full boost; doc 0 is 46 away → tiny
    assert b["1"] == pytest.approx(p["1"] + 10.0, abs=1e-9)
    assert b["1"] > b["0"]
    with pytest.raises(Exception, match="pivot"):
        search.search_distance_feature(spark, store, q, 50.0, pivot=0.0)


def test_duplicate_spans_merge_and_witness(spark):
    """Sliding-gram witnesses mark and merge into maximal spans; unique
    text stays unmarked; within-doc repeats count as witnesses."""
    from dynamo2es_lambda_spark.operators import dedup

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b", "c"],
                "text": [
                    "one two three four x y z one two three four",
                    "zz one two three four qq",
                    "totally unique words here now",
                ],
            }
        )
    )
    got = sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in dedup.duplicate_spans(docs, window=3).collect()
    )
    assert got == [("a", 0, 4), ("a", 7, 11), ("b", 1, 5)]
    with pytest.raises(Exception, match="window"):
        dedup.duplicate_spans(docs, window=0)


def test_dedup_clusters_transitive(spark):
    from dynamo2es_lambda_spark.operators import dedup

    ids = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b", "c", "d", "e"]})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"a": ["b", "c"], "b": ["c", "d"]})
    )  # chain b-c-d; a, e singletons
    got = {
        r["id"]: r["cluster"]
        for r in dedup.dedup_clusters(ids, pairs).collect()
    }
    assert got == {"a": "a", "b": "b", "c": "b", "d": "b", "e": "e"}


# ---------------- fuzziness=AUTO, suggest_mode, filters agg, mixing


def test_fuzzy_auto_bands_and_suggest_modes(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_auto"))
    build.build_index(
        spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": ["0", "1", "2"],
                 "content": ["ab others", "merge stream", "marge stream"]}
            )
        ),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame(
        [(0, "ax"), (1, "merg"), (2, "strean")], columns=["qid", "term"]
    )
    got = search.search_fuzzy(
        spark, store, q, k=10, max_edits="AUTO"
    ).toPandas()
    by_qid = {q_: set(g["doc_id"]) for q_, g in got.groupby("qid")}
    assert 0 not in by_qid           # 2-char probe: 0 edits, 'ax' absent
    assert by_qid[1] == {"1"}        # 1 edit: merge yes, marge is 2 away
    assert by_qid[2] == {"1", "2"}   # 6-char probe: 2 edits reach stream
    with pytest.raises(Exception, match="AUTO"):
        search.search_fuzzy(spark, store, q, max_edits="fuzzy")

    probes = pd.DataFrame([(0, "merge")], columns=["qid", "probe"])
    always = search.suggest_terms(spark, store, probes, k=5).toPandas()
    assert "merge" in set(always["suggestion"])
    missing = search.suggest_terms(
        spark, store, probes, k=5, suggest_mode="missing"
    ).toPandas()
    assert missing.empty             # 'merge' exists → no correction
    popular = search.suggest_terms(
        spark, store, probes, k=5, suggest_mode="popular"
    ).toPandas()
    # df(merge)=1; only equally-rare neighbors exist → nothing MORE popular
    assert "merge" not in set(popular["suggestion"])
    df_merge = 1
    assert (popular["df"] > df_merge).all()


def test_filters_agg_buckets(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("r4_fagg"))
    build.build_index(
        spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": ["0", "1", "2"],
                 "content": ["alpha fast", "alpha slow", "beta fast"]}
            )
        ),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "alpha")], columns=["qid", "query"])
    got = {
        r["fname"]: r["n_docs"]
        for r in search.search_filters_agg(
            spark, store, q, {"f": "fast", "s": "slow", "none": "zzz"}
        ).collect()
    }
    assert got == {"f": 1, "s": 1, "none": 0}


def test_temperature_mix_rates_math(spark):
    from dynamo2es_lambda_spark.operators import sampling

    d = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [str(i) for i in range(100)],
             "lang": ["en"] * 90 + ["de"] * 10}
        )
    )
    rates = sampling.temperature_mix_rates(
        d, "lang", alpha=0.5, target_frac=0.5
    )
    # mass en=sqrt(90), de=sqrt(10); total=50
    import math

    z = math.sqrt(90) + math.sqrt(10)
    assert rates["en"] == pytest.approx(50 * math.sqrt(90) / z / 90)
    assert rates["de"] == pytest.approx(min(1.0, 50 * math.sqrt(10) / z / 10))
    # alpha<1 upsamples the small stratum relative to its natural share
    assert rates["de"] > rates["en"]


# --------------------------------- perplexity from index-time LM stats


def test_perplexity_from_stats_matches_corpus_model(
    spark, tmp_path_factory
):
    """Scoring against the store's lm_stats model reproduces the
    corpus-recomputed model exactly (same counts by construction);
    stores without the table, or multi-field stores, raise."""
    docs = _mk_docs(spark)
    path = str(tmp_path_factory.mktemp("r4_ppx"))
    build.build_index(
        docs.withColumnRenamed("text", "content"),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4, lm_stats=True,
    )
    got = (
        lm.bigram_perplexity_from_stats(spark, path, docs)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        lm.bigram_perplexity(docs)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    bare = str(tmp_path_factory.mktemp("r4_ppx_bare"))
    build.build_index(
        docs.withColumnRenamed("text", "content"),
        IndexerConfig(index="docs", id_field="doc_id"), bare,
        segment_docs=8, num_buckets=4,
    )
    with pytest.raises(Exception, match="lm_stats"):
        lm.bigram_perplexity_from_stats(spark, bare, docs)


# --------------------------------------- query-time synonym expansion


def test_synonyms_blend_not_or(spark, tmp_path_factory):
    """SynonymQuery semantics: the group scores as ONE pseudo-term — tf
    summed, df = max member df — NOT a plain OR of two BM25 terms."""
    rows = pd.DataFrame(
        {
            "doc_id": ["0", "1", "2", "3"],
            "content": [
                "car auto travel",      # both members once
                "car car ride",         # one member twice
                "auto shop here",
                "train travel here",    # no member
            ],
        }
    )
    path = str(tmp_path_factory.mktemp("r4_syn"))
    build.build_index(
        spark.createDataFrame(rows),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "car")], columns=["qid", "query"])
    got = search.search_synonyms(
        spark, store, q, {"car": ["auto"]}, k=10
    ).toPandas()
    assert set(got["doc_id"]) == {"0", "1", "2"}
    s = dict(zip(got["doc_id"], got["score"]))
    # docs 0 and 1 both have blended tf=2 and dl=3 → identical scores;
    # a plain OR would score doc 0 with two different idfs
    assert s["0"] == pytest.approx(s["1"], abs=1e-12)
    # unknown synonym member just drops; multi-token synonym raises
    got2 = search.search_synonyms(
        spark, store, q, {"car": ["nosuchterm"]}, k=10
    ).toPandas()
    assert set(got2["doc_id"]) == {"0", "1"}
    with pytest.raises(Exception, match="single token"):
        search.search_synonyms(spark, store, q, {"car": ["two words"]})


# --------------------------------------- chunk-level boilerplate dedup


def test_chunk_dup_stats_fractions(spark):
    from dynamo2es_lambda_spark.operators import dedup

    rows = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "text": [
                "one two three four five six",   # chunks: "one two"...
                "one two zzz yyy",               # shares "one two"
                "qq ww ee",                      # no shared chunk
            ],
        }
    )
    docs = spark.createDataFrame(rows)
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"])
        for r in dedup.chunk_dup_stats(
            docs, chunk_tokens=2
        ).collect()
    }
    assert got == {"a": (3, 1), "b": (2, 1), "c": (2, 0)}


# ----------------------------------- ES nested type (same-element match)


def test_nested_query_same_element_semantics(spark, tmp_path_factory):
    """A nested bool (must author + filter body over DIFFERENT subfields)
    matches only when one array element satisfies both — the flattened
    form would cross-match doc 0's two elements."""
    corpus = spark.createDataFrame(
        [
            ("0", [("kay", "great stuff"), ("lee", "bad stuff")]),
            ("1", [("kay", "bad stuff")]),
            ("2", [("lee", "fine stuff")]),
        ],
        "doc_id string, "
        "comments array<struct<author:string,body:string>>",
    )
    p_path = str(tmp_path_factory.mktemp("r4_nq_parent"))
    c_path = str(tmp_path_factory.mktemp("r4_nq_child"))
    build.build_index(
        corpus.selectExpr("doc_id", "'parent text' AS content"),
        IndexerConfig(index="docs", id_field="doc_id"), p_path,
        segment_docs=8, num_buckets=4,
    )
    child = build.explode_nested(corpus, "doc_id", "comments")
    assert child.count() == 4
    build.build_index(
        child,
        IndexerConfig(index="nested", id_field="doc_id",
                      parent_field="parent"),
        c_path, segment_docs=8, num_buckets=4,
        fields=("author", "body"),
    )
    ps, cs = search.load_store(p_path), search.load_store(c_path)
    q = pd.DataFrame(
        [(0, "kay", "", "", "bad", "author", "body")],
        columns=["qid", "must", "should", "must_not", "filter",
                 "must_field", "filter_field"],
    )
    got = search.search_nested(
        spark, ps, cs, q, k=10, score_mode="max"
    ).toPandas()
    assert list(got["doc_id"]) == ["1"]
    # the flattened cross-match trap: bool over the child store WITHOUT
    # element separation (single query string on one field) would also
    # admit doc 0 — prove the element boundary is doing the work
    flat = search.search_bool(
        spark, cs,
        pd.DataFrame([(0, "kay bad", "", "")],
                     columns=["qid", "must", "should", "must_not"]),
        k=10, field="author",
    ).toPandas()
    assert len(flat) == 0  # 'bad' never in author field: AND fails
    with pytest.raises(Exception, match="score_mode"):
        search.search_nested(spark, ps, cs, q, score_mode="median")


# ---------------------------------------------- span_or / span_not


def _mk_span_store(spark, tmp_path_factory, texts):
    path = str(tmp_path_factory.mktemp("r4_span"))
    build.build_index(
        spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [str(i) for i in range(len(texts))],
                 "content": texts}
            )
        ),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4, positions=True,
    )
    return search.load_store(path)


def test_span_or_union_and_score_sum(spark, tmp_path_factory):
    store = _mk_span_store(spark, tmp_path_factory, [
        "alpha beta gamma",      # 0: clause A only
        "delta epsilon zeta",    # 1: clause B only
        "alpha beta delta epsilon",  # 2: both
        "beta alpha epsilon delta",  # 3: neither (wrong order)
    ])
    cl = pd.DataFrame(
        [(0, "alpha beta"), (0, "delta epsilon")],
        columns=["qid", "clause"],
    )
    got = search.search_span_or(spark, store, cl, k=10).toPandas()
    assert set(got["doc_id"]) == {"0", "1", "2"}
    s = dict(zip(got["doc_id"], got["score"]))
    # both-clause doc scores the SUM of its single-clause analogues'
    # term sets — strictly more than either alone
    assert s["2"] > max(s["0"], s["1"])


def test_span_not_excludes_overlapping_spans(spark, tmp_path_factory):
    store = _mk_span_store(spark, tmp_path_factory, [
        "alpha beta gamma",          # 0: include, no exclude → match
        "alpha beta charlie delta",  # 1: 'beta charlie' overlaps → no
        "alpha beta x alpha beta charlie",  # 2: first occurrence clean → match
        "zulu beta charlie",         # 3: no include occurrence
    ])
    q = pd.DataFrame(
        [(0, "alpha beta", "beta charlie")],
        columns=["qid", "include", "exclude"],
    )
    got = search.search_span_not(spark, store, q, k=10).toPandas()
    assert set(got["doc_id"]) == {"0", "2"}
    # widening post past the clean occurrence's slack changes nothing
    # here, but pre large enough to reach a PRECEDING exclude span kills
    # doc 2's second occurrence only (already dead) — sanity: pre/post
    # validation
    with pytest.raises(Exception, match="pre/post"):
        search.search_span_not(spark, store, q, pre=-1)
    # an unindexed exclude span excludes nothing
    q2 = pd.DataFrame(
        [(0, "alpha beta", "nosuchterm")],
        columns=["qid", "include", "exclude"],
    )
    got2 = search.search_span_not(spark, store, q2, k=10).toPandas()
    assert set(got2["doc_id"]) == {"0", "1", "2"}


def _brute_span_not(docs_tokens, inc, exc, pre, post):
    out = []
    for i, d in enumerate(docs_tokens):
        inc_starts = [
            p for p in range(len(d) - len(inc) + 1)
            if d[p: p + len(inc)] == inc
        ]
        exc_starts = [
            p for p in range(len(d) - len(exc) + 1)
            if d[p: p + len(exc)] == exc
        ]
        ok = any(
            not any(
                p - (len(exc) - 1) - pre <= q <= p + (len(inc) - 1) + post
                for q in exc_starts
            )
            for p in inc_starts
        )
        if ok:
            out.append(i)
    return out


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from tests.test_round3 import _mk_by_term  # noqa: E402

_doc_strat = st.lists(st.sampled_from("abc"), min_size=0, max_size=10)


@settings(max_examples=200, deadline=None)
@given(
    docs=st.lists(_doc_strat, min_size=1, max_size=6),
    inc=st.lists(st.sampled_from("abc"), min_size=1, max_size=2),
    exc=st.lists(st.sampled_from("abc"), min_size=1, max_size=2),
    pre=st.integers(min_value=0, max_value=2),
    post=st.integers(min_value=0, max_value=2),
)
def test_span_not_matches_brute_force(docs, inc, exc, pre, post):
    """The chain-start + window-filter composition agrees with exhaustive
    enumeration of include/exclude occurrences on arbitrary tiny
    corpora."""
    import numpy as np

    by = _mk_by_term(docs)
    if any(t not in by for t in inc):
        return  # include can never match
    stride = 64
    cand_all = sorted(
        set.intersection(*[set(by[t][0].tolist()) for t in set(inc)])
    )
    if not cand_all:
        return
    sub = np.asarray(cand_all, dtype=np.int64)
    starts = search._span_chain_starts(by, list(inc), sub, stride)
    got = []
    if starts is not None and starts.size:
        estarts = search._span_chain_starts(by, list(exc), sub, stride)
        kept = search._span_not_filter(
            starts, estarts, stride, len(inc), len(exc), pre, post
        )
        if kept.size:
            got = sorted(sub[np.unique(kept // stride)].tolist())
    assert got == _brute_span_not(docs, list(inc), list(exc), pre, post)


# ------------------------------------- composite agg keyset pagination


def test_terms_agg_pages_reassemble_full_bucket_set(spark, tmp_path_factory):
    """Walking pages with (size, after_key) reconstructs exactly the
    unpaged bucket set, in group order, with no dup or gap."""
    rows = pd.DataFrame(
        {
            "doc_id": [str(i) for i in range(10)],
            "content": ["common term"] * 10,
            "lang": ["de", "en", "es", "fr", "zh"] * 2,
        }
    )
    path = str(tmp_path_factory.mktemp("r4_compagg"))
    build.build_index(
        spark.createDataFrame(rows),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "common")], columns=["qid", "query"])
    full = (
        search.search_terms_agg(spark, store, q, group_col="lang")
        .toPandas().sort_values("group").reset_index(drop=True)
    )
    pages, after = [], None
    while True:
        page = (
            search.search_terms_agg(
                spark, store, q, group_col="lang", size=2, after_key=after
            )
            .toPandas().sort_values("group")
        )
        if page.empty:
            break
        pages.append(page)
        after = page["group"].iloc[-1]
    walked = pd.concat(pages, ignore_index=True)
    pd.testing.assert_frame_equal(walked, full)
    assert [len(p) for p in pages] == [2, 2, 1]


# ------------------------------------------ script_score expression hook


def test_script_score_matches_function_score_and_validates(
    spark, tmp_path_factory
):
    """script \"_score * log1p(1.0 * dl)\" reproduces field_value_factor
    (log1p, multiply) bit-for-bit; non-whitelisted identifiers raise
    BEFORE planning."""
    path = str(tmp_path_factory.mktemp("r4_script"))
    build.build_index(
        _mk_docs(spark).withColumnRenamed("text", "content"),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "stream data")], columns=["qid", "query"])
    via_script = search.search_script_score(
        spark, store, q, "_score * log1p(1.0 * dl)", k=10
    ).toPandas().sort_values("rank").reset_index(drop=True)
    via_fs = search.search_function_score(
        spark, store, q, k=10, factor_col="dl", modifier="log1p",
        factor_weight=1.0, boost_mode="multiply",
    ).toPandas().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(via_script, via_fs)

    # negative results clamp to zero (ES requires non-negative scores)
    clamped = search.search_script_score(
        spark, store, q, "_score - 1000.0", k=10
    ).toPandas()
    assert (clamped["score"] == 0.0).all()

    for bad in ("_score * evil_column", "rand()", "_score; drop",
                "reflect('java.lang.System','exit')"):
        with pytest.raises(Exception, match="script_score references"):
            search.search_script_score(spark, store, q, bad, k=10)


# --------------------------------- calendar-interval date_histogram


def test_search_date_histogram_calendar_buckets(spark, tmp_path_factory):
    """A store with a doc-level date column buckets the match set by
    calendar unit (month/week) — truncation, not fixed width."""
    import datetime as dt

    rows = pd.DataFrame(
        {
            "doc_id": [str(i) for i in range(6)],
            "content": ["alpha topic"] * 5 + ["other text"],
            "ts": [
                dt.datetime(2024, 1, 2),   # week of 2024-01-01
                dt.datetime(2024, 1, 8),   # week of 2024-01-08
                dt.datetime(2024, 1, 31),
                dt.datetime(2024, 2, 1),   # same ISO week as 2024-01-31
                dt.datetime(2024, 3, 15),
                dt.datetime(2024, 1, 3),   # non-matching doc
            ],
        }
    )
    path = str(tmp_path_factory.mktemp("r4_dhist"))
    build.build_index(
        spark.createDataFrame(rows),
        IndexerConfig(index="docs", id_field="doc_id"), path,
        segment_docs=8, num_buckets=4,
    )
    store = search.load_store(path)
    q = pd.DataFrame([(0, "alpha")], columns=["qid", "query"])
    month = {
        (r["bucket"], r["n_docs"])
        for r in search.search_date_histogram(
            spark, store, q, "month"
        ).collect()
    }
    assert month == {("2024-01-01", 3), ("2024-02-01", 1),
                     ("2024-03-01", 1)}
    week = {
        (r["bucket"], r["n_docs"])
        for r in search.search_date_histogram(
            spark, store, q, "week"
        ).collect()
    }
    # 2024-01-31 and 2024-02-01 share the ISO week starting Mon 2024-01-29
    assert ("2024-01-29", 2) in week and ("2024-01-01", 1) in week
    with pytest.raises(Exception, match="calendar_interval"):
        search.search_date_histogram(spark, store, q, "fortnight")


# ------------------------- IVF k-means: O(1) corpus-independent training


def test_kmeans_training_job_count_independent_of_k(spark):
    """Seeding runs on ONE hash-ordered driver sample: the Spark job count
    of training must not grow with n_centroids (the r3 maximin issued k−1
    sequential full-corpus jobs)."""
    import numpy as np

    from dynamo2es_lambda_spark.operators import ann

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(64),
                "embedding": [
                    [float(x) for x in rng.normal(0, 1, 8)] for _ in range(64)
                ],
            }
        )
    )
    sc = spark.sparkContext

    def jobs_for(k):
        group = f"r4_km_{k}"
        sc.setJobGroup(group, "kmeans job count probe")
        try:
            ann.kmeans_centroids(emb, n_centroids=k, iters=1)
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    a, b = jobs_for(2), jobs_for(16)
    assert a == b, (a, b)


# -------------------------------------- after_hook: keyword-only meta


def test_after_hook_keyword_only_meta(spark):
    got = {}

    def hook(result, *, meta=None):
        got["v"] = (result, meta)

    sentinel = object()
    build.invoke_after_hook(hook, "res", sentinel)
    assert got["v"] == ("res", sentinel)


# ------------------- CDC: transform hook that drops every record


def test_cdc_drop_all_transform_hook_skips_build(spark, tmp_path_factory):
    """A transform_record_hook that drops every index record must not run
    a batch build on the empty corpus (ADVICE r3): the batch lands as a
    cdc_only checkpoint and the store keeps serving."""
    path = str(tmp_path_factory.mktemp("r4_cdc_dropall"))
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    build.build_index(
        _mk_docs(spark).withColumnRenamed("text", "content"), cfg, path,
        segment_docs=8, num_buckets=4,
    )
    n_batches_before = len(
        os.listdir(os.path.join(path, "segments"))
    )
    drop_cfg = IndexerConfig(
        index="docs", id_field="doc_id",
        transform_record_hook=lambda df: df.filter("1 = 0"),
    )
    events = spark.createDataFrame(
        pd.DataFrame(
            {"event_name": ["INSERT"], "doc_id": ["200"],
             "content": ["to be dropped"]}
        )
    ).selectExpr(
        "event_name",
        "named_struct('doc_id', doc_id) AS keys",
        "named_struct('doc_id', doc_id, 'content', content) AS new_image",
        "CAST(NULL AS struct<doc_id:string>) AS old_image",
    )
    res = cdc.apply_changes(events, drop_cfg, path)
    assert res["upserts"] == 0
    # no empty segment batch was written
    assert len(os.listdir(os.path.join(path, "segments"))) == n_batches_before
    # the batch name is still claimed (cdc_only checkpoint)
    import json

    ckpt_dir = os.path.join(path, "checkpoints")
    names = sorted(os.listdir(ckpt_dir))
    assert len(names) == 2
    with open(os.path.join(ckpt_dir, names[-1])) as f:
        assert json.load(f).get("cdc_only") is True
