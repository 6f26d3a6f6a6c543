"""Dense-ID build mode (SURVEY.md §4.2 item 5, SCALE.md §1): rank-dense
doc_ints via one range shuffle; posting deltas shrink ~8x vs hash ids while
every query result stays rank-identical. Mode is sticky store metadata —
resume and CDC inherit it."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, cdc, search
from dynamo2es_lambda_spark.sources import store_io, synthetic
from dynamo2es_lambda_spark.streaming import apply_cdc

CFG = IndexerConfig(index="code", version_field="version",
                    record_error_hook=lambda df: None)
N = 200


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = synthetic.corpus_pdf(np.arange(N))
    pdf["version"] = 0
    return spark.createDataFrame(pdf).repartition(5)


@pytest.fixture(scope="module")
def stores(spark, corpus, tmp_path_factory):
    out = {}
    for mode in ("hash", "dense"):
        p = str(tmp_path_factory.mktemp(f"ids_{mode}"))
        build.build_index(corpus, CFG, p, segment_docs=64, num_buckets=8,
                          id_mode=mode, positions=True)
        out[mode] = p
    return out


def _doc_bytes(spark, path):
    r = store_io.read_blocks(spark, path).agg(
        F.sum(F.length("doc_bytes")).alias("b"),
        F.sum("n_docs").alias("n"),
    ).first()
    return int(r["b"]), int(r["n"])


def test_dense_rank_identical_and_smaller(spark, stores):
    q = synthetic.queries_pdf()
    res = {}
    for mode, p in stores.items():
        st = search.load_store(p)
        assert st.meta["id_mode"] == mode
        res[mode] = (
            search.search(spark, st, q, k=10, algo="wand")
            .orderBy("qid", "rank").toPandas()
        )
    pd.testing.assert_frame_equal(res["hash"], res["dense"])

    hb, hn = _doc_bytes(spark, stores["hash"])
    db, dn = _doc_bytes(spark, stores["dense"])
    assert hn == dn
    assert db * 3 < hb, (hb, db)  # dense deltas are several x smaller


def test_dense_phrase_works(spark, stores):
    st = search.load_store(stores["dense"])
    res = search.search_phrase(
        spark, st, pd.DataFrame({"qid": [0], "query": ["merge window"]}), k=5
    ).toPandas()
    st_h = search.load_store(stores["hash"])
    res_h = search.search_phrase(
        spark, st_h, pd.DataFrame({"qid": [0], "query": ["merge window"]}), k=5
    ).toPandas()
    pd.testing.assert_frame_equal(res, res_h)


def test_dense_ids_contiguous_and_deterministic(spark, corpus, stores,
                                                tmp_path_factory):
    """Dense ids cover exactly [0, N) and are a pure function of the data:
    a rebuild under different parallelism assigns identical ids."""
    stats = (
        search.load_store(stores["dense"]).doc_stats(spark)
        .select("doc_int", "doc_id").toPandas()
        .sort_values("doc_int", ignore_index=True)
    )
    assert stats["doc_int"].tolist() == list(range(len(stats)))

    p2 = str(tmp_path_factory.mktemp("ids_dense2"))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        build.build_index(
            corpus.repartition(13), CFG, p2, segment_docs=64, num_buckets=8,
            id_mode="dense", positions=True, dense_partitions=5,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    stats2 = (
        search.load_store(p2).doc_stats(spark)
        .select("doc_int", "doc_id").toPandas()
        .sort_values("doc_int", ignore_index=True)
    )
    pd.testing.assert_frame_equal(stats, stats2)


def test_dense_duplicate_doc_ids_rejected(spark, tmp_path):
    dup = spark.createDataFrame(
        [("r", "p", "c", "py", "text one", 0),
         ("r", "p", "c", "py", "text two", 0)],
        "repo string, path string, commit string, lang string, "
        "content string, version long",
    )
    with pytest.raises(EngineError, match="duplicate doc_id"):
        build.build_index(dup, CFG, str(tmp_path / "dup"), id_mode="dense")


def test_conflicting_mode_flags_rejected(spark, stores, corpus):
    with pytest.raises(EngineError, match="id_mode"):
        build.build_index(corpus, CFG, stores["dense"], id_mode="hash")
    with pytest.raises(EngineError, match="positions"):
        build.build_index(corpus, CFG, stores["dense"], positions=False)


def test_dense_mode_is_sticky_for_resume_and_cdc(spark, corpus, stores,
                                                 tmp_path_factory):
    import shutil

    # work on a COPY: this test mutates the store (CDC append) and the
    # module-scoped fixture is shared with the read-only tests
    p = str(tmp_path_factory.mktemp("sticky")) + "/store"
    shutil.copytree(stores["dense"], p)
    # resume run with NO id_mode argument inherits dense
    res = build.build_index(corpus, CFG, p, segment_docs=64, num_buckets=8)
    assert res.skipped_batches == 1
    assert search.load_store(p).meta["id_mode"] == "dense"

    # CDC batch inherits dense ids in the new batch's namespace
    pdf = synthetic.corpus_pdf(np.arange(N))
    r = pdf.iloc[0]
    ev = pd.DataFrame([(
        "MODIFY",
        {"repo": r["repo"], "path": r["path"], "commit": r["commit"]},
        {"repo": r["repo"], "path": r["path"], "commit": r["commit"],
         "lang": r["lang"], "content": "dense cdc payload", "version": 1},
        None,
    )], columns=["event_name", "keys", "new_image", "old_image"])
    cdc.apply_changes(
        spark.createDataFrame(ev, schema=apply_cdc.EVENT_SCHEMA), CFG, p,
        segment_docs=64,
    )
    st = search.load_store(p)
    got = search.search(
        spark, st, pd.DataFrame({"qid": [0], "query": ["dense cdc payload"]}),
        k=5,
    ).toPandas()
    doc0 = f"{r['repo']}.{r['path']}.{r['commit']}"
    assert got["doc_id"].tolist() == [doc0]
    # new batch's ids live in the batch-1 namespace, old in batch-0
    ints = st.doc_stats(spark).select("doc_int").toPandas()["doc_int"]
    from dynamo2es_lambda_spark.operators.ids import DENSE_BATCH_SHIFT

    assert (ints >= (1 << DENSE_BATCH_SHIFT)).sum() == 1


def test_unknown_id_mode_rejected(spark, corpus, tmp_path):
    with pytest.raises(EngineError, match="unknown id_mode"):
        build.build_index(corpus, CFG, str(tmp_path / "x"), id_mode="zzz")
