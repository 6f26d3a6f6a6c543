"""ES nested aggregation + reverse_nested sibling over the child-store
representation of nested objects, and the loud field/meta collision."""

import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, search


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("r4_nested_agg")
    parents = spark.createDataFrame(
        pd.DataFrame(
            [("p1", "alpha one"), ("p2", "alpha two"), ("p3", "beta")],
            columns=["doc_id", "content"],
        )
    )
    pcfg = IndexerConfig(index="p", id_field="doc_id")
    ppath = str(base / "p")
    build.build_index(parents, pcfg, ppath, num_buckets=4)

    rows = [
        # parent p1: two "ann" comments; p2: one ann, one bob; p3: cat
        ("c1", "p1", "ann", "x"),
        ("c2", "p1", "ann", "y"),
        ("c3", "p2", "ann", "z"),
        ("c4", "p2", "bob", "w"),
        ("c5", "p3", "cat", "v"),
    ]
    from pyspark.sql import functions as F

    kids = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "parent", "author",
                                    "content"])
    ).withColumn("author_tag", F.col("author"))  # field+meta must differ
    ccfg = IndexerConfig(index="c", id_field="doc_id",
                         parent_field="parent")
    cpath = str(base / "c")
    build.build_index(kids, ccfg, cpath, num_buckets=4,
                      fields=("author", "content"),
                      doc_meta_cols=("author_tag",))
    return search.load_store(ppath), search.load_store(cpath)


def test_nested_agg_counts_children_and_parents(spark, stores):
    pstore, cstore = stores
    got = (
        search.search_nested_terms_agg(
            spark, pstore, cstore,
            pd.DataFrame([(0, "alpha")], columns=["qid", "query"]),
            group_col="author_tag",
        )
        .toPandas().set_index("group")
    )
    # parents p1+p2 match: ann has 3 child docs across 2 parents
    assert got.loc["ann", "n_children"] == 3
    assert got.loc["ann", "n_parents"] == 2
    assert got.loc["bob", "n_children"] == 1
    assert got.loc["bob", "n_parents"] == 1
    assert "cat" not in got.index  # p3 did not match


def test_meta_col_also_field_raises(spark, tmp_path):
    docs = spark.createDataFrame(
        pd.DataFrame([("d1", "x", "y")],
                     columns=["doc_id", "a", "b"])
    )
    cfg = IndexerConfig(index="docs", id_field="doc_id")
    with pytest.raises(EngineError, match="also indexed fields"):
        build.build_index(
            docs, cfg, str(tmp_path / "s"), fields=("a", "b"),
            doc_meta_cols=("a",),
        )
