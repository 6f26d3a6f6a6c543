"""Field-mapping stage semantics, one test per reference describe-block
(/root/reference/test/handler-tests.js sections cited per test)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import FieldNotFoundError
from dynamo2es_lambda_spark.operators import fieldmap


@pytest.fixture(scope="module")
def flat(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "repo": ["r1", "r2"],
                "path": ["a/b.py", "c/d.js"],
                "commit": ["c1", "c2"],
                "lang": ["py", "js"],
                "content": ["def foo(): pass", "function bar() {}"],
                "ver": [3, 0],
            }
        )
    )


@pytest.fixture(scope="module")
def cdc(spark):
    pdf = pd.DataFrame(
        {
            "event_name": ["INSERT", "MODIFY"],
            "keys": [
                {"repo": "r1", "path": "p1", "commit": "k1"},
                {"repo": "r2", "path": "p2", "commit": "k2"},
            ],
            "new_image": [
                {"repo": "r1", "path": "p1", "commit": "k1", "lang": "py",
                 "content": "x", "extra": "new1"},
                {"repo": "r2", "path": "p2", "commit": "k2", "lang": "js",
                 "content": "y", "extra": "new2"},
            ],
            "old_image": [
                None,
                {"repo": "r2", "path": "p2", "commit": "old", "lang": "js",
                 "content": "old", "extra": "old2"},
            ],
        }
    )
    schema = (
        "event_name string, "
        "keys struct<repo:string,path:string,commit:string>, "
        "new_image struct<repo:string,path:string,commit:string,lang:string,"
        "content:string,extra:string>, "
        "old_image struct<repo:string,path:string,commit:string,lang:string,"
        "content:string,extra:string>"
    )
    return spark.createDataFrame(pdf, schema=schema)


def rows(df):
    return [r.asDict() for r in df.orderBy("doc_id").collect()]


def test_default_id_is_joined_keys_flat(flat):
    # default id = ALL primary-key fields joined (handler-tests.js:668-697)
    cfg = IndexerConfig(index="i")
    out = rows(fieldmap.apply_field_mapping(flat, cfg))
    assert out[0]["doc_id"] == "r1.a/b.py.c1"
    assert out[0]["index_name"] == "i"
    assert out[0]["error"] is None


def test_default_id_cdc_uses_keys_struct(cdc):
    cfg = IndexerConfig(index="i")
    out = rows(fieldmap.apply_field_mapping(cdc, cfg))
    assert out[0]["doc_id"] == "r1.p1.k1"


def test_custom_separator_and_empty(flat):
    # separator tests (handler-tests.js:469-546); '' allowed (schemas.js:25)
    cfg = IndexerConfig(index="i", separator="-")
    assert rows(fieldmap.apply_field_mapping(flat, cfg))[0]["doc_id"].count("-") >= 2
    cfg0 = IndexerConfig(index="i", separator="", id_field=["repo", "commit"])
    assert rows(fieldmap.apply_field_mapping(flat, cfg0))[0]["doc_id"] == "r1c1"


def test_single_id_field_untyped_passthrough(flat):
    # single path passes through unjoined (lib/utils.js:41-46)
    cfg = IndexerConfig(index="i", id_field="ver")
    out = rows(fieldmap.apply_field_mapping(flat, cfg))
    assert {o["doc_id"] for o in out} == {"3", "0"}


def test_id_resolver_hook(flat):
    # idResolver (handler-tests.js:549-582) — Column-expression analog
    cfg = IndexerConfig(index="i", id_resolver=lambda df: F.upper("repo"))
    out = rows(fieldmap.apply_field_mapping(flat, cfg))
    assert {o["doc_id"] for o in out} == {"R1", "R2"}


def test_index_field_with_prefix(flat):
    # indexPrefix + indexField (handler-tests.js:700-831)
    cfg = IndexerConfig(index_prefix="code-", index_field="lang")
    out = rows(fieldmap.apply_field_mapping(flat, cfg))
    assert {o["index_name"] for o in out} == {"code-py", "code-js"}


def test_type_field_and_blank_omitted(spark):
    # blank type omitted → null (lib/handler.js:71-74, tests :1639-1668)
    df = spark.createDataFrame(
        pd.DataFrame({"repo": ["a"], "path": ["p"], "commit": ["c"],
                      "t": [""], "content": ["x"]})
    )
    cfg = IndexerConfig(index="i", type_field="t")
    out = rows(fieldmap.apply_field_mapping(df, cfg))
    assert out[0]["doc_type"] is None
    cfg2 = IndexerConfig(index="i", doc_type="docs")
    assert rows(fieldmap.apply_field_mapping(df, cfg2))[0]["doc_type"] == "docs"


def test_parent_field(cdc):
    # parentField via getField (handler-tests.js:936-987)
    cfg = IndexerConfig(index="i", parent_field="extra")
    out = rows(fieldmap.apply_field_mapping(cdc, cfg))
    assert {o["parent"] for o in out} == {"new1", "new2"}


def test_coalesce_keys_new_old(cdc):
    # getField precedence Keys → NewImage → OldImage (lib/utils.js:26-39):
    # 'commit' exists in keys ⇒ keys wins over old_image's different value
    cfg = IndexerConfig(index="i", id_field="commit")
    out = rows(fieldmap.apply_field_mapping(cdc, cfg))
    assert {o["doc_id"] for o in out} == {"k1", "k2"}


def test_missing_field_is_plan_time_error(flat):
    with pytest.raises(FieldNotFoundError, match='"nope" field not found'):
        fieldmap.apply_field_mapping(flat, IndexerConfig(index="i", id_field="nope"))


def test_runtime_null_field_routes_to_error_channel(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"repo": ["a", None], "path": ["p", "q"],
                      "commit": ["c", "d"], "content": ["x", "y"]})
    )
    cfg = IndexerConfig(index="i")
    out = fieldmap.apply_field_mapping(df, cfg)
    errs = out.filter(F.col("error").isNotNull()).collect()
    assert len(errs) == 1
    assert errs[0]["error"] == '"repo" field not found in record'


def test_version_field_ok_and_zero(flat):
    # version 0 is legal (handler-tests.js:1211-1247)
    cfg = IndexerConfig(index="i", version_field="ver")
    out = rows(fieldmap.apply_field_mapping(flat, cfg))
    assert sorted(o["version"] for o in out) == [0.0, 3.0]
    assert all(o["error"] is None for o in out)


def test_version_negative_rejected(spark):
    cfg = IndexerConfig(index="i", version_field="v")
    df = spark.createDataFrame(
        pd.DataFrame({"repo": ["a"], "path": ["p"], "commit": ["c"],
                      "v": [-1], "content": ["x"]})
    )
    out = fieldmap.apply_field_mapping(df, cfg).collect()
    assert out[0]["error"] == '"_version" must be larger than or equal to 0'


def test_version_string_rejected(spark):
    # joi convert:false — string '1' is NOT a number (handler-tests.js:1302-1329)
    cfg = IndexerConfig(index="i", version_field="v")
    df = spark.createDataFrame(
        pd.DataFrame({"repo": ["a"], "path": ["p"], "commit": ["c"],
                      "v": ["1"], "content": ["x"]})
    )
    out = fieldmap.apply_field_mapping(df, cfg).collect()
    assert out[0]["error"] == '"_version" must be a number'


def test_pick_fields(flat):
    # pickFields projection (handler-tests.js:989-1131)
    cfg = IndexerConfig(index="i", pick_fields=["lang"])
    out = fieldmap.pick_document_fields(
        fieldmap.apply_field_mapping(flat, cfg), cfg
    )
    assert "lang" in out.columns and "content" not in out.columns
    assert "doc_id" in out.columns


def test_sha256_column(flat):
    import hashlib

    cfg = IndexerConfig(index="i")
    out = rows(fieldmap.apply_field_mapping(flat, cfg))
    want = hashlib.sha256(b"def foo(): pass").hexdigest()
    assert out[0]["content_sha256"] == want
