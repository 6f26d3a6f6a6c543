"""DynamoDB AttributeValue converter (SURVEY.md §2.1 #5) — fixture pattern
mirrors the reference: marshal plain objects through the converter, run the
pipeline, assert exact outputs (/root/reference/test/utils/
ddb-stream-event-formatter.js)."""

import numpy as np
import pandas as pd
import pytest

from dynamo2es_lambda_spark import IndexerConfig
from dynamo2es_lambda_spark.errors import EngineError
from dynamo2es_lambda_spark.plans import build, cdc, search
from dynamo2es_lambda_spark.sources import dynamo_json, synthetic
from dynamo2es_lambda_spark.streaming import apply_cdc


def test_roundtrip_scalars_and_nesting():
    vals = [
        "text", 0, 1, -5, 2.5, True, False, None, b"\x00\xff",
        {"nested": {"deep": [1, "two", None, {"x": 3.5}]}},
        ["a", 1, [2, 3]],
    ]
    for v in vals:
        assert dynamo_json.unmarshall_value(dynamo_json.marshall_value(v)) == v


def test_wire_forms_match_dynamodb():
    u = dynamo_json.unmarshall_value
    assert u({"S": "hi"}) == "hi"
    assert u({"N": "42"}) == 42 and isinstance(u({"N": "42"}), int)
    assert u({"N": "1.5"}) == 1.5
    assert u({"BOOL": True}) is True
    assert u({"NULL": True}) is None
    assert u({"SS": ["a", "b"]}) == ["a", "b"]
    assert u({"NS": ["1", "2.5"]}) == [1, 2.5]
    assert u({"M": {"k": {"L": [{"N": "7"}]}}}) == {"k": [7]}
    with pytest.raises(EngineError, match="unknown AttributeValue"):
        u({"ZZ": 1})
    with pytest.raises(EngineError, match="not an AttributeValue"):
        u("plain")


def test_decode_stream_events_to_cdc_apply(spark, tmp_path):
    """Raw typed-JSON stream records → decode → apply_changes end-to-end:
    version LWW and REMOVE tombstones behave identically to pre-decoded
    events (the reference's full wire path)."""
    path = str(tmp_path / "wire")
    pdf = synthetic.corpus_pdf(np.arange(30))
    pdf["version"] = 0
    cfg = IndexerConfig(index="code", version_field="version",
                        record_error_hook=lambda df: None)
    build.build_index(spark.createDataFrame(pdf), cfg, path,
                      segment_docs=64, num_buckets=8)

    def keys(r):
        return {"repo": r["repo"], "path": r["path"], "commit": r["commit"]}

    def img(r, version, content=None):
        return {
            "repo": r["repo"], "path": r["path"], "commit": r["commit"],
            "lang": r["lang"],
            "content": content if content is not None else r["content"],
            "version": version,
        }

    r0, r1 = pdf.iloc[0], pdf.iloc[1]
    raw = [
        dynamo_json.format_stream_record(
            "MODIFY", keys(r0), img(r0, 1, "replacement wire payload"),
            img(r0, 0),
        ),
        dynamo_json.format_stream_record(
            "REMOVE", keys(r1), None, img(r1, 0)
        ),
    ]
    events = dynamo_json.decode_stream_events(
        spark.createDataFrame(pd.DataFrame({"record_json": raw})),
        apply_cdc.EVENT_SCHEMA,
    )
    res = cdc.apply_changes(events, cfg, path, segment_docs=64)
    assert res["upserts"] == 1 and res["deletes"] == 1

    store = search.load_store(path)
    assert store.meta["n_docs"] == 29  # one removed
    hit = search.search(
        spark, store,
        pd.DataFrame({"qid": [0], "query": ["replacement wire payload"]}),
        k=5,
    ).toPandas()
    doc0 = f"{r0['repo']}.{r0['path']}.{r0['commit']}"
    assert hit["doc_id"].iloc[0] == doc0


def test_decode_tolerates_unknown_attrs_and_missing_images(spark):
    raw = [
        dynamo_json.format_stream_record(
            "INSERT",
            {"repo": "r", "path": "p", "commit": "c"},
            {"repo": "r", "path": "p", "commit": "c", "lang": "py",
             "content": "x", "version": 1, "extra_attr": "dropped"},
        ),
    ]
    out = dynamo_json.decode_stream_events(
        spark.createDataFrame(pd.DataFrame({"record_json": raw})),
        apply_cdc.EVENT_SCHEMA,
    ).collect()
    assert out[0]["old_image"] is None
    assert out[0]["new_image"]["content"] == "x"
    assert "extra_attr" not in out[0]["new_image"].asDict()
