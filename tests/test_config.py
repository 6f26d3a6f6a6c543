"""Config-validation suite — constraint matrix ported behaviorally from
/root/reference/test/handler-tests.js:26-184 and lib/schemas.js:17-45."""

import pytest

from dynamo2es_lambda_spark import IndexerConfig, ValidationError


def ok(**kw):
    kw.setdefault("index", "idx")
    return IndexerConfig(**kw)


def test_minimal_valid():
    cfg = ok()
    assert cfg.index == "idx"
    assert cfg.separator == "."          # lib/handler.js:21 default
    assert cfg.retries == 0              # lib/handler.js:11 default


def test_index_xor_index_field_both():
    with pytest.raises(ValidationError, match=r"exclusive peers \[index, index_field\]"):
        IndexerConfig(index="a", index_field="b")


def test_index_xor_index_field_neither():
    with pytest.raises(ValidationError, match=r"at least one of \[index, index_field\]"):
        IndexerConfig()


def test_id_field_oxor_id_resolver():
    with pytest.raises(ValidationError, match=r"\[id_field, id_resolver\]"):
        ok(id_field="a", id_resolver=lambda d, o: "x")
    # each alone is fine
    ok(id_field="a")
    ok(id_field=["a", "b"])
    ok(id_resolver=lambda d, o: "x")


def test_version_field_oxor_version_resolver():
    with pytest.raises(ValidationError, match=r"\[version_field, version_resolver\]"):
        ok(version_field="v", version_resolver=lambda d, o: 1)
    ok(version_field="v")
    ok(version_resolver=lambda d, o: 1)


def test_type_oxor_type_field():
    with pytest.raises(ValidationError, match=r"\[doc_type, type_field\]"):
        ok(doc_type="t", type_field="tf")
    ok(doc_type="t")
    ok(type_field=["a", "b"])


def test_index_without_index_prefix():
    with pytest.raises(ValidationError, match=r'"index" conflict with forbidden peer'):
        IndexerConfig(index="a", index_prefix="p-")


def test_index_prefix_with_index_field():
    with pytest.raises(ValidationError, match=r'"index_prefix" missing required peer'):
        IndexerConfig(index_prefix="p-")
    IndexerConfig(index_prefix="p-", index_field="f")
    IndexerConfig(index_prefix="", index_field="f")  # empty prefix allowed


def test_separator_empty_allowed():
    # lib/schemas.js:25 — joi.string().allow('')
    assert ok(separator="").separator == ""


def test_field_type_errors():
    with pytest.raises(ValidationError, match=r'"id_field" must be'):
        ok(id_field=[])
    with pytest.raises(ValidationError, match=r'"pick_fields" must be'):
        ok(pick_fields=123)
    with pytest.raises(ValidationError, match=r'"index" must be'):
        IndexerConfig(index="")


def test_callable_type_errors():
    with pytest.raises(ValidationError, match=r'"transform_record_hook" must be a callable'):
        ok(transform_record_hook="nope")


def test_collect_all_errors():
    # joi abortEarly:false (lib/utils.js:12) — every violation reported at once
    with pytest.raises(ValidationError) as ei:
        IndexerConfig(
            index="a",
            index_field="b",
            id_field="x",
            id_resolver=lambda d, o: 1,
            transform_record_hook=5,
        )
    assert len(ei.value.details) == 3


def test_unknown_key_rejected():
    # joi allowUnknown:false default (lib/utils.js:13)
    with pytest.raises(ValidationError, match=r'"bogus" is not allowed'):
        IndexerConfig.from_dict({"index": "a", "bogus": 1})


def test_sink_options_body_forbidden():
    # lib/schemas.js:12-14
    with pytest.raises(ValidationError, match=r'"sink_options.body" is not allowed'):
        ok(sink_options={"body": []})
