"""Golden option-validation cases, one test per reference describe case
(/root/reference/test/handler-tests.js:26-184 'options validation'),
translated to the engine's snake_case surface. Each test asserts the FULL
ordered details list — the collect-all message shape — so a wording or
collection regression cannot pass silently.

Untranslatable reference items (the ``elasticsearch.client`` option — the
engine's sink is its own store) are omitted from the expected lists; the
reference's ``es``/``junk`` unknown-key cases and its ``bulk`` option map
to ``from_dict`` unknown keys and ``sink_options``."""

import pytest

from dynamo2es_lambda_spark import IndexerConfig, ValidationError


def _details(opts: dict) -> list[str]:
    with pytest.raises(ValidationError) as ei:
        IndexerConfig.from_dict(opts)
    return ei.value.details


def test_no_options_object():
    """handler-tests.js:27-29 — a bare call is a ValidationError (the
    engine still needs its index routing)."""
    with pytest.raises(ValidationError) as ei:
        IndexerConfig()
    assert ei.value.details == [
        '"options" must contain at least one of [index, index_field]'
    ]


def test_incompatible_options_collects_every_conflict():
    """handler-tests.js:31-56 — every exclusive-peer conflict plus the
    unknown-key violation reported in ONE error."""
    got = _details(
        {
            "es": {},
            "id_field": "id",
            "id_resolver": lambda r: r,
            "index": "foo",
            "index_field": "bar",
            "index_prefix": "baz",
            "doc_type": "foo",
            "type_field": "bar",
            "version_field": "_v",
            "version_resolver": lambda r: r,
        }
    )
    assert got == [
        '"es" is not allowed',
        '"options" contains a conflict between optional exclusive peers '
        "[id_field, id_resolver]",
        '"options" contains a conflict between optional exclusive peers '
        "[version_field, version_resolver]",
        '"options" contains a conflict between exclusive peers '
        "[index, index_field]",
        '"options" contains a conflict between optional exclusive peers '
        "[doc_type, type_field]",
        '"index" conflict with forbidden peer "index_prefix"',
    ]


def test_invalid_options_first_set():
    """handler-tests.js:58-98 — every type violation collected, none
    masked by another."""
    got = _details(
        {
            "es": "foo",
            "before_hook": {},
            "after_hook": {},
            "record_error_hook": {},
            "error_hook": {},
            "transform_record_hook": {},
            "separator": 5,
            "id_field": {},
            "index_field": {},
            "index_prefix": 5,
            "type_field": {},
            "parent_field": {},
            "pick_fields": {},
            "version_field": {},
            "retry_options": 2,
        }
    )
    assert got == [
        '"es" is not allowed',
        '"parent_field" must be a non-empty string',
        '"version_field" must be a non-empty string',
        '"index_prefix" must be a string',
        '"separator" must be a string',
        '"id_field" must be a non-empty string or a non-empty list of '
        "non-empty strings",
        '"index_field" must be a non-empty string or a non-empty list of '
        "non-empty strings",
        '"pick_fields" must be a non-empty string or a non-empty list of '
        "non-empty strings",
        '"type_field" must be a non-empty string or a non-empty list of '
        "non-empty strings",
        '"after_hook" must be a callable',
        '"before_hook" must be a callable',
        '"error_hook" must be a callable',
        '"record_error_hook" must be a callable',
        '"transform_record_hook" must be a callable',
        '"retry_options" must be a dict',
    ]


def test_invalid_options_second_set():
    """handler-tests.js:100-118."""
    got = _details(
        {
            "id_resolver": 1,
            "index": 1,
            "doc_type": 2,
            "version_resolver": 3,
        }
    )
    assert got == [
        '"doc_type" must be a non-empty string',
        '"index" must be a non-empty string',
        '"id_resolver" must be a callable',
        '"version_resolver" must be a callable',
    ]


def test_required_options_missing():
    """handler-tests.js:120-132 — index_prefix alone is doubly wrong."""
    got = _details({"index_prefix": "foo"})
    assert got == [
        '"options" must contain at least one of [index, index_field]',
        '"index_prefix" missing required peer "index_field"',
    ]


def test_sink_options_must_be_dict():
    """handler-tests.js:134-148 — the reference's elasticsearch.bulk type
    check; the engine's bulk analog is sink_options."""
    got = _details({"index": "index", "doc_type": "type", "sink_options": ""})
    assert got == ['"sink_options" must be a dict']


def test_sink_options_body_forbidden():
    """handler-tests.js:150-166 — bulk.body is engine-owned."""
    got = _details(
        {"index": "index", "doc_type": "type", "sink_options": {"body": {}}}
    )
    assert got == ['"sink_options.body" is not allowed']


def test_unknown_options_rejected():
    """handler-tests.js:168-183."""
    got = _details({"junk": "junk", "index": "index", "doc_type": "type"})
    assert got == ['"junk" is not allowed']


def test_error_message_joins_details_with_dot_space():
    """The reference formats the thrown message as details joined by
    '. ' (test/handler-tests.js:16-18 formatErrorMessage)."""
    with pytest.raises(ValidationError) as ei:
        IndexerConfig.from_dict({"index_prefix": "foo"})
    assert str(ei.value) == ". ".join(ei.value.details)
