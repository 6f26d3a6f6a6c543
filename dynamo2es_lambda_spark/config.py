"""Engine configuration with joi-equivalent eager validation.

Reproduces the reference's options surface and constraint set
(/root/reference/lib/schemas.js:17-45) and its collect-all-errors behavior
(/root/reference/lib/utils.js:7-24, ``abortEarly: false``): every violated
constraint is reported in one ValidationError, unknown keys are rejected, and
validation happens at construction time — before any data is touched
(/root/reference/lib/handler.js:14).

Field names are the snake_case analogs of the reference's camelCase options;
``doc_type`` stands in for the reference's ``type`` (Python keyword clash).
The reference's ``elasticsearch`` client option has no analog here — the sink
is the engine's own index store (see plans/build.py) — but its ``bulk`` option
dict survives as ``sink_options`` with the same "body is forbidden" rule
(lib/schemas.js:12-14).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Callable

from .errors import ValidationError

DEFAULT_SEPARATOR = "."  # lib/handler.js:21
DEFAULT_RETRY_COUNT = 0  # lib/handler.js:11

_FIELD_OPTS = frozenset({"id_field", "index_field", "type_field", "pick_fields"})
_STRING_OPTS = frozenset({"index", "doc_type", "parent_field", "version_field"})
_STRING_ALLOW_EMPTY = frozenset({"separator", "index_prefix"})
_FUNC_OPTS = frozenset(
    {
        "id_resolver",
        "version_resolver",
        "transform_record_hook",
        "before_hook",
        "after_hook",
        "record_error_hook",
        "error_hook",
    }
)
_DICT_OPTS = frozenset({"retry_options", "sink_options"})


def _is_field(v: Any) -> bool:
    return isinstance(v, str) and len(v) >= 1


@dataclass(frozen=True)
class IndexerConfig:
    """Validated engine configuration (the reference's ``options`` object)."""

    # routing — xor(index, index_field); without(index, index_prefix);
    # with(index_prefix, index_field)  (lib/schemas.js:41-44)
    index: str | None = None
    index_field: str | list[str] | None = None
    index_prefix: str | None = None
    # doc type — oxor(doc_type, type_field)  (lib/schemas.js:42)
    doc_type: str | None = None
    type_field: str | list[str] | None = None
    # id — oxor(id_field, id_resolver)  (lib/schemas.js:39)
    id_field: str | list[str] | None = None
    id_resolver: Callable[..., Any] | None = None
    # version — oxor(version_field, version_resolver)  (lib/schemas.js:40)
    version_field: str | None = None
    version_resolver: Callable[..., Any] | None = None
    parent_field: str | None = None
    pick_fields: str | list[str] | None = None
    separator: str = DEFAULT_SEPARATOR
    transform_record_hook: Callable[..., Any] | None = None
    before_hook: Callable[..., Any] | None = None
    after_hook: Callable[..., Any] | None = None
    record_error_hook: Callable[..., Any] | None = None
    error_hook: Callable[..., Any] | None = None
    retry_options: dict[str, Any] = field(default_factory=dict)
    sink_options: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        validate_options(self)

    @property
    def retries(self) -> int:
        # merge over {retries: DEFAULT_RETRY_COUNT} (lib/handler.js:25)
        return int(self.retry_options.get("retries", DEFAULT_RETRY_COUNT))

    @classmethod
    def from_dict(cls, options: dict[str, Any]) -> "IndexerConfig":
        """Build from a plain dict, rejecting unknown keys (joi default).

        Collect-all like the reference (test/handler-tests.js:31-56 asserts
        unknown-key AND peer-conflict messages in ONE error): unknown-key
        violations merge with the constraint violations of the remaining
        options instead of aborting early. Ordering is the engine's
        deterministic one — unknown keys first (sorted), then type checks,
        then peer constraints — not joi's schema order."""
        known = {f.name for f in fields(cls)}
        unk_errs = [
            f'"{k}" is not allowed' for k in sorted(set(options) - known)
        ]
        try:
            cfg = cls(**{k: v for k, v in options.items() if k in known})
        except ValidationError as e:
            raise ValidationError(unk_errs + e.details) from None
        if unk_errs:
            raise ValidationError(unk_errs)
        return cfg


def validate_options(cfg: IndexerConfig) -> None:
    """Collect-all-errors validation of the full constraint set.

    Constraint-for-constraint port of lib/schemas.js:17-45 semantics (not
    code): type checks on every option, then the six peer constraints.
    """
    errs: list[str] = []

    def get(name: str) -> Any:
        return getattr(cfg, name)

    for name in sorted(_STRING_OPTS):
        v = get(name)
        if v is not None and not _is_field(v):
            errs.append(f'"{name}" must be a non-empty string')
    for name in sorted(_STRING_ALLOW_EMPTY):
        v = get(name)
        if v is not None and not isinstance(v, str):
            errs.append(f'"{name}" must be a string')
    for name in sorted(_FIELD_OPTS):
        v = get(name)
        if v is None:
            continue
        ok = _is_field(v) or (
            isinstance(v, list) and len(v) >= 1 and all(_is_field(x) for x in v)
        )
        if not ok:
            errs.append(
                f'"{name}" must be a non-empty string or a non-empty list of '
                "non-empty strings"
            )
    for name in sorted(_FUNC_OPTS):
        v = get(name)
        if v is not None and not callable(v):
            errs.append(f'"{name}" must be a callable')
    for name in sorted(_DICT_OPTS):
        v = get(name)
        if not isinstance(v, dict):
            errs.append(f'"{name}" must be a dict')
    if isinstance(cfg.sink_options, dict) and "body" in cfg.sink_options:
        # lib/schemas.js:12-14 — bulk body is engine-owned
        errs.append('"sink_options.body" is not allowed')

    def present(name: str) -> bool:
        return get(name) is not None

    # .oxor('idField', 'idResolver')  lib/schemas.js:39
    if present("id_field") and present("id_resolver"):
        errs.append(
            '"options" contains a conflict between optional exclusive peers '
            "[id_field, id_resolver]"
        )
    # .oxor('versionField', 'versionResolver')  lib/schemas.js:40
    if present("version_field") and present("version_resolver"):
        errs.append(
            '"options" contains a conflict between optional exclusive peers '
            "[version_field, version_resolver]"
        )
    # .xor('index', 'indexField')  lib/schemas.js:41
    if present("index") and present("index_field"):
        errs.append(
            '"options" contains a conflict between exclusive peers '
            "[index, index_field]"
        )
    elif not present("index") and not present("index_field"):
        errs.append('"options" must contain at least one of [index, index_field]')
    # .oxor('type', 'typeField')  lib/schemas.js:42
    if present("doc_type") and present("type_field"):
        errs.append(
            '"options" contains a conflict between optional exclusive peers '
            "[doc_type, type_field]"
        )
    # .without('index', 'indexPrefix')  lib/schemas.js:43
    if present("index") and present("index_prefix"):
        errs.append('"index" conflict with forbidden peer "index_prefix"')
    # .with('indexPrefix', 'indexField')  lib/schemas.js:44
    if present("index_prefix") and not present("index_field"):
        errs.append('"index_prefix" missing required peer "index_field"')

    if errs:
        raise ValidationError(errs)
