"""Field-mapping / id / routing / versioning pipeline as a DataFrame stage.

Re-expresses the reference's per-record pipeline (/root/reference/
lib/handler.js:38-136) declaratively: every rule below is a native Column
expression (whole-stage codegen, no Python in the hot path).

Reference semantics preserved (citations per rule):
- getField: coalesce Keys → NewImage → OldImage, first defined wins
  (lib/utils.js:26-39); missing everywhere → FieldNotFoundError, routed to the
  per-record error channel (lib/handler.js:41,127-133) as an ``error`` column.
- assembleField: list of paths joined with separator; single path passes
  through untyped (lib/utils.js:41-46).
- doc id: id_resolver > id_field assembly > concat of ALL primary-key fields
  (lib/handler.js:52-58).
- index routing: static ``index`` XOR ``index_prefix + assemble(index_field)``
  (lib/handler.js:60-62); type: static XOR assembled, omitted when blank
  (lib/handler.js:63-74); parent via getField (lib/handler.js:76-78).
- version: resolver or field; must be a number >= 0 (lib/schemas.js:58,
  lib/handler.js:80-87); violations → error channel with the reference's
  message text.

Two accepted input shapes:
- flat corpus rows (BASELINE.json input_hint: repo/path/commit/lang/content) —
  ``key_cols`` names the primary key;
- CDC rows ``(event_name, keys struct, new_image struct, old_image struct)``
  mirroring the DynamoDB stream record (lib/schemas.js:47-56).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import IndexerConfig
from ..errors import FieldNotFoundError

CDC_COLS = ("keys", "new_image", "old_image")
DEFAULT_KEY_COLS = ("repo", "path", "commit")

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def is_cdc_frame(df: DataFrame) -> bool:
    return set(CDC_COLS) <= set(df.columns)


def _resolve_type(schema: T.DataType, path: str) -> T.DataType | None:
    """Walk a (possibly dotted) path through nested structs; None if absent."""
    cur = schema
    for part in path.split("."):
        if not isinstance(cur, T.StructType):
            return None
        match = next((f for f in cur.fields if f.name == part), None)
        if match is None:
            return None
        cur = match.dataType
    return cur


def get_field(df: DataFrame, path: str) -> tuple[Column, T.DataType]:
    """lib/utils.js:26-39 — coalesce over Keys → NewImage → OldImage.

    Plan-time resolution: if the path exists in none of the candidate scopes,
    raise FieldNotFoundError immediately (the static analog of the runtime
    throw). Returns (column, resolved type of the first match).
    """
    if is_cdc_frame(df):
        scopes = [f"{s}.{path}" for s in CDC_COLS]
    else:
        scopes = [path]
    found: list[tuple[str, T.DataType]] = []
    for s in scopes:
        dt = _resolve_type(df.schema, s)
        if dt is not None:
            found.append((s, dt))
    if not found:
        raise FieldNotFoundError(path)
    col = F.coalesce(*[F.col(s) for s, _ in found]) if len(found) > 1 \
        else F.col(found[0][0])
    return col, found[0][1]


def assemble_field(df: DataFrame, paths: str | list[str],
                   separator: str) -> tuple[Column, Column]:
    """lib/utils.js:41-46. Returns (value, missing_path_message).

    For a list, components are cast to string and joined with ``separator``;
    a single path passes through untyped. The second column is the first
    runtime-missing component's FieldNotFoundError message (null if none) —
    the error-channel feed (concat_ws would silently skip nulls; the
    reference throws instead, lib/utils.js:35).
    """
    if isinstance(paths, str):
        col, _ = get_field(df, paths)
        err = F.when(
            col.isNull(), F.lit(f'"{paths}" field not found in record')
        )
        return col, err
    cols = [get_field(df, p)[0] for p in paths]
    err = F.lit(None).cast("string")
    for p, c in reversed(list(zip(paths, cols))):
        err = F.when(
            c.isNull(), F.lit(f'"{p}" field not found in record')
        ).otherwise(err)
    value = F.concat_ws(separator, *[c.cast("string") for c in cols])
    return value, err


def _first_error(*errs: Column) -> Column:
    return F.coalesce(*errs) if errs else F.lit(None).cast("string")


def apply_field_mapping(
    df: DataFrame,
    cfg: IndexerConfig,
    key_cols: tuple[str, ...] = DEFAULT_KEY_COLS,
    content_col: str = "content",
    id_resolver_col: Callable[[DataFrame], Column] | None = None,
) -> DataFrame:
    """The whole mapping stage: adds doc_id / index_name / doc_type / parent /
    version / content_sha256 / error columns.

    ``cfg.id_resolver`` (and ``version_resolver``) are expected to be
    Column-returning callables ``f(df) -> Column`` — the Spark-native analog
    of the reference's ``idResolver(doc, oldImage)`` hook
    (lib/handler.js:52-54); a vectorized pandas_udf column also works.
    """
    errs: list[Column] = []
    sep = cfg.separator

    # --- doc id (lib/handler.js:52-58) ---
    if cfg.id_resolver is not None:
        doc_id = cfg.id_resolver(df)
    elif cfg.id_field is not None:
        doc_id, e = assemble_field(df, cfg.id_field, sep)
        errs.append(e)
    else:
        # default: ALL primary-key fields joined with separator
        if is_cdc_frame(df):
            # Object.keys(parsedRecord.Keys) in schema order, resolved via
            # getField's coalesce like the reference (lib/handler.js:57)
            keys_t = _resolve_type(df.schema, "keys")
            fields = [f.name for f in keys_t.fields]
        else:
            fields = list(key_cols)
        doc_id, e = assemble_field(df, fields, sep)
        errs.append(e)

    # --- index routing (lib/handler.js:60-62) ---
    if cfg.index is not None:
        index_name: Column = F.lit(cfg.index)
    else:
        assembled, e = assemble_field(df, cfg.index_field, sep)
        errs.append(e)
        prefix = cfg.index_prefix or ""
        index_name = F.concat(F.lit(prefix), assembled.cast("string"))

    # --- type routing, blank omitted → null (lib/handler.js:63-74) ---
    if cfg.doc_type is not None:
        doc_type: Column = F.lit(cfg.doc_type)
    elif cfg.type_field is not None:
        assembled, e = assemble_field(df, cfg.type_field, sep)
        errs.append(e)
        doc_type = F.when(assembled.cast("string") != "", assembled.cast("string"))
    else:
        doc_type = F.lit(None).cast("string")

    # --- parent (lib/handler.js:76-78) ---
    if cfg.parent_field is not None:
        parent, e = assemble_field(df, cfg.parent_field, sep)
        errs.append(e)
        parent = parent.cast("string")
    else:
        parent = F.lit(None).cast("string")

    # --- version (lib/handler.js:80-87; joi number().min(0) schemas.js:58) ---
    if cfg.version_resolver is not None:
        version = cfg.version_resolver(df).cast("double")
    elif cfg.version_field is not None:
        vcol, vtype = get_field(df, cfg.version_field)
        if isinstance(vtype, _NUMERIC):
            version = vcol.cast("double")
            errs.append(
                F.when(vcol.isNull(),
                       F.lit(f'"{cfg.version_field}" field not found in record'))
            )
        else:
            # joi convert:false — a string version is NOT coerced
            # (test/handler-tests.js:1302-1329)
            version = F.lit(None).cast("double")
            errs.append(
                F.when(vcol.isNotNull(), F.lit('"_version" must be a number'))
                .otherwise(
                    F.lit(f'"{cfg.version_field}" field not found in record'))
            )
        errs.append(
            F.when(version < 0,
                   F.lit('"_version" must be larger than or equal to 0'))
        )
    else:
        version = F.lit(None).cast("double")

    out = (
        df.withColumn("doc_id", doc_id.cast("string"))
        .withColumn("index_name", index_name)
        .withColumn("doc_type", doc_type)
        .withColumn("parent", parent)
        .withColumn("version", version)
        .withColumn("error", _first_error(*errs))
    )
    if content_col is not None:
        src = (
            F.col(f"new_image.{content_col}")
            if is_cdc_frame(df) and _resolve_type(df.schema, f"new_image.{content_col}")
            else (F.col(content_col) if _resolve_type(df.schema, content_col) else None)
        )
        if src is not None:
            # north-rule per-row invariant: sha256 at ingest, re-checked at
            # index read-back (plans/build.py)
            out = out.withColumn("content_sha256", F.sha2(src, 256))
    return out


def pick_document_fields(df: DataFrame, cfg: IndexerConfig) -> DataFrame:
    """Projection of the document payload (lib/handler.js:48-50).

    Keeps mapping/meta columns; restricts payload columns to ``pick_fields``
    (dot-notation supported — nested paths become flattened columns named by
    their path, matching the reference's lodash/pick-into-nested behavior in
    spirit while staying columnar). Default: whole document.
    """
    if cfg.pick_fields is None:
        return df
    picks = cfg.pick_fields if isinstance(cfg.pick_fields, list) else [cfg.pick_fields]
    meta = [c for c in ("doc_id", "index_name", "doc_type", "parent", "version",
                        "error", "content_sha256", "event_name") if c in df.columns]
    cols = [F.col(c) for c in meta]
    for p in picks:
        if is_cdc_frame(df):
            src = f"new_image.{p}"
            if _resolve_type(df.schema, src) is None:
                continue  # lodash/pick skips absent paths silently
            cols.append(F.col(src).alias(p.replace(".", "_")))
        else:
            if _resolve_type(df.schema, p) is None:
                continue
            cols.append(F.col(p).alias(p.replace(".", "_")))
    return df.select(*cols)
