"""DynamoDB AttributeValue (typed JSON) unmarshalling — SURVEY.md §2.1 #5.

The reference decodes stream images with ``DynamoDB.Converter.unmarshall``
(/root/reference/lib/handler.js:42-46): typed wire JSON like
``{"S": "x"} | {"N": "1.5"} | {"BOOL": true} | {"NULL": true} |
{"L": [...]} | {"M": {...}} | {"SS"/"NS"/"BS": [...]}`` becomes plain
values. The engine implements the same converter:

- :func:`unmarshall_value` / :func:`marshall_value` — pure-Python converter
  pair (the test fixture builder mirrors the reference's
  test/utils/ddb-stream-event-formatter.js, which marshals plain objects
  through the real converter);
- :func:`decode_stream_events` — DataFrame op turning raw DynamoDB Stream
  record JSON strings into the engine's typed CDC event frame
  (event_name, keys, new_image, old_image), ready for plans/cdc.apply_changes.

The decode runs per Arrow batch inside ``mapInPandas``. This is the
event-plane (CDC batches — orders of magnitude smaller than the corpus hot
path); recursion over arbitrarily-nested M/L values cannot be expressed as
a static Column tree, which is exactly why the reference delegates to a
converter library too.
"""

from __future__ import annotations

import base64
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..errors import EngineError


def unmarshall_value(av: dict):
    """One typed AttributeValue → plain Python value."""
    if not isinstance(av, dict) or len(av) != 1:
        raise EngineError(f"not an AttributeValue: {av!r}")
    (kind, v), = av.items()
    if kind == "S":
        return v
    if kind == "N":
        f = float(v)
        return int(f) if f.is_integer() else f
    if kind == "BOOL":
        return bool(v)
    if kind == "NULL":
        return None
    if kind == "B":
        return base64.b64decode(v)
    if kind == "M":
        return {k: unmarshall_value(x) for k, x in v.items()}
    if kind == "L":
        return [unmarshall_value(x) for x in v]
    if kind == "SS":
        return list(v)
    if kind == "NS":
        return [unmarshall_value({"N": x}) for x in v]
    if kind == "BS":
        return [base64.b64decode(x) for x in v]
    raise EngineError(f"unknown AttributeValue type: {kind}")


def unmarshall_image(image: dict | None) -> dict | None:
    """A DynamoDB image ({attr: AttributeValue, ...}) → plain dict."""
    if image is None:
        return None
    return {k: unmarshall_value(v) for k, v in image.items()}


def marshall_value(v) -> dict:
    """Plain value → typed AttributeValue (the test-fixture direction)."""
    if v is None:
        return {"NULL": True}
    if isinstance(v, bool):
        return {"BOOL": v}
    if isinstance(v, (int, float)):
        return {"N": repr(v)}
    if isinstance(v, str):
        return {"S": v}
    if isinstance(v, bytes):
        return {"B": base64.b64encode(v).decode()}
    if isinstance(v, dict):
        return {"M": {k: marshall_value(x) for k, x in v.items()}}
    if isinstance(v, (list, tuple)):
        return {"L": [marshall_value(x) for x in v]}
    raise EngineError(f"cannot marshall {type(v).__name__}")


def marshall_image(d: dict | None) -> dict | None:
    if d is None:
        return None
    return {k: marshall_value(v) for k, v in d.items()}


def format_stream_record(event_name: str, keys: dict,
                         new_image: dict | None = None,
                         old_image: dict | None = None) -> str:
    """Build one raw stream-record JSON string (NEW_AND_OLD_IMAGES view) —
    the engine's analog of the reference's ddb-stream-event-formatter."""
    dyn: dict = {"Keys": marshall_image(keys)}
    if new_image is not None:
        dyn["NewImage"] = marshall_image(new_image)
    if old_image is not None:
        dyn["OldImage"] = marshall_image(old_image)
    return json.dumps({"eventName": event_name, "dynamodb": dyn})


def decode_stream_events(
    df: DataFrame,
    event_schema: str,
    json_col: str = "record_json",
) -> DataFrame:
    """Raw DynamoDB Stream record JSON → the engine's typed event frame.

    ``event_schema`` is the target schema string, e.g. streaming/apply_cdc's
    EVENT_SCHEMA: ``event_name string, keys struct<...>,
    new_image struct<...>, old_image struct<...>``. Missing record fields
    (e.g. no OldImage on INSERT) become nulls; unknown attributes are
    dropped by the struct cast (the reference validates with
    allowUnknown=true — extra keys tolerated, lib/handler.js:36).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"event_name": [], "keys": [],
                   "new_image": [], "old_image": []}
            for raw in pdf[json_col]:
                rec = json.loads(raw)
                dyn = rec.get("dynamodb") or {}
                out["event_name"].append(rec.get("eventName"))
                out["keys"].append(unmarshall_image(dyn.get("Keys")))
                out["new_image"].append(unmarshall_image(dyn.get("NewImage")))
                out["old_image"].append(unmarshall_image(dyn.get("OldImage")))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=event_schema)
