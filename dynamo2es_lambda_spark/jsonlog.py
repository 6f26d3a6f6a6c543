"""Structured JSON logging — the engine's bunyan-middleware analog.

The reference attaches ``alpha-lambda-bunyan`` to its handler chain
(/root/reference/lib/handler.js:28): every invocation gets a child logger
with request context and emits newline-delimited JSON records. The engine's
analog is the stdlib-idiomatic version of the same contract:

- the package logger (``dynamo2es_lambda_spark``) carries a NullHandler, so
  the build/CDC pipelines emit structured events unconditionally at zero
  cost until a handler is attached (the "middleware optional" property);
- :func:`json_logger` attaches the bunyan-shaped JSON formatter — one JSON
  object per line with ``time``/``level``/``name``/``event`` plus the
  event's fields — and returns the logger;
- :func:`log_event` is what the pipelines call: ``log_event(LOG,
  "build.batch", batch="b0", docs=1000, ...)``.

Event stream per build run (the per-invocation context bunyan would carry):
``build.start`` → ``build.batch``×N → ``build.done`` | ``build.error``;
CDC: ``cdc.apply`` / ``cdc.compact``.
"""

from __future__ import annotations

import datetime
import json
import logging
import sys

LOGGER_NAME = "dynamo2es_lambda_spark"

LOG = logging.getLogger(LOGGER_NAME)
LOG.addHandler(logging.NullHandler())


class JsonFormatter(logging.Formatter):
    """One JSON object per record: time (UTC ISO-8601), level, name, event,
    plus every field passed through ``log_event`` (bunyan record shape)."""

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "time": datetime.datetime.fromtimestamp(
                record.created, tz=datetime.timezone.utc
            ).isoformat(timespec="milliseconds"),
            "level": record.levelname.lower(),
            "name": record.name,
            "event": record.getMessage(),
        }
        out.update(getattr(record, "fields", {}))
        return json.dumps(out, default=str)


def json_logger(
    stream=None, level: int = logging.INFO
) -> logging.Logger:
    """Attach the JSON handler to the package logger (idempotent per
    stream) and return it — the engine's ``.use(bunyan())``."""
    stream = stream or sys.stderr
    for h in LOG.handlers:
        if getattr(h, "_d2es_json", False) and getattr(h, "stream", None) is stream:
            LOG.setLevel(level)
            return LOG
    handler = logging.StreamHandler(stream)
    handler.setFormatter(JsonFormatter())
    handler._d2es_json = True
    LOG.addHandler(handler)
    LOG.setLevel(level)
    return LOG


def log_event(
    logger: logging.Logger, event: str, level: int = logging.INFO, **fields
) -> None:
    """Emit one structured event. Fields must be JSON-serializable (or are
    stringified). No-op cost when no handler/level is active."""
    if logger.isEnabledFor(level):
        logger.log(level, event, extra={"fields": fields})
