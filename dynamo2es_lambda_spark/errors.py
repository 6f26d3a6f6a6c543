"""Error types mirroring the reference's error surface.

Reference: /root/reference/lib/errors/{ValidationError,FieldNotFoundError,
UnknownEventNameError}.js — same names, same message shapes, so a user of the
reference sees familiar failures.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors."""


class ValidationError(EngineError):
    """Configuration or event validation failed.

    Mirrors lib/errors/ValidationError.js:1-9 — carries the full list of
    collected constraint violations (joi ``abortEarly: false`` semantics,
    lib/utils.js:12).
    """

    def __init__(self, details: list[str], message: str | None = None) -> None:
        self.details = list(details)
        super().__init__(message or ". ".join(self.details))


class FieldNotFoundError(EngineError):
    """A configured field path resolved to nothing in Keys/NewImage/OldImage.

    Mirrors lib/errors/FieldNotFoundError.js:1-9 (message format preserved).
    """

    def __init__(self, path: str, record: object | None = None) -> None:
        self.path = path
        self.details = record
        super().__init__(f'"{path}" field not found in record')


class UnknownEventNameError(EngineError):
    """Event name outside {INSERT, MODIFY, REMOVE}.

    Mirrors lib/errors/UnknownEventNameError.js:1-9 (message format preserved).
    """

    def __init__(self, event_name: str, record: object | None = None) -> None:
        self.event_name = event_name
        self.details = record
        super().__init__(f'"{event_name}" is an unknown event name')
