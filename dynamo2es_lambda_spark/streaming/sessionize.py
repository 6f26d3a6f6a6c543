"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin (plans/entry_queries.q_events_sessions) resolves sessions
with a lag-window over the complete history; a stream cannot see the
future, so sessions live in GROUP STATE keyed by user: events extend the
open session, a gap > ``gap_sec`` closes it (emitted immediately), and an
event-time timeout closes the trailing session once the WATERMARK passes
``last_event + gap`` — the standard watermark-bounded session pattern.
State per key is three longs; memory is O(active users), not O(events).

The reference itself is a stream consumer (DynamoDB Streams micro-batches,
/root/reference/lib/handler.js:29); this operator extends the engine's
streaming surface beyond CDC apply (streaming/apply_cdc.py) with the
custom-stateful capability named in SURVEY.md §2.3.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

SESSION_SCHEMA = (
    "user_id long, session_start timestamp_ntz, "
    "session_end timestamp_ntz, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"  # epoch micros + count
_OUT_COLS = ["user_id", "session_start", "session_end", "n_events"]


def _emit(key, start: int, last: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([int(key)], dtype="int64"),
            "session_start": pd.to_datetime([start], unit="us"),
            "session_end": pd.to_datetime([last], unit="us"),
            "n_events": pd.Series([int(n)], dtype="int64"),
        }
    )


def _session_fn(gap_sec: int):
    gap_us = int(gap_sec) * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _emit(uid, start, last, n)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        col = rows["ts"]
        if getattr(col.dtype, "tz", None) is not None:
            col = col.dt.tz_convert("UTC").dt.tz_localize(None)
        ts = (
            col
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
            .to_numpy()
        )
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        outs = []
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
                continue
            if t <= last:
                # a LATE (within-watermark) event from a previous batch.
                # It joins the open session ONLY when it chains to it
                # (within gap of the session start) — never move `last`
                # backwards (that would fabricate a gap and split the
                # session). An admitted event older than start − gap
                # belongs to an already-closed time range: emit it as its
                # own session immediately (bounded-lateness approximation;
                # with the default watermark == gap this branch is rare).
                if t >= start - gap_us:
                    start, n = min(start, t), n + 1
                else:
                    outs.append(_emit(uid, t, t, 1))
                continue
            if t - last > gap_us:
                outs.append(_emit(uid, start, last, n))
                start, n = t, 0
            last, n = t, n + 1
        state.update((int(start), int(last), int(n)))
        # close the open session when the watermark passes last + gap
        state.setTimeoutTimestamp(last // 1000 + int(gap_sec) * 1000)
        for o in outs:
            yield o

    return fn


def sessionize_stream(events, gap_sec: int = 1800, watermark: str | None = None):
    """events: a STREAMING DataFrame with (user_id, ts[, ...]) →
    append-mode stream of closed sessions
    (user_id, session_start, session_end, n_events).

    ``watermark`` defaults to ``"<gap_sec> seconds"`` — late events beyond
    it are dropped by the engine; the timeout that closes trailing sessions
    fires once the watermark passes ``last_event + gap``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    wm = watermark or f"{int(gap_sec)} seconds"
    # watermarks require TIMESTAMP (not NTZ): interpret NTZ event times in
    # the session timezone (UTC everywhere in this engine's harnesses)
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", wm)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_sec),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_session_stream(
    spark,
    source_path: str,
    checkpoint_dir: str,
    schema: str,
    gap_sec: int = 1800,
    query_name: str = "sessions",
    max_files_per_trigger: int | None = None,
    sink_path: str | None = None,
):
    """File-source wrapper: readStream(parquet) → sessionize_stream →
    append sink. ``sink_path=None`` uses the in-memory sink (single-run
    smoke/test mode — the memory sink cannot recover a checkpoint);
    a path writes parquet, the restartable production shape. Returns the
    StreamingQuery."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(source_path)
    sessions = sessionize_stream(events, gap_sec=gap_sec)
    writer = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if sink_path is None:
        return writer.format("memory").queryName(query_name).start()
    return writer.format("parquet").option("path", sink_path).start()
