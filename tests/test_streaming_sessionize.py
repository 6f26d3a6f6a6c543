"""Stateful streaming sessionization (applyInPandasWithState) — gap-split
sessions emit in-stream; watermark-driven event-time timeouts close
trailing sessions; results must agree with the batch lag-window twin
(SURVEY.md §2.3: the reference is itself a stream consumer,
/root/reference/lib/handler.js:29).
"""

import os

import pandas as pd
import pytest

from dynamo2es_lambda_spark.streaming import sessionize

GAP = 60  # seconds
SCHEMA = "event_id long, user_id long, ts timestamp_ntz"


def _write(spark, path, rows, name):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(path, name),
    )


def test_streaming_sessions_match_batch_semantics(spark, tmp_path):
    src = str(tmp_path / "events")
    ck = str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    t0 = "2026-01-01 10:00:"
    # user 1: two sessions separated by a > GAP gap, all inside file 1 —
    # the first session closes IN-STREAM (no timeout needed)
    _write(spark, src, [
        (1, 1, t0 + "00"),
        (2, 1, t0 + "30"),
        (3, 1, "2026-01-01 10:05:00"),   # 4.5 min gap -> new session
        (4, 2, t0 + "10"),
    ], "f1.parquet")
    # files 2/3: far-future events advance the WATERMARK so the trailing
    # open sessions of user 1 and 2 time out and emit
    _write(spark, src, [(5, 9, "2026-01-01 11:00:00")], "f2.parquet")
    _write(spark, src, [(6, 9, "2026-01-01 12:00:00")], "f3.parquet")

    q = sessionize.start_session_stream(
        spark, src, ck, SCHEMA, gap_sec=GAP,
        query_name="t_sessions", max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got = spark.table("t_sessions").toPandas()

    u1 = got[got.user_id == 1].sort_values("session_start")
    assert len(u1) == 2, got.to_string()
    s1, s2 = u1.iloc[0], u1.iloc[1]
    assert s1["n_events"] == 2
    assert str(s1["session_start"]).startswith("2026-01-01 10:00:00")
    assert str(s1["session_end"]).startswith("2026-01-01 10:00:30")
    assert s2["n_events"] == 1
    assert str(s2["session_start"]).startswith("2026-01-01 10:05:00")

    u2 = got[got.user_id == 2]
    assert len(u2) == 1 and u2.iloc[0]["n_events"] == 1


def test_late_event_cannot_rewind_session(spark, tmp_path):
    """A late (within-watermark) event from a later micro-batch must join
    the open session without moving `last` backwards — regression: the
    rewound `last` fabricated a gap and split the session."""
    src = str(tmp_path / "events3")
    ck = str(tmp_path / "ck3")
    os.makedirs(src, exist_ok=True)
    _write(spark, src, [
        (1, 7, "2026-01-01 10:00:00"),
        (2, 7, "2026-01-01 10:00:40"),
    ], "f1.parquet")
    # late event 20 s before the session's last (watermark = 40s - 60s gap
    # still admits it), then a close-by follow-up, then far-future flush
    _write(spark, src, [(3, 7, "2026-01-01 10:00:20")], "f2.parquet")
    _write(spark, src, [(4, 7, "2026-01-01 10:01:30")], "f3.parquet")
    _write(spark, src, [(5, 9, "2026-01-01 12:00:00")], "f4.parquet")
    q = sessionize.start_session_stream(
        spark, src, ck, SCHEMA, gap_sec=GAP, query_name="t_sessions3",
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got = spark.table("t_sessions3").toPandas()
    u7 = got[got.user_id == 7]
    assert len(u7) == 1, got.to_string()
    row = u7.iloc[0]
    assert row["n_events"] == 4
    assert str(row["session_start"]).startswith("2026-01-01 10:00:00")
    assert str(row["session_end"]).startswith("2026-01-01 10:01:30")


def test_streaming_restart_resumes_state(spark, tmp_path):
    """State (the open session) survives a query restart through the
    checkpoint: events for the same session split across two RUNS must
    still produce ONE session."""
    src = str(tmp_path / "events2")
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out2")
    os.makedirs(src, exist_ok=True)
    _write(spark, src, [(1, 7, "2026-01-01 10:00:00")], "f1.parquet")
    q = sessionize.start_session_stream(
        spark, src, ck, SCHEMA, gap_sec=GAP, sink_path=out,
    )
    q.awaitTermination(120)
    # second run: an event 30 s later EXTENDS the open session; then a
    # far-future event times it out
    _write(spark, src, [(2, 7, "2026-01-01 10:00:30")], "f2.parquet")
    _write(spark, src, [(3, 9, "2026-01-01 12:00:00")], "f3.parquet")
    q = sessionize.start_session_stream(
        spark, src, ck, SCHEMA, gap_sec=GAP, sink_path=out,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    u7 = got[got.user_id == 7]
    assert len(u7) == 1, got.to_string()
    assert u7.iloc[0]["n_events"] == 2
    assert str(u7.iloc[0]["session_end"]).startswith("2026-01-01 10:00:30")


def test_very_old_late_event_becomes_own_session(spark, tmp_path):
    """With a watermark wider than the gap, an admitted late event older
    than the open session's reach must NOT merge across the silence — it
    emits as its own session (bounded-lateness approximation)."""
    src = str(tmp_path / "events4")
    ck = str(tmp_path / "ck4")
    os.makedirs(src, exist_ok=True)
    _write(spark, src, [(1, 7, "2026-01-01 10:10:00")], "f1.parquet")
    # 10 minutes earlier — admitted by the 20-min watermark, far beyond
    # the 60 s gap from the open session's start
    _write(spark, src, [(2, 7, "2026-01-01 10:00:00")], "f2.parquet")
    _write(spark, src, [(3, 9, "2026-01-01 12:00:00")], "f3.parquet")
    from dynamo2es_lambda_spark.streaming.sessionize import sessionize_stream

    events = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(events, gap_sec=GAP, watermark="20 minutes")
        .writeStream.format("memory")
        .queryName("t_sessions4")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_sessions4").toPandas()
    u7 = got[got.user_id == 7].sort_values("session_start")
    assert len(u7) == 2, got.to_string()
    assert u7.iloc[0]["n_events"] == 1
    assert str(u7.iloc[0]["session_start"]).startswith("2026-01-01 10:00:00")
    assert str(u7.iloc[1]["session_start"]).startswith("2026-01-01 10:10:00")
