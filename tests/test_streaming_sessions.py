"""Stateful-operator test: applyInPandasWithState sessionization — state
must survive across micro-batches (a session opened in batch 0 closes in
batch 1 when the gap is exceeded)."""

from __future__ import annotations

import json
import os

import pytest

from us_flight_bigdata_dashboard_spark.streaming.events import read_event_stream
from us_flight_bigdata_dashboard_spark.streaming.sessions import streaming_sessionize

B0 = [  # user 1: two events 10 min apart (one open session); user 2: one event
    (1, "2026-01-01 10:00:00", 1, "click", 1.0),
    (2, "2026-01-01 10:10:00", 1, "view", 1.0),
    (3, "2026-01-01 10:05:00", 2, "click", 1.0),
]
B1 = [  # user 1 returns after 110 min (> 30-min gap) → batch-0 session closes
    (4, "2026-01-01 12:00:00", 1, "click", 1.0),
    # user 2 stays within gap → still open, nothing emitted
    (5, "2026-01-01 10:20:00", 2, "view", 1.0),
]


@pytest.fixture(scope="module")
def session_stream_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("session_stream")
    for i, (fname, rows) in enumerate([("b0.json", B0), ("b1.json", B1)]):
        path = os.path.join(root, fname)
        with open(path, "w") as f:
            for eid, ts, uid, et, v in rows:
                f.write(
                    json.dumps(
                        {"event_id": eid, "ts": ts, "user_id": uid, "event_type": et, "value": v, "props": "{}"}
                    )
                    + "\n"
                )
        # the file source orders micro-batches by MODIFICATION TIME, not
        # name — pin distinct mtimes so batch order is deterministic
        os.utime(path, (1000000 + i * 100, 1000000 + i * 100))
    return str(root)


def test_state_survives_micro_batches(spark, session_stream_dir, tmp_path):
    stream = read_event_stream(spark, session_stream_dir)
    q = (
        streaming_sessionize(stream, gap_seconds=1800)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = [tuple(r) for r in spark.table("sessions_test").collect()]
    # exactly ONE closed session: user 1's batch-0 session (2 events,
    # 10:00→10:10), closed by the 12:00 event arriving in batch 1
    assert rows == [(1, 1767261600, 1767262200, 2)]


# --- EventTimeTimeout live twin -------------------------------------------

LB0 = [  # user 1: session 10:00→10:10 (2 events)
    (1, "2026-01-01 10:00:00", 1, "click", 1.0),
    (2, "2026-01-01 10:10:00", 1, "view", 1.0),
]
LB1 = [  # user 9 far in the future: advances the watermark past 10:40
    (3, "2026-01-01 13:00:00", 9, "click", 1.0),
]
LB2 = [  # a further batch so the advanced watermark is APPLIED: user 1's
    # timeout (10:40) fires while processing this batch
    (4, "2026-01-01 13:05:00", 9, "view", 1.0),
]


@pytest.fixture(scope="module")
def live_session_stream_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("live_session_stream")
    for i, (fname, rows) in enumerate(
        [("b0.json", LB0), ("b1.json", LB1), ("b2.json", LB2)]
    ):
        path = os.path.join(root, fname)
        with open(path, "w") as f:
            for eid, ts, uid, et, v in rows:
                f.write(
                    json.dumps(
                        {"event_id": eid, "ts": ts, "user_id": uid, "event_type": et, "value": v, "props": "{}"}
                    )
                    + "\n"
                )
        os.utime(path, (2000000 + i * 100, 2000000 + i * 100))
    return str(root)


def test_event_time_timeout_flushes_final_session(spark, live_session_stream_dir, tmp_path):
    """The NoTimeout twin would keep user 1's session open forever; the
    live sessionizer must EMIT it once the watermark (driven by user 9's
    later events, 10-minute delay) passes session_end + gap = 10:40."""
    from us_flight_bigdata_dashboard_spark.streaming.sessions import (
        streaming_sessionize_live,
    )

    stream = read_event_stream(spark, live_session_stream_dir)
    q = (
        streaming_sessionize_live(stream, gap_seconds=1800, watermark="10 minutes")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("live_sessions_test")
        .option("checkpointLocation", str(tmp_path / "ckpt_live"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(tuple(r) for r in spark.table("live_sessions_test").collect())
    # user 1's final session flushed BY TIMEOUT (no closing event ever
    # arrived for user 1); user 9's session is still open (watermark
    # 12:55 < 13:05 + gap) and must NOT appear
    assert rows == [(1, 1767261600, 1767262200, 2)]
