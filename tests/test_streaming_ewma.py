"""Stateful streaming EWMA: the (value, count) state must carry across
micro-batches and the final value must equal the sequential IEEE fold."""

from __future__ import annotations

import json
import os

import pytest

from us_flight_bigdata_dashboard_spark.streaming.events import (
    read_event_stream,
    streaming_ewma,
)

# batch 0: user 1 gets 2 values; batch 1 (later mtime): 2 more — the fold
# must continue from batch-0 state, in event-time order
E0 = [
    (1, "2026-01-01 10:00:00", 1, 4.0),
    (2, "2026-01-01 10:05:00", 1, 8.0),
]
E1 = [
    (3, "2026-01-01 11:00:00", 1, 2.0),
    (4, "2026-01-01 11:05:00", 1, 10.0),
]
ALPHA = 0.25


def _seq(vals):
    v = None
    for x in vals:
        v = x if v is None else v + ALPHA * (x - v)
    return v


@pytest.fixture(scope="module")
def ewma_stream_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ewma_stream")
    for i, (fname, rows) in enumerate([("b0.json", E0), ("b1.json", E1)]):
        path = os.path.join(root, fname)
        with open(path, "w") as f:
            for eid, ts, uid, v in rows:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": ts,
                            "user_id": uid,
                            "event_type": "view",
                            "value": v,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )
        os.utime(path, (1_000_000_000 + i, 1_000_000_000 + i))
    return str(root)


def test_ewma_state_carries_across_batches(spark, ewma_stream_dir, tmp_path):
    stream = read_event_stream(spark, ewma_stream_dir)
    q = (
        streaming_ewma(stream, alpha=ALPHA)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (r["n_events"], r["ewma"]) for r in spark.table("ewma_test").collect()
    )
    # one update row per batch; the second continues from the first's state
    assert rows == [
        (2, _seq([4.0, 8.0])),
        (4, _seq([4.0, 8.0, 2.0, 10.0])),
    ]
