"""Stateful streaming funnel: stage latches must carry across
micro-batches, and the per-batch three-pass latching must reproduce the
batch chained-MIN ``>=`` semantics — including a click that shares the
first view's exact timestamp but precedes it in event-id order."""

from __future__ import annotations

import json
import os

import pytest

from us_flight_bigdata_dashboard_spark.streaming.events import (
    read_event_stream,
    streaming_funnel,
)

US = 1_000_000

# batch 0: user 1 — click@10:00:00 (event 1) BEFORE view@10:00:00 (event 2)
# by id order, same timestamp: under chained-MIN >= semantics the click
# QUALIFIES as "at-or-after the first view". Also a decoy purchase before
# any click-latch (must not latch).
B0 = [
    (1, "2026-01-01 10:00:00", 1, "click"),
    (2, "2026-01-01 10:00:00", 1, "view"),
    (3, "2026-01-01 10:00:01", 1, "purchase"),
]
# batch 1 (later mtime, later event time): nothing for stage 2 (click is
# already latched from batch 0); purchase latches here — proving the click
# latch survived the batch boundary.
B1 = [
    (4, "2026-01-01 11:00:00", 1, "purchase"),
    (5, "2026-01-01 11:00:00", 2, "view"),
]


@pytest.fixture(scope="module")
def funnel_stream_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("funnel_stream")
    for i, (fname, rows) in enumerate([("b0.json", B0), ("b1.json", B1)]):
        path = os.path.join(root, fname)
        with open(path, "w") as f:
            for eid, ts, uid, etype in rows:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": ts,
                            "user_id": uid,
                            "event_type": etype,
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )
        os.utime(path, (1_000_000_000 + i, 1_000_000_000 + i))
    return str(root)


def test_funnel_equal_ts_click_and_cross_batch_latch(spark, funnel_stream_dir, tmp_path):
    stream = read_event_stream(spark, funnel_stream_dir)
    q = (
        streaming_funnel(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    import datetime

    def us(ts):
        return int(
            datetime.datetime.fromisoformat(ts).replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
        ) * US

    final = {}
    for r in spark.table("funnel_test").collect():
        cur = final.get(r["user_id"], (-1, -1, -1))
        final[r["user_id"]] = tuple(
            max(a, b) for a, b in zip(cur, (r["view_us"], r["click_us"], r["purchase_us"]))
        )
    t0 = us("2026-01-01 10:00:00")
    # user 1: view@t0; the SAME-ts click (earlier event id) qualifies via
    # >= ; the 10:00:01 purchase is AFTER the click-latch so it latches in
    # batch 0 already — and batch 1's purchase must NOT overwrite it.
    assert final[1] == (t0, t0, t0 + 1 * US)
    # user 2: view only, no click/purchase.
    assert final[2][0] == us("2026-01-01 11:00:00")
    assert final[2][1] == -1 and final[2][2] == -1
