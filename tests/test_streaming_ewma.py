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


def test_order_free_aggregate_invariant_to_batch_order(spark, tmp_path):
    """The replay contract's first clause: for order-insensitive operators
    (windowed counts + decimal sums) the result is a pure function of the
    row SET — replaying the same files in REVERSED micro-batch order must
    produce the identical aggregate."""
    import json as json_mod

    from us_flight_bigdata_dashboard_spark.streaming.events import (
        read_event_stream,
        tumbling_counts,
    )

    rows_a = [(1, "2026-01-01 10:00:00", 1, 4.25), (2, "2026-01-01 10:30:00", 2, 1.5)]
    rows_b = [(3, "2026-01-01 10:45:00", 1, 2.75), (4, "2026-01-01 11:10:00", 3, 8.0)]

    def stage(order_name, first, second):
        root = tmp_path / order_name
        root.mkdir()
        for i, (fname, rows) in enumerate([("b0.json", first), ("b1.json", second)]):
            p = root / fname
            with open(p, "w") as f:
                for eid, ts, uid, v in rows:
                    f.write(
                        json_mod.dumps(
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
            os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))
        return str(root)

    results = []
    for name, first, second in [
        ("fwd", rows_a, rows_b),
        ("rev", rows_b, rows_a),
    ]:
        src = stage(name, first, second)
        q = (
            tumbling_counts(
                read_event_stream(spark, src), watermark="3650 days"
            )
            .drop("approx_users")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(f"ooo_{name}")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        results.append(sorted(tuple(r) for r in spark.table(f"ooo_{name}").collect()))
    assert results[0] == results[1]
    assert len(results[0]) > 0
