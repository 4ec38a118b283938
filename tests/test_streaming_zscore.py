"""Stateful streaming z-score anomaly counter: integer moments must carry
across micro-batches, the 3σ test must be causal (prior events only), and
a crafted spike must be flagged exactly once."""

from __future__ import annotations

import json
import math
import os

import pytest

from us_flight_bigdata_dashboard_spark.streaming.events import (
    ZSCORE_FP,
    ZSCORE_MIN_N,
    read_event_stream,
    streaming_zscore,
)

# batch 0: ZSCORE_MIN_N steady values (no prior stats → never flagged);
# batch 1: one more steady value (within 3σ) then a huge spike (flagged).
STEADY = [10.0 + 0.01 * i for i in range(ZSCORE_MIN_N)]
B1_VALS = [10.05, 500.0]


def _replica(vals):
    n = s = ss = anom = 0
    for v in vals:
        x = math.floor(v * ZSCORE_FP)
        if n >= ZSCORE_MIN_N:
            if (n * x - s) ** 2 > 9 * (n * ss - s * s):
                anom += 1
        n += 1
        s += x
        ss += x * x
    return n, anom


@pytest.fixture(scope="module")
def zscore_stream_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("zscore_stream")
    batches = [
        ("b0.json", [(i, f"2026-01-01 10:{i:02d}:00", 1, v) for i, v in enumerate(STEADY)]),
        (
            "b1.json",
            [
                (100 + i, f"2026-01-01 11:{i:02d}:00", 1, v)
                for i, v in enumerate(B1_VALS)
            ],
        ),
    ]
    for i, (fname, rows) in enumerate(batches):
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


def test_zscore_state_carries_and_flags_spike(spark, zscore_stream_dir, tmp_path):
    stream = read_event_stream(spark, zscore_stream_dir)
    q = (
        streaming_zscore(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("zscore_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (r["n_events"], r["n_anomalies"]) for r in spark.table("zscore_test").collect()
    )
    assert rows == [
        _replica(STEADY),
        _replica(STEADY + B1_VALS),
    ]
    # the steady prefix flags nothing; the spike is exactly one anomaly
    assert _replica(STEADY) == (ZSCORE_MIN_N, 0)
    assert _replica(STEADY + B1_VALS)[1] == 1
