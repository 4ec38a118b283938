"""Ground-truth tests for the round-11 additions: a pandas recomputation
of the real-horizon stream-stream interval join (drop/absorb semantics on
BOTH join sides, including cross-batch state-survival straddle pairs), plus brute forces for the round-11 operator wave — on
sf0.001 where exhaustive recomputation is cheap."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _df(table: str):
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM '{SF_DIR}/{table}.parquet'").df()


# ---------------------------------------------------------------------------
# streaming_interval_join_late_replay — drop/absorb semantics on a
# stream-stream join under the real watermark horizon
# ---------------------------------------------------------------------------


def test_interval_join_late_replay_semantics(spark):
    from us_flight_bigdata_dashboard_spark.streaming.replay import (
        _IJL_ANCIENT_H,
        _IJL_LATE_H,
        _IJL_LOOKBACK_H,
        q_streaming_interval_join_late_replay,
    )

    rows = q_streaming_interval_join_late_replay(spark, SF_DIR).collect()
    got = {(r["click_event_id"], r["view_event_id"]) for r in rows}
    assert len(got) == len(rows)  # inner join emits each pair exactly once

    ev = _df("events").dropna(subset=["ts"])
    tmin = ev["ts"].min()
    gm = ev["ts"].max()
    cutoff = tmin + np.timedelta64(_IJL_ANCIENT_H, "h")
    kept = ev[~((ev["ts"] < cutoff) & (ev["event_id"] % 2 == 0))]
    clicks = kept[kept["event_type"] == "click"]
    views = kept[kept["event_type"] == "view"]
    expect = set()
    for _, c in clicks.iterrows():
        lo = c["ts"] - np.timedelta64(_IJL_LOOKBACK_H, "h")
        m = views[
            (views["user_id"] == c["user_id"])
            & (views["ts"] <= c["ts"])
            & (views["ts"] >= lo)
        ]
        for vid in m["event_id"]:
            expect.add((c["event_id"], vid))
    # (1) the emitted set IS the kept-x-kept batch interval join
    assert got == expect
    # (2) drop evidence: no pair touches the beyond-horizon slice
    dropped = set(
        ev.loc[(ev["ts"] < cutoff) & (ev["event_id"] % 2 == 0), "event_id"]
    )
    assert all(c not in dropped and v not in dropped for c, v in got)
    # (3) absorb evidence: pairs involving the late-but-inside slice
    # (last _LATE_RECENT_H hours, delivered after everything else) exist —
    # their partners' join state survived to meet them
    recent_cut = gm - np.timedelta64(_IJL_LATE_H, "h")
    recent_ids = set(ev.loc[ev["ts"] >= recent_cut, "event_id"])
    assert any(c in recent_ids or v in recent_ids for c, v in got)
    # (3b) the strongest form: STRADDLING pairs — a late-delivered click
    # matched an on-time view from an earlier micro-batch, so that view's
    # join state provably survived until the late batch arrived
    assert any(c in recent_ids and v not in recent_ids for c, v in got)
