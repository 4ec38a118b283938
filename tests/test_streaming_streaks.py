"""Crafted tests for the per-user streak processor (streaming/streaks.py).

The exact gate proves the replay against the gaps-and-islands oracle;
these isolate what it can't: cross-batch streak continuity through the
state store, the pure fold logic on adversarial sequences, and the v1/v2
API gating. Since round 8 the protobuf compatibility shim
(streaming/protobuf_compat.py) supplies the v2 runtime in this sandbox,
so the v2-vs-v1 equivalence test runs LIVE here (transformWithState over
RocksDB through the shimmed state-server channel)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.streaming.streaks import (
    STREAK_OUTPUT_SCHEMA,
    has_state_v2,
    make_streak_worker,
    streaming_streaks,
)


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _fold(seqs, state=None):
    """Drive the v1 worker directly: seqs = list of batches, each a list
    of (ts, event_id, event_type)."""
    fold = make_streak_worker()
    state = state or _FakeState()
    out = None
    for batch in seqs:
        pdf = pd.DataFrame(batch, columns=["ts", "event_id", "event_type"])
        res = list(fold((7,), iter([pdf]), state))
        if res:
            out = res[0]
    return state._v, out


def test_fold_basic_streaks():
    st, out = _fold([[(1, 1, "a"), (2, 2, "a"), (3, 3, "b"), (4, 4, "a"), (5, 5, "a"), (6, 6, "a")]])
    last_type, cur, best, n = st
    assert (last_type, cur, best, n) == ("a", 3, 3, 6)
    assert int(out.best_streak[0]) == 3 and int(out.cur_streak[0]) == 3


def test_fold_streak_spans_batches():
    """A run split across micro-batches must be ONE streak — the whole
    point of the carried state."""
    st, _ = _fold([[(1, 1, "a"), (2, 2, "a")], [(3, 3, "a"), (4, 4, "b")]])
    last_type, cur, best, n = st
    assert best == 3 and cur == 1 and last_type == "b" and n == 4


def test_fold_sorts_within_batch():
    """Rows arrive unsorted within a batch; the fold must order by
    (ts, event_id) before folding — including the equal-ts tiebreak."""
    st, _ = _fold([[(3, 30, "b"), (1, 10, "a"), (2, 20, "a"), (3, 29, "a")]])
    last_type, cur, best, n = st
    # order: a(1), a(2), a(3,29), b(3,30) → best streak 3
    assert best == 3 and last_type == "b"


def test_fold_single_type_all_the_way():
    st, _ = _fold([[(i, i, "x") for i in range(10)]])
    assert st[1] == 10 and st[2] == 10


def test_replay_streak_joined_across_real_microbatches(spark):
    """End-to-end through a real 2-file availableNow replay: a streak
    straddling the file boundary is joined by the state store."""
    rows = [
        (1, 100 + i, 7, "view", float(i), None) for i in range(3)
    ] + [
        (1, 200 + i, 7, "view" if i < 2 else "click", float(i), None)
        for i in range(3)
    ]
    src = tempfile.mkdtemp(prefix="streaks_test_")
    try:
        df = spark.createDataFrame(
            [(int(ts * 1_000_000), eid, uid, et, v, p) for ts, eid, uid, et, v, p in [
                (10 + i, r[1], r[2], r[3], r[4], r[5])
                for i, r in enumerate(rows)
            ]],
            "ts_us long, event_id long, user_id long, event_type string, value double, props string",
        ).select(
            F.col("event_id"),
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        # two files in ts order with pinned mtimes → two ordered batches
        df.filter("event_id < 200").coalesce(1).write.mode("append").parquet(src)
        df.filter("event_id >= 200").coalesce(1).write.mode("append").parquet(src)
        files = sorted(glob.glob(os.path.join(src, "part-*")), key=os.path.getmtime)
        assert len(files) == 2
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_streaks(stream, api="v1")
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("streaks_test_sink")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        updates = spark.table("streaks_test_sink").orderBy("n_events").collect()
        final = updates[-1]
        # 5 consecutive "view" spanning the boundary, then one "click"
        assert final["n_events"] == 6
        assert final["best_streak"] == 5
        assert final["cur_streak"] == 1
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_v2_api_is_capability_gated():
    """No protobuf distribution is installed here, yet the gate must say
    v2 is runnable: the shim aliases the machine's vendored pure-Python
    runtime under the canonical name (and never crashes either way)."""
    import importlib.metadata

    with pytest.raises(importlib.metadata.PackageNotFoundError):
        importlib.metadata.distribution("protobuf")  # premise: none installed
    assert has_state_v2() is True
    import google.protobuf  # the shim is active after the gate ran

    assert google.protobuf.__name__ != "google.protobuf"  # aliased, not real


@pytest.mark.skipif(not has_state_v2(), reason="transformWithStateInPandas needs protobuf")
def test_streaks_v2_matches_v1(spark):
    """Where the v2 runtime exists, both APIs must produce identical rows
    (run on any protobuf-equipped environment; documents the contract)."""
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table
    from us_flight_bigdata_dashboard_spark.streaming import replay
    from us_flight_bigdata_dashboard_spark.streaming.events import _event_time

    src = replay._stage_events_ts_ordered(spark, "/root/testdata/sf0.001")
    outs = {}
    for api in ("v1", "v2"):
        got = replay._replay(
            spark, src, lambda s: streaming_streaks(_event_time(s), api=api), "update"
        )
        outs[api] = sorted(
            (r["user_id"], r["n_events"], r["best_streak"], r["cur_streak"])
            for r in got.groupBy("user_id").agg(
                F.max_by(F.struct("n_events", "best_streak", "cur_streak"), "n_events").alias("s")
            ).select("user_id", "s.*").collect()
        )
    assert outs["v1"] == outs["v2"]
