"""Checkpoint-restart contract for the CHAINED multi-stateful pipeline
(VERDICT r12 ask #5): two chained stateful window aggregations (5-min
tumbling count → 1-hour rollup, the ``streaming_chained_windows_replay``
shape) restoring BOTH state stores consistently from ONE checkpoint.

The split is by event_id PARITY, not time, so essentially every 5-min
bucket and every 1-hour window needs rows from BOTH query instances —
the strongest possible restore assertion: run 1 sees only even ids and,
because the watermark horizon exceeds the event span, emits NOTHING
(every window in both operators is open state at shutdown); run 2, a
genuinely separate StreamingQuery instance sharing only the checkpoint,
sees only odd ids plus the future flush sentinel. Its append output can
equal the batch double-grouping over ALL events only if (a) operator 1
reloaded every partial 5-min count and (b) operator 2 reloaded every
partial 1-hour rollup — a wrong restore of EITHER store shows up as a
wrong n_events / peak_5min / n_buckets somewhere.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table
from us_flight_bigdata_dashboard_spark.streaming.events import _event_time
from us_flight_bigdata_dashboard_spark.streaming.replay import (
    CHAIN_HORIZON,
    _CHAIN_HORIZON_H,
    _CHAIN_SENTINEL_H,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def dirs():
    ds = [tempfile.mkdtemp(prefix=f"chain_ckpt_{i}_") for i in range(3)]
    yield ds
    for d in ds:
        shutil.rmtree(d, ignore_errors=True)


def _chained(stream):
    """The exact chained build of q_streaming_chained_windows_replay:
    5-min tumbling count per type → 1-hour rollup via window_time. No
    in-plan sentinel filter (Catalyst pushes it below EventTimeWatermark
    and kills the flush — replay.py docstring)."""
    w = stream.withWatermark("ts", CHAIN_HORIZON)
    b5 = w.groupBy(F.window("ts", "5 minutes").alias("w5"), "event_type").agg(
        F.count(F.lit(1)).alias("n5")
    )
    return (
        b5.groupBy(F.window(F.window_time("w5"), "1 hour").alias("w1"), "event_type")
        .agg(
            F.sum("n5").cast("long").alias("n_events"),
            F.max("n5").cast("long").alias("peak_5min"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
        )
        .select(
            F.col("w1.start").alias("window_start"),
            F.col("w1.end").alias("window_end"),
            "event_type",
            "n_events",
            "peak_5min",
            "n_buckets",
        )
    )


def test_chained_state_stores_recovered_across_restart(spark, dirs):
    src, sink, ckpt_parent = dirs
    ckpt = os.path.join(ckpt_parent, "ckpt")

    ev = _event_time(
        load_table(spark, SF, "events").filter(F.col("ts").isNotNull())
    ).select("event_id", "ts", "user_id", "event_type", "value")
    (bounds,) = ev.agg(F.min("ts").alias("tmin"), F.max("ts").alias("gm")).collect()
    span_h = (bounds["gm"] - bounds["tmin"]).total_seconds() / 3600.0
    assert span_h + 24 <= _CHAIN_HORIZON_H, "fixture span outgrew CHAIN_HORIZON"

    mtime = [1_000_000_000]

    def stage(df, n_files, name):
        d = tempfile.mkdtemp(prefix="chain_stage_")
        df.repartition(n_files).write.mode("overwrite").parquet(d)
        for f in sorted(glob.glob(f"{d}/part-*.parquet")):
            dst = os.path.join(src, f"{name}_{mtime[0]}.parquet")
            os.rename(f, dst)
            os.utime(dst, (mtime[0], mtime[0]))
            mtime[0] += 1
        shutil.rmtree(d, ignore_errors=True)

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            _chained(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).filter(F.col("event_type") != "sentinel")

    # run 1: EVEN ids only, no sentinel → horizon > span ⇒ zero emissions,
    # everything is open state in both stores at shutdown
    stage(ev.filter(F.col("event_id") % 2 == 0), 3, "even")
    got1 = run_once()
    assert got1.count() == 0, "horizon exceeds span: nothing may flush in run 1"

    # run 2: ODD ids + the future sentinel, resumed from the checkpoint
    sentinel = ev.agg(F.max("ts").alias("mx")).select(
        F.lit(-1).cast("long").alias("event_id"),
        (F.col("mx") + F.expr(f"INTERVAL {_CHAIN_SENTINEL_H} HOURS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    stage(ev.filter(F.col("event_id") % 2 == 1), 2, "odd")
    stage(sentinel, 1, "zsentinel")
    got2 = run_once()

    # the parity split must actually exercise cross-run state: a healthy
    # fixture has 5-min buckets fed by BOTH runs
    spanning = (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.sum((F.col("event_id") % 2 == 0).cast("int")).alias("ne"),
            F.sum((F.col("event_id") % 2 == 1).cast("int")).alias("no"),
        )
        .filter((F.col("ne") > 0) & (F.col("no") > 0))
        .count()
    )
    assert spanning > 0, "parity split produced no cross-run 5-min buckets"

    # exactly-once per (window, type) key across the whole sink
    assert (
        got2.groupBy("window_start", "event_type").count().filter("count > 1").count()
        == 0
    )

    # full equality with the batch double-grouping over ALL real events —
    # only possible if BOTH operators' state restored from the checkpoint
    want = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w5"), "event_type")
        .agg(F.count(F.lit(1)).alias("n5"))
        .groupBy(F.window(F.col("w5.start"), "1 hour").alias("w1"), "event_type")
        .agg(
            F.sum("n5").cast("long").alias("n_events"),
            F.max("n5").cast("long").alias("peak_5min"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
        )
        .select(
            F.col("w1.start").alias("window_start"),
            F.col("w1.end").alias("window_end"),
            "event_type",
            "n_events",
            "peak_5min",
            "n_buckets",
        )
    )
    assert got2.exceptAll(want).count() == 0
    assert want.exceptAll(got2).count() == 0
