"""Checkpoint/restart contracts: exactly-once sinks and state recovery.

The replay matrix proves streaming semantics within ONE query run; these
tests prove the other half of the production story — a stopped query
restarted from its checkpoint must (a) resume from recorded offsets and
write each input exactly once into a file sink, (b) reload its
aggregation STATE from the state store so counts continue rather than
restart from zero, and (c) reload buffered STREAM-STREAM JOIN state so a
click arriving after the restart still pairs with a view buffered before
it. All are driven as two genuinely separate StreamingQuery instances
sharing only the checkpoint directory, with new source files arriving
between the runs (the backfill-then-catchup shape)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.sources.catalog import load_table
from us_flight_bigdata_dashboard_spark.streaming.events import _event_time

SF = "/root/testdata/sf0.001"


@pytest.fixture
def dirs():
    ds = [tempfile.mkdtemp(prefix=f"ckpt_test_{i}_") for i in range(3)]
    yield ds
    for d in ds:
        shutil.rmtree(d, ignore_errors=True)


def _stage(spark, out, lo_pct, hi_pct, n_files):
    """Stage a percentile slice of the events table as n_files parquet
    files. Natural (current) mtimes — do NOT back/forward-date them: the
    file source purges seen-file entries older than maxFileAge relative
    to the LATEST file timestamp, so touching old files far into the
    future evicts them from the dedup map and they get reprocessed (a
    real operational footgun, found the hard way by this test's first
    version). Batch ORDER doesn't matter to these assertions, only the
    exactly-once file set."""
    ev = _event_time(load_table(spark, SF, "events").filter(F.col("ts").isNotNull()))
    lo, hi = (
        ev.selectExpr(
            f"percentile_disc({lo_pct}) WITHIN GROUP (ORDER BY event_id) AS lo",
            f"percentile_disc({hi_pct}) WITHIN GROUP (ORDER BY event_id) AS hi",
        ).first()
    )
    part = ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
    part.repartition(n_files).write.mode("append").parquet(out)
    return part.count()


def test_file_sink_exactly_once_across_restart(spark, dirs):
    src, sink, ckpt_parent = dirs
    ckpt = os.path.join(ckpt_parent, "ckpt")

    n1 = _stage(spark, src, 0.0, 0.5, 3)

    def run_once():
        q = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select("event_id", "user_id", "event_type")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == n1

    # new files arrive; a SECOND query instance resumes from the checkpoint
    n2 = _stage(spark, src, 0.5, 1.0, 2)
    run_once()

    got = spark.read.parquet(sink)
    assert got.count() == n1 + n2  # every input exactly once, no replays
    assert got.select("event_id").distinct().count() == got.count()


def test_stateful_agg_state_recovered_across_restart(spark, dirs):
    src, _unused, ckpt_parent = dirs
    ckpt = os.path.join(ckpt_parent, "ckpt")

    _stage(spark, src, 0.0, 0.5, 3)

    def run_once(sink_name):
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(sink_name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once("ckpt_counts_a")
    _stage(spark, src, 0.5, 1.0, 2)
    run_once("ckpt_counts_b")

    # the restarted query saw ONLY the new files, yet its complete-mode
    # output must equal the batch aggregate over ALL files — i.e. the
    # phase-1 counts were reloaded from the state store, not recomputed
    got = {
        r["event_type"]: r["n"] for r in spark.table("ckpt_counts_b").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_state_recovered_across_restart(spark, dirs):
    """The third contract: STREAM-STREAM JOIN state must survive a
    restart. Two query instances share only the checkpoint; the first
    sees the early half of event time, the second only the late half —
    yet pairs whose view arrived in run 1 and whose click arrives in
    run 2 must still emit, which is only possible if the second
    instance reloaded the buffered join state from the state store.
    The union of the two runs' append-mode outputs must equal the batch
    interval join over all files, exactly once."""
    from us_flight_bigdata_dashboard_spark.streaming.events import (
        interval_join_views_before_clicks,
    )

    src, sink, ckpt_parent = dirs
    ckpt = os.path.join(ckpt_parent, "ckpt")
    lookback = "48 hours"

    ev = _event_time(load_table(spark, SF, "events").filter(F.col("ts").isNotNull()))
    (mid,) = ev.selectExpr(
        "timestamp_micros(CAST(percentile_disc(0.5)"
        " WITHIN GROUP (ORDER BY unix_micros(ts)) AS BIGINT)) AS m"
    ).first()

    def stage(pred, n_files):
        part = ev.filter(pred)
        part.repartition(n_files).write.mode("append").parquet(src)

    def run_once():
        # a memory sink cannot recover from a checkpoint (not fault
        # tolerant); the file sink is the production-shaped choice and
        # makes the exactly-once claim directly inspectable
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            interval_join_views_before_clicks(
                stream, lookback=lookback, watermark="3650 days"
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(sink).collect()
        pairs = [(r["click_event_id"], r["view_event_id"]) for r in rows]
        # exactly once across the whole sink: no pair written twice
        assert len(pairs) == len(set(pairs))
        return set(pairs)

    stage(F.col("ts") < F.lit(mid), 3)
    got1 = run_once()
    stage(F.col("ts") >= F.lit(mid), 2)
    got_all = run_once()
    got2 = got_all - got1

    allev = _event_time(
        spark.read.parquet(src).filter(F.col("ts").isNotNull())
    )
    clicks = allev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("ce"), "user_id", F.col("ts").alias("cts")
    )
    views = allev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("ve"),
        F.col("user_id").alias("vu"),
        F.col("ts").alias("vts"),
    )
    want = {
        (r["ce"], r["ve"])
        for r in clicks.join(
            views,
            (F.col("user_id") == F.col("vu"))
            & (F.col("vts") <= F.col("cts"))
            & (F.col("vts") >= F.col("cts") - F.expr(f"interval {lookback}")),
        ).collect()
    }
    assert got_all == want

    # direct evidence the test is not vacuous: pairs emitted by run 2
    # whose VIEW-side row arrived before the split (vts < mid) — that
    # view's buffered join state was RELOADED from the state store
    vts_by_id = {r["ve"]: r["vts"] for r in views.collect()}
    cts_by_id = {r["ce"]: r["cts"] for r in clicks.collect()}
    reloaded = [
        (c, v)
        for (c, v) in got2
        if vts_by_id[v] < mid and cts_by_id[c] >= mid
    ]
    assert reloaded, "no restart-straddling pair — staging split is vacuous"
