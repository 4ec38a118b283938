"""Structured Streaming tests: file-source micro-batches → watermarked
tumbling windows → memory sink; results must equal the batch aggregation of
the same data (stream/batch unification)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from us_flight_bigdata_dashboard_spark.streaming.events import (
    interval_join_views_before_clicks,
    read_event_stream,
    run_to_memory_sink,
    sliding_counts,
    tumbling_counts,
)

EVENTS = [
    # (event_id, ts, user_id, event_type, value)  — two hours, late row last
    (1, "2026-01-01 10:05:00", 1, "click", 1.0),
    (2, "2026-01-01 10:20:00", 2, "click", 2.0),
    (3, "2026-01-01 10:59:00", 1, "view", 3.0),
    (4, "2026-01-01 11:01:00", 3, "click", 4.0),
    (5, "2026-01-01 11:30:00", 2, "view", 5.0),
    (6, "2026-01-01 10:45:00", 3, "click", 6.0),  # late within watermark
]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_in")
    # two files → two micro-batches (maxFilesPerTrigger=1); mtimes pinned
    # because the file source orders batches by modification time
    for i, (fname, rows) in enumerate([("b0.json", EVENTS[:4]), ("b1.json", EVENTS[4:])]):
        path = os.path.join(root, fname)
        with open(path, "w") as f:
            for eid, ts, uid, et, v in rows:
                f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid, "event_type": et, "value": v, "props": "{}"}) + "\n")
        os.utime(path, (1000000 + i * 100, 1000000 + i * 100))
    return str(root)


def test_tumbling_stream_equals_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    assert stream.isStreaming
    q = run_to_memory_sink(tumbling_counts(stream), "tumbling_test", mode="update")
    q.awaitTermination(120)
    result = spark.table("tumbling_test")
    # memory sink in update mode may hold superseded rows; take the final
    # value per (window, type) = the one with the max n_events
    final = (
        result.groupBy("window_start", "event_type")
        .agg(F.max("n_events").alias("n_events"), F.max("sum_value").alias("sum_value"))
        .collect()
    )
    got = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"]) for r in final}
    assert got[("2026-01-01 10:00:00", "click")] == (3, 9.0)  # late row merged
    assert got[("2026-01-01 10:00:00", "view")] == (1, 3.0)
    assert got[("2026-01-01 11:00:00", "click")] == (1, 4.0)
    assert got[("2026-01-01 11:00:00", "view")] == (1, 5.0)


def test_availablenow_replay_equals_batch_tumbling(spark, tmp_path_factory):
    """Batch↔streaming equivalence contract: replaying the real testdata
    events through the streaming tumbling aggregate with an availableNow
    trigger must EXACTLY equal the batch operator per (window, type) —
    same counts, bit-identical decimal-exact sums (micro-batch order can't
    matter because decimal addition is associative). The one approximate
    column (HLL++ distinct users) is checked against the batch exact count
    within 5 standard errors instead."""
    from us_flight_bigdata_dashboard_spark.operators.events import q_events_tumbling
    from us_flight_bigdata_dashboard_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    batch = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"], r["n_users"])
        for r in q_events_tumbling(spark, sf).collect()
        if r["window_start"] is not None
    }
    assert batch  # non-trivial comparison

    events = load_table(spark, sf, "events").filter(F.col("ts").isNotNull())
    src = str(tmp_path_factory.mktemp("events_replay"))
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", "2").parquet(src)
    )
    q = run_to_memory_sink(tumbling_counts(stream), "equiv_tumbling", mode="complete")
    q.awaitTermination(180)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"], r["approx_users"])
        for r in spark.table("equiv_tumbling").collect()
    }
    assert set(got) == set(batch)
    for key, (n_events, sum_value, exact_users) in batch.items():
        s_events, s_sum, s_approx_users = got[key]
        assert s_events == n_events, key
        assert s_sum == sum_value, key  # exact: decimal sum both sides
        # approx_count_distinct default rsd is 5%; allow 5 standard errors
        assert abs(s_approx_users - exact_users) <= max(3, 0.25 * exact_users), key


ATTRIB_EVENTS = [
    # views precede clicks; lookback window is 30 minutes
    (1, "2026-01-01 10:00:00", 1, "view", 0.0),
    (2, "2026-01-01 10:10:00", 1, "click", 0.0),   # pairs with view 1
    (3, "2026-01-01 10:00:00", 2, "view", 0.0),
    (4, "2026-01-01 10:45:00", 2, "click", 0.0),   # 45 min gap: outside lookback
    (5, "2026-01-01 10:30:00", 1, "click", 0.0),   # pairs with view 1 (boundary, inclusive)
    (6, "2026-01-01 11:00:00", 3, "view", 0.0),
    (7, "2026-01-01 10:50:00", 3, "click", 0.0),   # view after click: no pair
]


@pytest.fixture(scope="module")
def attrib_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("attrib_in")
    for i, (fname, rows) in enumerate([("b0.json", ATTRIB_EVENTS[:4]), ("b1.json", ATTRIB_EVENTS[4:])]):
        path = os.path.join(root, fname)
        with open(path, "w") as f:
            for eid, ts, uid, et, v in rows:
                f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid, "event_type": et, "value": v, "props": "{}"}) + "\n")
        os.utime(path, (1000000 + i * 100, 1000000 + i * 100))
    return str(root)


def test_stream_stream_interval_join(spark, attrib_dir):
    """Watermarked stream-stream interval join equals the identical plan
    run over the same rows as batch frames (stream/batch unification)."""
    stream = read_event_stream(spark, attrib_dir)
    q = run_to_memory_sink(
        interval_join_views_before_clicks(stream), "ssjoin_test", mode="append"
    )
    q.awaitTermination(120)
    got = {
        (r["click_event_id"], r["view_event_id"])
        for r in spark.table("ssjoin_test").collect()
    }
    assert got == {(2, 1), (5, 1)}

    from us_flight_bigdata_dashboard_spark.streaming.events import EVENT_SCHEMA

    batch_src = spark.read.schema(EVENT_SCHEMA).json(attrib_dir)
    batch = {
        (r["click_event_id"], r["view_event_id"])
        for r in interval_join_views_before_clicks(batch_src).collect()
    }
    assert got == batch


def test_sliding_windows_overlap(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    q = run_to_memory_sink(sliding_counts(stream), "sliding_test", mode="update")
    q.awaitTermination(120)
    rows = spark.table("sliding_test").collect()
    starts = {str(r["window_start"]) for r in rows}
    # 1h windows sliding by 30min: the 10:05 event belongs to both the
    # 09:30 and 10:00 windows
    assert "2026-01-01 09:30:00" in starts and "2026-01-01 10:00:00" in starts


def test_streaming_dedup_drops_redelivered(spark, tmp_path_factory):
    """Redelivered event_ids across micro-batches collapse to one row, and
    the surviving set equals batch dropDuplicates over the same files."""
    import json as _json

    from us_flight_bigdata_dashboard_spark.streaming.events import (
        EVENT_SCHEMA,
        dedup_event_stream,
    )

    root = str(tmp_path_factory.mktemp("dedup_stream"))
    rows_b0 = [
        {"event_id": 1, "ts": "2026-01-01 10:00:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2026-01-01 10:10:00", "user_id": 2, "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    rows_b1 = [
        # redelivery of event 1 (same id, later arrival) + a fresh event
        {"event_id": 1, "ts": "2026-01-01 10:00:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 3, "ts": "2026-01-01 10:30:00", "user_id": 3, "event_type": "click", "value": 3.0, "props": "{}"},
    ]
    for i, (fname, rows) in enumerate([("b0.json", rows_b0), ("b1.json", rows_b1)]):
        p = os.path.join(root, fname)
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.utime(p, (2000000 + i * 100, 2000000 + i * 100))

    stream = read_event_stream(spark, root)
    q = run_to_memory_sink(dedup_event_stream(stream), "dedup_stream_test", mode="append")
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.table("dedup_stream_test").collect())
    assert got == [1, 2, 3]

    batch = (
        spark.read.schema(EVENT_SCHEMA).json(root).dropDuplicates(["event_id"])
    )
    assert got == sorted(r["event_id"] for r in batch.collect())


def test_stream_static_enrichment(spark, stream_dir):
    """Stream-static left join: every event flows through enriched with the
    dimension row (or NULLs), equal to the same join run as batch."""
    from us_flight_bigdata_dashboard_spark.streaming.events import (
        EVENT_SCHEMA,
        enrich_stream_with_dim,
    )

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["dim_user_id", "segment"]
    )
    stream = read_event_stream(spark, stream_dir)
    q = run_to_memory_sink(
        enrich_stream_with_dim(stream, dim), "enrich_test", mode="append"
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["segment"]) for r in spark.table("enrich_test").collect()
    }
    batch_src = spark.read.schema(EVENT_SCHEMA).json(stream_dir)
    batch = {
        (r["event_id"], r["segment"])
        for r in enrich_stream_with_dim(batch_src, dim).collect()
    }
    assert got == batch
    assert (1, "gold") in got and (4, None) in got  # user 3 unmatched → NULL


def test_upsert_sink_idempotent_replay(spark, tmp_path_factory):
    """foreachBatch upsert sink: per-key last-writer-wins, and replaying the
    same files through a SECOND query over the same target converges (no
    duplicate keys, same values)."""
    import json as _json

    from us_flight_bigdata_dashboard_spark.streaming.events import upsert_parquet_sink

    root = tmp_path_factory.mktemp("upsert_in")
    out = str(tmp_path_factory.mktemp("upsert_out") / "target")
    # user 1 appears in both batches — the later ts must win
    batches = [
        [(1, "2026-01-01 10:00:00", 1, "click", 1.0),
         (2, "2026-01-01 10:10:00", 2, "view", 2.0)],
        [(3, "2026-01-01 11:00:00", 1, "click", 9.0),
         (4, "2026-01-01 11:05:00", 3, "view", 4.0)],
    ]
    for i, rows in enumerate(batches):
        p = os.path.join(root, f"b{i}.json")
        with open(p, "w") as f:
            for eid, ts, uid, et, v in rows:
                f.write(_json.dumps({"event_id": eid, "ts": ts, "user_id": uid,
                                     "event_type": et, "value": v, "props": "{}"}) + "\n")
        os.utime(p, (1000000 + i * 100, 1000000 + i * 100))

    def run(checkpoint):
        stream = read_event_stream(spark, str(root))
        q = upsert_parquet_sink(stream, out, checkpoint, ["user_id"])
        q.awaitTermination(120)

    run(str(tmp_path_factory.mktemp("ckpt1")))
    first = {(r["user_id"], r["event_id"]) for r in spark.read.parquet(out).collect()}
    assert first == {(1, 3), (2, 2), (3, 4)}  # user 1 upserted to event 3

    # fresh checkpoint → all files replay against the existing target
    run(str(tmp_path_factory.mktemp("ckpt2")))
    replay = spark.read.parquet(out)
    assert replay.groupBy("user_id").count().filter("count > 1").count() == 0
    assert {(r["user_id"], r["event_id"]) for r in replay.collect()} == first
