"""Structured Streaming analytics over the event stream (SURVEY.md §2.7/§7).

The reference's "real-time dashboard" recomputes from additive caches on
every interaction (src/app.py:83-168); here the same additive aggregates
are maintained *incrementally* by Structured Streaming — tumbling/sliding
event-time windows with a watermark bounding late data and state size. The
serving layer reads the continuously-updated result instead of a batch
cache; everything downstream (KPIs, rollups) is unchanged because the
aggregates stay additive.

At scale: state is partitioned by (window, key) in the state store; the
watermark evicts closed windows so state is O(open windows × keys), not
O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from us_flight_bigdata_dashboard_spark.functions.exact import dsum

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (each dropped file = a micro-batch; swap for
    Kafka via ``.format("kafka")`` with the same downstream plan)."""
    return spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).json(path)


def _event_time(stream: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (with local tz).

    ``withWatermark`` rejects TIMESTAMP_NTZ event time
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and parquet sources written with
    isAdjustedToUTC=false surface as NTZ — so any operator that watermarks
    must normalize first. The session timezone is pinned to UTC
    (session.get_spark), so the NTZ→LTZ cast preserves the wall-clock
    reading exactly; for already-LTZ sources this is a no-op."""
    if isinstance(stream.schema[col].dataType, T.TimestampNTZType):
        return stream.withColumn(col, F.col(col).cast("timestamp"))
    return stream


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type — the
    streaming twin of operators/events.q_events_tumbling.

    ``sum_value`` uses the same decimal-quantized exact sum as the batch
    operator, so the availableNow replay of a file set is EQUAL to the
    batch aggregate (tests/test_streaming.py equivalence contract) — not
    merely close: decimal addition is associative/commutative, so
    micro-batch accumulation order can't perturb the result. The distinct
    user count is the HLL++ sketch (mergeable streaming state, the
    at-scale choice); batch's exact countDistinct is its exactness oracle."""
    return (
        _event_time(stream).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=8).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def sliding_counts(stream: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Sliding-window variant (overlapping windows)."""
    return (
        _event_time(stream).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def interval_join_views_before_clicks(
    stream: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: every click paired with the same
    user's view events from the preceding ``lookback`` window (attribution
    shape: which impressions preceded this click).

    This is the canonical watermarked stream-stream join: both sides
    declare event-time watermarks and the join predicate carries a
    two-sided time-range constraint, so Spark can bound EACH side's join
    state — a view older than click-watermark − lookback can never match a
    future click and is evicted; state is O(events in the watermark
    horizon), not O(stream length). Append mode; ``how`` selects the
    join type — LEFT OUTER adds the subtlest streaming-join semantics
    (an unmatched click's NULL row emits only once the watermark proves
    no view can still arrive; the outer replay gates it). The same plan
    on batch frames is the equivalence oracle (tests/test_streaming.py)."""
    stream = _event_time(stream)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("user_id").alias("view_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    cond = (
        (F.col("click_user") == F.col("view_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"interval {lookback}"))
    )
    return clicks.join(views, cond, how).select(
        "click_event_id",
        F.col("click_user").alias("user_id"),
        "click_ts",
        "view_event_id",
        "view_ts",
    )


def dedup_event_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop redelivered events (same ``event_id``)
    arriving within the watermark horizon — the at-least-once → effectively-
    once repair every event pipeline needs in front of its aggregates.

    ``dropDuplicatesWithinWatermark`` keys state by event_id and evicts an
    id once the watermark passes its first-seen event time, so state is
    O(ids per watermark horizon), not O(stream length) — the semantics
    (and the reason plain ``dropDuplicates`` is wrong on streams: its
    state never ages out) per the Structured Streaming guide. Batch
    ``dropDuplicates(["event_id"])`` over the same files is the
    equivalence oracle (tests/test_streaming.py)."""
    return (
        _event_time(stream)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of events joined to
    a static (batch) dimension table — the lookup-enrichment every event
    pipeline performs before aggregating (user→segment, airport→coords,
    doc→license).

    The static side needs no watermark and holds NO streaming state: Spark
    plans a fresh batch join per micro-batch, so a small dimension is
    broadcast (hinted here — at 100 TB the dim is the small side by
    construction or this should be a pre-bucketed join instead). Left join
    keeps unmatched events flowing with NULL enrichment rather than
    silently dropping them."""
    return stream.join(
        F.broadcast(dim), stream["user_id"] == dim["dim_user_id"], "left"
    ).drop("dim_user_id")


def upsert_parquet_sink(result: DataFrame, path: str, checkpoint: str, key_cols: list[str]):
    """foreachBatch idempotent upsert sink: each micro-batch is merged into
    a parquet target by key — last-writer-wins within the batch, batch
    replaces target rows with matching keys (the MERGE pattern of
    operators/mutation.q_merge_upsert, applied incrementally).

    Exactly-once story: Structured Streaming retries a failed batch with
    the SAME batch_id; because the merge is a deterministic function of
    (target state, batch rows) and replaces matching keys, replaying a
    batch converges to the same target — idempotent despite the
    at-least-once foreachBatch contract (tests/test_streaming.py replays
    the same files through a second query over one checkpoint and asserts
    no duplicate keys). Parquet stands in for a table format; swap the
    rewrite for Delta/Iceberg MERGE INTO at scale — the batch function is
    unchanged. The full-target rewrite is the parquet limitation, not the
    pattern's: state size is O(target), rewritten per batch, which a real
    table format reduces to touched files."""
    import os
    import shutil

    from pyspark.sql import Window as W

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        rk = W.partitionBy(*key_cols).orderBy(F.desc("ts"), F.desc("event_id"))
        latest = (
            batch.withColumn("_rk", F.row_number().over(rk))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        if os.path.exists(path):
            target = spark.read.parquet(path)
            merged = target.join(
                latest.select(*key_cols), key_cols, "left_anti"
            ).unionByName(latest)
        else:
            merged = latest
        # stage to a sibling dir, then swap: never overwrite the path a
        # lazy plan is still reading from (a table format's MERGE does
        # this transactionally; plain parquet needs the two-step)
        tmp = path + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)

    return (
        result.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory_sink(result: DataFrame, query_name: str, mode: str = "update"):
    """Start the stream into an in-memory table (tests/demos); returns the
    StreamingQuery — caller awaits/stops it."""
    return (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Stateful per-key EWMA (the streaming twin of operators/events.q_events_ewma)
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("v", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def make_ewma_worker(alpha: float):
    """Stateful EWMA fold as a self-contained closure (pickled by value —
    Spark Python workers cannot import this package). State per key is the
    16-byte (current value, count) pair; each batch folds its rows in
    (ts, event_id) order with ``v += alpha * (x - v)`` — the identical
    operation sequence as the SQL oracle's list_reduce, so the final value
    is bit-identical IEEE arithmetic."""

    def fold(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            v, n = state.get
        else:
            v, n = None, 0

        rows = []
        for pdf in pdf_iter:
            for ts, eid, x in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
                if pd.isna(ts) or pd.isna(x):
                    continue
                rows.append((ts, int(eid), float(x)))
        rows.sort()
        for _, _, x in rows:
            v = x if v is None else v + alpha * (x - v)
            n += 1
        state.update((v, n))
        if rows:
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "ewma": [v]}
            )

    return fold


def make_ewma_processor(alpha: float):
    """The IDENTICAL EWMA fold on the state API v2 (typed ValueState
    instead of the opaque v1 state tuple) — factory-nested so cloudpickle
    serializes by value; same (value, count) 16-byte state, same
    (ts, event_id) in-batch ordering, same IEEE op sequence, so v1, v2,
    and the SQL oracle all agree bit-for-bit."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ewma", "v double, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            if self._state.exists():
                v, n = self._state.get()
            else:
                v, n = None, 0
            folded = 0
            for x in batch["value"]:
                if pd.isna(x):
                    continue
                xv = float(x)
                v = xv if v is None else v + alpha * (xv - v)
                n += 1
                folded += 1
            self._state.update((v, int(n)))
            if folded:
                yield pd.DataFrame(
                    {"user_id": [int(key[0])], "n_events": [int(n)], "ewma": [v]}
                )

        def close(self) -> None:
            pass

    return EwmaProcessor()


def streaming_ewma_v2(stream: DataFrame, alpha: float = 0.25) -> DataFrame:
    """``streaming_ewma`` on transformWithStateInPandas: typed ValueState,
    RocksDB store (Spark requires the multi-column-family provider for
    v2 — set on the session because the provider is read at query
    START; the replay harness restores it afterwards)."""
    stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return (
        stream.filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_ewma_processor(alpha),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
    ]
)


def make_funnel_worker():
    """Stateful ordered-funnel state machine: per user, the FIRST view,
    the first click at-or-after that view, and the first purchase
    at-or-after that click — 24 bytes of state (three epoch-micro
    timestamps, -1 = unreached). Each stage latches exactly once, and
    because events arrive in event-time order (ts-ordered replay; a live
    deployment gets the same from a watermark), the incremental latch is
    equivalent to the batch chained-MIN formulation — the state machine
    never needs to revisit earlier stages. Timestamps are integers, so
    the whole operator is arithmetic-free and exactly reproducible."""

    def fold(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            v, c, p = state.get
        else:
            v, c, p = -1, -1, -1

        rows = []
        for pdf in pdf_iter:
            for ts, eid, etype in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
                if pd.isna(ts):
                    continue
                rows.append((ts.value // 1000, int(eid), str(etype)))
        # Three latch passes over the batch (not a single in-order sweep):
        # the batch semantics are chained MINs with ``>=`` on TIMESTAMPS,
        # so a click sharing the first view's exact timestamp qualifies
        # even if it sorts before the view by event id. Per-batch passes
        # reproduce that exactly; equal timestamps never straddle batches
        # (ts-range-partitioned staging), so cross-batch latching composes.
        if rows:
            if v < 0:
                vs = [us for us, _, t in rows if t == "view"]
                if vs:
                    v = min(vs)
            if v >= 0 and c < 0:
                cs = [us for us, _, t in rows if t == "click" and us >= v]
                if cs:
                    c = min(cs)
            if c >= 0 and p < 0:
                ps = [us for us, _, t in rows if t == "purchase" and us >= c]
                if ps:
                    p = min(ps)
        state.update((v, c, p))
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "view_us": [v],
                    "click_us": [c],
                    "purchase_us": [p],
                }
            )

    return fold


def streaming_funnel(stream: DataFrame) -> DataFrame:
    """Per-user ordered conversion funnel maintained incrementally: one
    update row per (user, micro-batch with events) carrying the latched
    stage timestamps. O(keys) × 24 bytes of state at any stream length."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_worker(),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ZSCORE_MIN_N = 8       # prior observations required before flagging
ZSCORE_FP = 100        # fixed-point scale: x_fp = floor(value · 100)

ZSCORE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_anomalies", T.LongType()),
    ]
)

ZSCORE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("ss", T.LongType()),
        T.StructField("anom", T.LongType()),
    ]
)


def make_zscore_worker(min_n: int, fp: int):
    """Stateful ONLINE anomaly counter as a self-contained closure: per
    key the running integer moments (n, Σx, Σx²) over fixed-point values
    x = floor(value·{fp}), and per event a 3σ test against the moments of
    STRICTLY PRIOR events — the causal formulation a live detector needs
    (the batch z-score operator scores against the full-window moments).

    The 3σ test is algebra on integers only: |x−μ| > 3σ with μ = s/n and
    σ² = (ss − s²/n)/n is multiplied through by n² into
    (n·x − s)² > 9·(n·ss − s²) — no division, no sqrt, no doubles, so
    the decision is EXACTLY reproducible in any engine (prefix sums of
    integers are order-independent, unlike double prefix sums)."""

    def fold(key, pdf_iter, state):
        import math

        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, s, ss, anom = state.get
        else:
            n, s, ss, anom = 0, 0, 0, 0

        rows = []
        for pdf in pdf_iter:
            for ts, eid, x in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
                if pd.isna(ts) or pd.isna(x):
                    continue
                rows.append((ts, int(eid), math.floor(float(x) * fp)))
        rows.sort()
        for _, _, x in rows:
            if n >= min_n:
                lhs = (n * x - s) ** 2
                rhs = 9 * (n * ss - s * s)
                if lhs > rhs:
                    anom += 1
            n += 1
            s += x
            ss += x * x
        state.update((n, s, ss, anom))
        if rows:
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "n_anomalies": [anom]}
            )

    return fold


def streaming_zscore(stream: DataFrame) -> DataFrame:
    """Per-user online 3σ anomaly counting: one update row per (user,
    micro-batch with events) carrying the running (count, anomalies).
    State is 32 bytes per key at any stream length or skew."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_zscore_worker(ZSCORE_MIN_N, ZSCORE_FP),
            outputStructType=ZSCORE_OUTPUT_SCHEMA,
            stateStructType=ZSCORE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ewma(stream: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-user EWMA maintained incrementally: one update row per (user,
    micro-batch with new events) carrying the running (count, ewma). This
    is the unbounded-arrival answer the batch operator's chunked fold
    defers to — state is O(keys) x 16 bytes regardless of stream length
    or key skew, and each batch touches only its own rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_ewma_worker(alpha),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
