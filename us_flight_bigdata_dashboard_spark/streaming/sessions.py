"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §7 / the Structured Streaming path for
operators the built-in window aggregates can't express).

Per user_id, state = the open session (start, last-seen, count). Each
micro-batch folds its events into the state; a gap larger than the session
gap CLOSES the current session (emitted downstream) and opens a new one.
State persists across micro-batches in the state store — the batch mirror
is operators/events.q_events_sessionize.

At scale: state is partitioned by key in the state store; memory is O(open
sessions). TWO variants ship:

* ``streaming_sessionize`` — NoTimeout: final sessions stay open forever;
  this is the variant under the deterministic REPLAY gate (its output is a
  pure function of the staged files, independent of watermark timing).
* ``streaming_sessionize_live`` — EventTimeTimeout: a watermark plus
  per-key event-time timeouts FLUSH idle sessions once the watermark
  passes ``last_event + gap``, so a live deployment's state is evicted and
  every session eventually emits. Kept out of the replay gate on purpose:
  which micro-batch a timeout fires in depends on watermark pacing, which
  is a property of batch boundaries, not of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch seconds
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def make_sessionizer(gap_seconds: int):
    """Build the stateful worker as a self-contained closure (pickled by
    value — Spark Python workers cannot import this package)."""

    def sessionize(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        closed: list[tuple[int, int, int]] = []
        ts_values: list[int] = []
        for pdf in pdf_iter:
            # drop null/NaT timestamps — one malformed event must not kill
            # the whole streaming query
            ts_values.extend(int(t.timestamp()) for t in pdf["ts"] if not pd.isna(t))
        ts_values.sort()

        for ts in ts_values:
            if last is not None and ts < last:
                # late event older than the session frontier: drop (the
                # production policy would be a watermark + event-time
                # timeout; state must never move backwards)
                continue
            if last is not None and ts - last > gap_seconds:
                closed.append((start, last, n))
                start, n = None, 0
            if start is None:
                start = ts
            n += 1
            last = ts

        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return sessionize


def make_timeout_sessionizer(gap_seconds: int):
    """EventTimeTimeout worker: same per-batch fold as ``make_sessionizer``
    plus the two live-deployment behaviors the NoTimeout twin lacks:

    * ``state.hasTimedOut`` → the watermark passed ``last + gap`` with no
      new events: emit the open session as FINAL and drop the state;
    * after folding a batch, re-arm ``setTimeoutTimestamp((last + gap)s)``
      — unless the watermark has ALREADY passed that horizon, in which
      case the session closes immediately (setting a timeout at or below
      the watermark is an error by contract).

    Self-contained closure — pickled by value."""

    def sessionize(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key

        def frame(sessions):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(sessions),
                    "session_start": [s[0] for s in sessions],
                    "session_end": [s[1] for s in sessions],
                    "n_events": [s[2] for s in sessions],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                if n:
                    yield frame([(start, last, n)])
            else:
                state.remove()
            return

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        closed: list[tuple[int, int, int]] = []
        ts_values: list[int] = []
        for pdf in pdf_iter:
            ts_values.extend(int(t.timestamp()) for t in pdf["ts"] if not pd.isna(t))
        ts_values.sort()
        for ts in ts_values:
            if last is not None and ts < last:
                continue
            if last is not None and ts - last > gap_seconds:
                closed.append((start, last, n))
                start, n = None, 0
            if start is None:
                start = ts
            n += 1
            last = ts

        wm_ms = state.getCurrentWatermarkMs()
        if last is not None and (last + gap_seconds) * 1000 <= wm_ms:
            # the watermark already guarantees no event can extend this
            # session — close it now instead of arming a past timeout
            closed.append((start, last, n))
            state.remove()
        else:
            state.update((start, last, n))
            if last is not None:
                state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        if closed:
            yield frame(closed)

    return sessionize


def streaming_sessionize(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Closed sessions as a stream: one output row per session, emitted in
    the micro-batch whose events exceed the inactivity gap."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessionize_live(
    stream: DataFrame, gap_seconds: int = 1800, watermark: str = "10 minutes"
) -> DataFrame:
    """Live sessionization: watermarked event time + EventTimeTimeout, so
    an idle user's final session is EMITTED (and its state evicted) once
    the watermark passes ``last_event + gap`` — the behavior a deployed
    sessionizer needs and the NoTimeout replay twin deliberately lacks.
    State memory is O(users idle less than gap + watermark), bounded."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from us_flight_bigdata_dashboard_spark.streaming.events import _event_time

    return (
        _event_time(stream)
        .select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_timeout_sessionizer(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
