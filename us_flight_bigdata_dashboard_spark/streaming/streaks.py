"""Per-user event-type streaks on the state API v2 (transformWithState).

``transformWithStateInPandas`` is Spark 4's successor to
``applyInPandasWithState`` — typed state handles (ValueState / ListState /
MapState, optional TTL) and timers, managed by the state store rather than
one opaque user blob. This module is the engine's v2 operator: per user,
the longest and the current run of CONSECUTIVE same-type events in
event-time order (engagement streaks — the "N days in a row" metric shape,
a fold no windowed aggregate expresses).

State per user is one ValueState row ``(last_type, cur_len, best_len,
n_events)`` — bytes, not history: the state store holds O(users), never
O(events). Each micro-batch folds only its own rows, sorted by
(ts, event_id); cross-batch order is supplied by the ts-range-ordered
replay staging exactly as for the EWMA/zscore processors
(streaming/replay.py documents the contract). All-integer state and
outputs — nothing platform-dependent anywhere.

The SQL oracle is the classic gaps-and-islands derivation (double
row_number difference → island id → island lengths), entirely different
machinery from the sequential fold — a genuine cross-check, not an echo.

Pickling: the processor class is defined INSIDE the factory (by-value
serialization; Spark's Python workers cannot import this package — see
multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STREAK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("best_streak", T.LongType()),
        T.StructField("cur_streak", T.LongType()),
    ]
)

_STATE_SCHEMA = "last_type string, cur_len bigint, best_len bigint, n_events bigint"


def make_streak_processor():
    """Factory returning the StatefulProcessor subclass instance (defined
    inside the closure: pickled by value, workers need no package)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class StreakProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("streak", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            if self._state.exists():
                last_type, cur, best, n = self._state.get()
            else:
                last_type, cur, best, n = None, 0, 0, 0
            for et in batch["event_type"]:
                n += 1
                cur = cur + 1 if et == last_type else 1
                if cur > best:
                    best = cur
                last_type = et
            self._state.update((last_type, int(cur), int(best), int(n)))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_events": [int(n)],
                    "best_streak": [int(best)],
                    "cur_streak": [int(cur)],
                }
            )

        def close(self) -> None:
            pass

    return StreakProcessor()


_STATE_STRUCT = T.StructType(
    [
        T.StructField("last_type", T.StringType()),
        T.StructField("cur_len", T.LongType()),
        T.StructField("best_len", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def make_streak_worker():
    """The identical fold on the v1 API (applyInPandasWithState) — the
    sandbox/driver fallback: the v2 Python worker speaks protobuf to the
    state server, and this environment has no ``google.protobuf``. Same
    state tuple, same integer outputs, same ordering contract."""

    def fold(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_type, cur, best, n = state.get
        else:
            last_type, cur, best, n = None, 0, 0, 0
        rows = []
        for pdf in pdf_iter:
            for ts, eid, et in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
                rows.append((ts, int(eid), et))
        rows.sort(key=lambda r: (r[0], r[1]))
        for _, _, et in rows:
            n += 1
            cur = cur + 1 if et == last_type else 1
            if cur > best:
                best = cur
            last_type = et
        state.update((last_type, int(cur), int(best), int(n)))
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "best_streak": [best],
                    "cur_streak": [cur],
                }
            )

    return fold


def has_state_v2(spark=None) -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    channel in the driver AND the Python workers; absent ⇒ the v2 worker
    crashes at runtime, so gate on it. ``protobuf_compat.activate`` can
    supply the runtime via the aliasing shim (and ships it to the given
    session's workers through addPyFile) — only when neither a real
    install nor the shim's vendored runtime exists does this say no."""
    from us_flight_bigdata_dashboard_spark.streaming import protobuf_compat

    return protobuf_compat.activate(spark)


def streaming_streaks(stream: DataFrame, api: str = "auto") -> DataFrame:
    """Per-user streaks over the canonical event stream. Update mode: one
    row per (user, batch-with-events); the final row per user is the one
    with the highest n_events (strictly increasing per user).

    ``api``: "v2" = transformWithStateInPandas (typed ValueState), "v1" =
    applyInPandasWithState, "auto" = v2 when the runtime supports it
    (protobuf present), else v1. Both produce identical integer outputs —
    the exact gate passes under either, so the selection is a runtime
    capability question, not a semantics one."""
    cleaned = stream.filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select("user_id", "event_type", "ts", "event_id")
    if api == "auto":
        api = "v2" if has_state_v2(stream.sparkSession) else "v1"
    elif api == "v2" and not has_state_v2(stream.sparkSession):
        raise RuntimeError(
            "state API v2 requested but no protobuf runtime is available "
            "(neither installed nor supplied by the compatibility shim)"
        )
    if api == "v2":
        # transformWithState requires a multi-column-family state store:
        # Spark rejects HDFSBackedStateStoreProvider at query start, so
        # selecting v2 selects RocksDB (the at-scale provider the session
        # docstring recommends anyway; the provider conf is read per
        # streaming query at START time, hence set on the session here).
        stream.sparkSession.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        return cleaned.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=make_streak_processor(),
            outputStructType=STREAK_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return cleaned.groupBy("user_id").applyInPandasWithState(
        make_streak_worker(),
        outputStructType=STREAK_OUTPUT_SCHEMA,
        stateStructType=_STATE_STRUCT,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
