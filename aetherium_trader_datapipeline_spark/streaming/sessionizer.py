"""Streaming sessionization via ``transformWithStateInPandas`` (Spark 4
arbitrary-state API) — event-time timers close idle sessions.

Semantics match the batch gaps-and-islands formulation (q31 / SURVEY §2.2
Q31): per key, consecutive events belong to one session while the gap
between neighbors is ≤ ``gap``; a session is emitted once the event-time
watermark passes ``session_end + gap`` (an event-time timer fires), or
immediately when a new event arrives more than ``gap`` after the current
session's end (the session is provably closed — nothing on-time can extend
it once a later event exists).

Why ``transformWithState`` and not the built-in ``session_window``: the
built-in emits only (window, aggregates); a custom processor carries
arbitrary per-session payload (first/last values, counts, sums — extend
``_SESS_SCHEMA``) and controls emission timing via timers, which is the
shape the reference's control-plane operators need (heartbeat/stall
detection, H1, `application/src/backfill_service.rs:13,127-128`, is "no
event before timer fires" — exactly an event-time timer).

Scale notes (100 TB): one shuffle on the key; per-key state is a single
fixed-width session row in the RocksDB state store regardless of session
length (aggregates are folded in-place, events are never buffered);
watermark bounds replay and timer count is ≤ one per live key.
"""

from __future__ import annotations

# tws (transformWithStateInPandas) serializes state over the protobuf wire
# format; in environments without the google.protobuf runtime the vendored
# pure-Python shim must be on sys.path/PYTHONPATH BEFORE the SparkSession
# is built (workers inherit PYTHONPATH through the JVM).  Importing this
# module early is enough; activate() is a no-op when real protobuf exists.
from aetherium_trader_datapipeline_spark._vendor import protoshim as _protoshim

_protoshim.activate()

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.types import StructType

_SESS_SCHEMA = "start_ms LONG, end_ms LONG, n LONG, sum_value DOUBLE"

OUT_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events LONG, sum_value DOUBLE"
)


def _emit(key: int, s: tuple) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key],
            "session_start": [pd.Timestamp(s[0], unit="ms")],
            "session_end": [pd.Timestamp(s[1], unit="ms")],
            "n_events": [s[2]],
            "sum_value": [s[3]],
        }
    )


class SessionProcessor(StatefulProcessor):
    """Per-key open-session accumulator with an event-time close timer."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", _SESS_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        cur = self._sess.get() if self._sess.exists() else None
        old_timer = cur[1] + self._gap_ms if cur is not None else None
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            ts_ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
            for t, v in zip(ts_ms.tolist(), pdf["value"].tolist()):
                if cur is None:
                    cur = (t, t, 1, float(v))
                elif t - cur[1] <= self._gap_ms:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(v))
                else:
                    yield _emit(uid, cur)  # closed by a later on-time event
                    cur = (t, t, 1, float(v))
        if cur is not None:
            self._sess.update(cur)
            new_timer = cur[1] + self._gap_ms
            if old_timer is not None and old_timer != new_timer:
                self._handle.deleteTimer(old_timer)
            if old_timer != new_timer:
                self._handle.registerTimer(new_timer)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        cur = self._sess.get() if self._sess.exists() else None
        # fire only if the session is still the one the timer was set for
        if cur is not None and cur[1] + self._gap_ms <= expiredTimerInfo.getExpiryTimeInMs():
            yield _emit(key[0], cur)
            self._sess.clear()

    def close(self) -> None:
        pass


def sessionize_stream(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events stream (user_id, ts, value) → completed-session stream.

    One shuffle on user_id; requires the RocksDB state store (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` on the session).
    """
    gap_ms = _duration_ms(gap)
    return (
        stream.select("user_id", "ts", "value")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionProcessor(gap_ms),
            StructType.fromDDL(OUT_SCHEMA),
            "Append",
            "EventTime",
        )
    )


def sessionize_stream_gs(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Same sessionization semantics on the ``applyInPandasWithState``
    API (GroupState + EventTimeTimeout) — no protobuf dependency, runs on
    any Spark 3.4+; `sessionize_stream` is the Spark-4 timer-API form.

    A key's state times out once the watermark passes the session end +
    gap (``setTimeoutTimestamp``), which is exactly the close-timer
    condition of the TWS version.
    """
    import pandas as _pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = _duration_ms(gap)
    out_schema = StructType.fromDDL(OUT_SCHEMA)
    state_schema = StructType.fromDDL(_SESS_SCHEMA)

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            s = state.get
            state.remove()
            yield _emit(uid, s)
            return
        cur = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            ts_ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
            for t, v in zip(ts_ms.tolist(), pdf["value"].tolist()):
                if cur is None:
                    cur = (t, t, 1, float(v))
                elif t - cur[1] <= gap_ms:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(v))
                else:
                    yield _emit(uid, cur)
                    cur = (t, t, 1, float(v))
        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(cur[1] + gap_ms)

    return (
        stream.select("user_id", "ts", "value")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def sessionize_batch_oracle(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch gaps-and-islands sessions (same payload) — the oracle."""
    gap_ms = _duration_ms(gap)
    from pyspark.sql.window import Window

    order = ["ts", "event_id"] if "event_id" in events.columns else ["ts"]
    win = Window.partitionBy("user_id").orderBy(*order)
    stepped = events.withColumn(
        "prev_ms", F.lag((F.col("ts").cast("double") * 1000).cast("long")).over(win)
    )
    stepped = stepped.withColumn(
        "new_s",
        F.when(
            F.col("prev_ms").isNull()
            | ((F.col("ts").cast("double") * 1000).cast("long") - F.col("prev_ms") > gap_ms),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessioned = stepped.withColumn("session_id", F.sum("new_s").over(win))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def _duration_ms(text: str) -> int:
    qty, unit = text.split()
    mult = {
        "millisecond": 1,
        "milliseconds": 1,
        "second": 1000,
        "seconds": 1000,
        "minute": 60_000,
        "minutes": 60_000,
        "hour": 3_600_000,
        "hours": 3_600_000,
    }[unit]
    return int(qty) * mult
