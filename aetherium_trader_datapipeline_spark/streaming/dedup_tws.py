"""Streaming duplicate suppression on ``transformWithStateInPandas``.

Reference semantics: the ingestion rate limiter's *duplicate request
window* — at most ONE admitted request per key per window
(`ingestion/infrastructure/src/rate_limiting/limiter.rs:92-97`, default
1 / 15 s; comment `:59-60`). This re-expresses that admission rule on
Spark 4's arbitrary-state API: per key, an arrival is emitted iff no
arrival was emitted in the preceding ``window`` of EVENT time.

Equivalence contract: identical to the batch form
``operators.ratelimit.rate_limit_batch(windows=[RateWindow(1, w)])``
restricted to admitted rows — one shared greedy recurrence (last admitted
timestamp), proven stream == batch in tests/test_dedup_tws.py.

State posture (100 TB): one 8-byte last-admit timestamp per live key in
the RocksDB store, TTL-bounded — ``state_ttl_ms`` (processing-time TTL,
default 1 h) garbage-collects keys that stop arriving, so state size
tracks the ACTIVE key set, not the historical one. The TTL is a safety
bound, not a semantic: admission decisions compare event times only, so
results are deterministic under replay regardless of wall-clock pacing.
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

OUT_SCHEMA = "user_id LONG, ts TIMESTAMP, event_id LONG"


def admit_indices(ts_ms: list[int], last: int | None, window_ms: int):
    """Shared greedy kernel: indices admitted (gap from last ADMITTED
    arrival >= window) and the new last-admit timestamp. One function used
    by both the streaming processor and the batch twin — stream == batch
    is a property of sharing the kernel, not of two implementations
    agreeing (the repo-wide stateful-op pattern)."""
    keep: list[int] = []
    for i, t in enumerate(ts_ms):
        if last is None or t - last >= window_ms:
            keep.append(i)
            last = t
    return keep, last


class DupSuppressProcessor(StatefulProcessor):
    """Keyed 1-per-window admission: emit iff event-time gap from the last
    ADMITTED arrival >= window (suppressed arrivals leave no trace — the
    same no-trace-on-deny rule as limiter.lua's duplicate window)."""

    def __init__(self, window_ms: int, state_ttl_ms: int | None):
        self._window_ms = window_ms
        self._ttl_ms = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState(
            "last_admit", "last_ms LONG", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        last = self._last.get()[0] if self._last.exists() else None
        # Concatenate the key's Arrow chunks BEFORE sorting: Spark may split
        # one micro-batch's rows for a key across several chunks in arbitrary
        # order, and the greedy admit kernel is order-sensitive — per-chunk
        # sorting would only be locally ordered and could diverge from
        # dup_suppress_batch (which sorts the whole group). One global sort
        # per key per micro-batch keeps stream == batch unconditionally.
        chunks = [c for c in rows if len(c)]
        pdf = pd.concat(chunks, ignore_index=True) if chunks else None
        if pdf is not None:
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
            keep, last = admit_indices(ts_ms.tolist(), last, self._window_ms)
            if keep:
                yield pdf[["user_id", "ts", "event_id"]].iloc[keep]
        if last is not None:
            self._last.update((last,))

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def dup_suppress_stream(
    stream: DataFrame,
    window: str = "15 seconds",
    state_ttl_ms: int | None = 3_600_000,
) -> DataFrame:
    """(user_id, ts, event_id) stream → admitted-arrival stream.

    One shuffle on user_id; RocksDB state store required (tws API).
    ``window`` accepts '<n> seconds/minutes/hours'.
    """
    from aetherium_trader_datapipeline_spark.streaming.sessionizer import _duration_ms

    return (
        stream.select("user_id", "ts", "event_id")
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .transformWithStateInPandas(
            DupSuppressProcessor(_duration_ms(window), state_ttl_ms),
            StructType.fromDDL(OUT_SCHEMA),
            "Append",
            "EventTime",
        )
    )


def dup_suppress_batch(df: DataFrame, window: str = "15 seconds") -> DataFrame:
    """Batch twin: the whole history of a key arrives as one group and the
    SAME :func:`admit_indices` kernel folds it (applyInPandas)."""
    from aetherium_trader_datapipeline_spark.streaming.sessionizer import _duration_ms

    window_ms = _duration_ms(window)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
        keep, _ = admit_indices(ts_ms.tolist(), None, window_ms)
        return pdf[["user_id", "ts", "event_id"]].iloc[keep]

    return (
        df.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandas(fn, StructType.fromDDL(OUT_SCHEMA))
    )
