"""Streaming heavy hitters (Misra–Gries) on ``transformWithStateInPandas``.

The per-key top-talker question the reference's rate-limit/monitoring
plane asks ("which clients dominate this symbol's request stream" —
`rate_limiting/limiter.rs` keys its windows per client for the same
reason) answered with BOUNDED state: a Misra–Gries summary of k counters
per group tracks every item whose true frequency exceeds n/(k+1),
over-counting never and under-counting by at most n/(k+1) — the classic
deterministic guarantee (Misra & Gries 1982), unlike CMS (x188) which
over-counts.

One shared fold kernel (:func:`mg_fold`) drives BOTH the streaming
processor (MapState: one map entry per tracked item, ≤ k entries per
group — state is O(k), independent of stream length) and the batch twin
(`heavy_hitters_batch`, applyInPandas over the full history).  Stream ==
batch is a property of sharing the kernel plus event-time-ordered
delivery, the repo-wide stateful-op convention (see dedup_tws.py).

Output per micro-batch: the post-batch summary snapshot tagged with the
group's cumulative ``n_seen`` — monotone per key, so readers take the
max-n_seen row set per key as "current" (and tests compare exactly that
against the batch twin).
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
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.types import StructType

OUT_SCHEMA = "event_type STRING, item LONG, c_est LONG, n_seen LONG"


def mg_fold(counters: dict[int, int], items: list[int], k: int) -> dict[int, int]:
    """Misra–Gries update: tracked items increment; untracked items take a
    free slot if one exists, else EVERY counter decrements by one and the
    item is discarded (zero-count slots free up).  Deterministic for any
    iteration order — decrement applies to all counters symmetrically."""
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            counters = {w: c - 1 for w, c in counters.items() if c > 1}
    return counters


class HeavyHittersProcessor(StatefulProcessor):
    """Per-group Misra–Gries summary in MapState (≤ k entries) plus a
    cumulative item count in ValueState; emits the snapshot each batch."""

    def __init__(self, k: int):
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counters = handle.getMapState("mg", "item LONG", "c LONG")
        self._n = handle.getValueState("n_seen", "n LONG")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        chunks = [c for c in rows if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        items = pdf["user_id"].astype("int64").tolist()
        counters = {
            it[0]: c[0] for it, c in self._counters.iterator()
        }
        before = set(counters)
        counters = mg_fold(counters, items, self._k)
        n = (self._n.get()[0] if self._n.exists() else 0) + len(items)
        self._n.update((n,))
        for gone in before - set(counters):
            self._counters.removeKey((gone,))
        for it, c in counters.items():
            self._counters.updateValue((it,), (c,))
        yield pd.DataFrame(
            {
                "event_type": [etype] * len(counters),
                "item": list(counters.keys()),
                "c_est": list(counters.values()),
                "n_seen": [n] * len(counters),
            }
        )

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def heavy_hitters_stream(stream: DataFrame, k: int = 5) -> DataFrame:
    """(event_type, user_id, ts, event_id) stream → per-batch Misra–Gries
    snapshots.  One shuffle on event_type; RocksDB state store required."""
    return (
        stream.select("event_type", "user_id", "ts", "event_id")
        .withWatermark("ts", "10 minutes")
        .groupBy("event_type")
        .transformWithStateInPandas(
            HeavyHittersProcessor(k),
            StructType.fromDDL(OUT_SCHEMA),
            "Append",
            "EventTime",
        )
    )


def heavy_hitters_batch(df: DataFrame, k: int = 5) -> DataFrame:
    """Batch twin: the group's whole history folds through the SAME
    :func:`mg_fold` kernel in event-time order."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        items = pdf["user_id"].astype("int64").tolist()
        counters = mg_fold({}, items, k)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]] * len(counters),
                "item": list(counters.keys()),
                "c_est": list(counters.values()),
                "n_seen": [len(items)] * len(counters),
            }
        )

    return (
        df.select("event_type", "user_id", "ts", "event_id")
        .groupBy("event_type")
        .applyInPandas(fn, StructType.fromDDL(OUT_SCHEMA))
    )
