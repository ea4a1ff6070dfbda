"""Per-key activity ledger on ``transformWithStateInPandas`` — the
ListState/MapState counterpart to the ValueState operators (sessionizer,
dedup_tws, anomaly).

Keeps, per key: an append-only audit list of event ids (ListState) and a
running per-event-type tally (MapState), emitting one summary row per key
per micro-batch. This is the reference's job-audit posture
(`application/src/backfill_service.rs` records per-day progress rows; the
IDD control plane keeps per-worker tallies) expressed on Spark 4's
arbitrary-state API.

State posture (100 TB): ListState/MapState entries live in RocksDB and are
read back lazily (paged GET/ITERATOR under the hood) — the audit list
never materializes on the JVM heap; per-key cost is O(entries touched per
batch). Emission is per-batch summaries, so downstream sees fixed-width
rows regardless of ledger depth.
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

OUT_SCHEMA = (
    "user_id LONG, batch LONG, list_len LONG, list_sum LONG, "
    "map_size LONG, clicks LONG, had_views BOOLEAN, removed BOOLEAN"
)


class ActivityLedgerProcessor(StatefulProcessor):
    """Append event ids to the audit list, fold per-type counts into the
    tally, retire 'view' entries once counted (the tombstone path), and
    emit a summary probing every accessor — exists/append/put/iterate for
    lists, contains/get/update/remove/keys/iterator for maps."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._ids = handle.getListState("ids", "event_id LONG")
        self._counts = handle.getMapState("counts", "etype STRING", "n LONG")
        self._batch = handle.getValueState("batch", "b LONG")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        batch = (self._batch.get()[0] if self._batch.exists() else 0) + 1
        self._batch.update((batch,))
        for pdf in rows:
            if not len(pdf):  # tws may deliver empty Arrow chunks
                continue
            pdf = pdf.sort_values("event_id")
            ids = [(int(e),) for e in pdf["event_id"].tolist()]
            self._ids.appendValue(ids[0])
            if len(ids) > 1:
                self._ids.appendList(ids[1:])
            for et, cnt in pdf.groupby("event_type")["event_id"].count().items():
                prev = (
                    self._counts.getValue((et,))[0]
                    if self._counts.containsKey((et,))
                    else 0
                )
                self._counts.updateValue((et,), (prev + int(cnt),))
        had_views = self._counts.containsKey(("view",))
        if had_views:
            self._counts.removeKey(("view",))
        stored = [t[0] for t in self._ids.get()]
        map_items = {k[0]: v[0] for k, v in self._counts.iterator()}
        assert set(map_items) == {k[0] for k in self._counts.keys()}
        clicks = map_items.get("click", 0)
        yield pd.DataFrame(
            {
                "user_id": [uid],
                "batch": [batch],
                "list_len": [len(stored)],
                "list_sum": [sum(stored)],
                "map_size": [len(map_items)],
                "clicks": [clicks],
                "had_views": [had_views],
                "removed": [not self._counts.containsKey(("view",))],
            }
        )

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def ledger_stream(stream: DataFrame) -> DataFrame:
    """(event_id, user_id, event_type, ts) stream → per-batch ledger
    summaries. One shuffle on user_id; RocksDB state store required."""
    return (
        stream.withWatermark("ts", "1 minute")
        .groupBy("user_id")
        .transformWithStateInPandas(
            ActivityLedgerProcessor(),
            StructType.fromDDL(OUT_SCHEMA),
            "Append",
            "EventTime",
        )
    )
