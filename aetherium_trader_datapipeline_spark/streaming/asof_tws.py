"""Streaming as-of enrichment on ``transformWithStateInPandas``.

The streaming form of the engine's as-of join family (operators/asof.py;
reference: replaying ticks against the latest prior book state): for each
"of interest" event, attach the latest PRIOR (inclusive, ts <= event ts)
matching event's timestamp for the same key — per key, one 8-byte
ValueState holding the running max prior timestamp, so state is O(keys)
regardless of stream length.

One shared sequential kernel (:func:`asof_step`) drives the streaming
processor AND the batch twin; tests additionally pin the batch twin
against the window-based ``asof_latest_prior`` operator, closing the
triangle stream == batch-kernel == declarative-window.  Tie rule matches
the operator's inclusive RANGE frame: at equal timestamps the prior row
is visible to the event, which the kernel realizes by sorting
(ts, is_of_interest, event_id) — priors before events at the same ts.

Delivery contract (same as dedup_tws): per-key event-time order across
micro-batches; the source must split on the time axis.
"""

from __future__ import annotations

# tws needs google.protobuf in driver AND workers; the vendored shim must
# be on PYTHONPATH before the SparkSession is built (see dedup_tws.py).
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

OUT_SCHEMA = "user_id LONG, event_id LONG, ts TIMESTAMP, prior_view TIMESTAMP"


def asof_step(last_prior_ms, rows):
    """rows: [(ts_ms, is_of_interest, event_id)] pre-sorted by
    (ts, is_of_interest, event_id). Returns ([(event_id, ts_ms,
    prior_ms)], new_last_prior_ms); events with no prior yet emit None."""
    out = []
    for ts_ms, is_evt, eid in rows:
        if is_evt:
            out.append((eid, ts_ms, last_prior_ms))
        elif last_prior_ms is None or ts_ms > last_prior_ms:
            last_prior_ms = ts_ms
    return out, last_prior_ms


def _rows_from_pdf(pdf: pd.DataFrame, of_interest_type: str, prior_type: str):
    pdf = pdf[pdf["event_type"].isin([of_interest_type, prior_type])].copy()
    pdf["__is_evt"] = (pdf["event_type"] == of_interest_type).astype("int64")
    pdf = pdf.sort_values(["ts", "__is_evt", "event_id"])
    ts_ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
    return list(zip(ts_ms.tolist(), pdf["__is_evt"].tolist(), pdf["event_id"].tolist()))


def _emit(uid, triples) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [uid] * len(triples),
            "event_id": [e for e, _, _ in triples],
            "ts": pd.to_datetime([t for _, t, _ in triples], unit="ms"),
            "prior_view": pd.to_datetime(
                [p for _, _, p in triples], unit="ms", errors="coerce"
            ),
        }
    )


class AsofEnrichProcessor(StatefulProcessor):
    def __init__(self, of_interest_type: str = "click", prior_type: str = "view"):
        self._evt = of_interest_type
        self._prior = prior_type

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState("last_prior", "last_ms LONG")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        chunks = [c for c in rows if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        seq = _rows_from_pdf(pdf, self._evt, self._prior)
        last = self._last.get()[0] if self._last.exists() else None
        out, last = asof_step(last, seq)
        if last is not None:
            self._last.update((last,))
        if out:
            yield _emit(uid, out)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def asof_enrich_stream(
    stream: DataFrame,
    of_interest_type: str = "click",
    prior_type: str = "view",
) -> DataFrame:
    """(user_id, ts, event_id, event_type) stream → of-interest events with
    their latest prior ts attached (NULL prior kept — callers filter)."""
    return (
        stream.select("user_id", "ts", "event_id", "event_type")
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .transformWithStateInPandas(
            AsofEnrichProcessor(of_interest_type, prior_type),
            StructType.fromDDL(OUT_SCHEMA),
            "Append",
            "EventTime",
        )
    )


def asof_enrich_batch(
    df: DataFrame,
    of_interest_type: str = "click",
    prior_type: str = "view",
) -> DataFrame:
    """Batch twin: whole per-key history through the SAME kernel."""

    evt, prior = of_interest_type, prior_type

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        seq = _rows_from_pdf(pdf, evt, prior)
        out, _ = asof_step(None, seq)
        return _emit(pdf["user_id"].iloc[0], out)

    return (
        df.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandas(fn, StructType.fromDDL(OUT_SCHEMA))
    )
