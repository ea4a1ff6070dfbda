"""Streaming tick-rule signed order flow on ``transformWithStateInPandas``.

The live twin of x315 (Lee–Ready zero-tick-rule classification): each
symbol carries (previous price, last nonzero sign, cumulative counters)
in ONE ValueState row, so classifying a tick is O(1) state regardless of
history length — where the batch form needs the full per-sym sort, the
stream needs six integers.  Signed cumulative flow is the input to
execution-cost models (x316's Kyle lambda regresses price changes on
exactly this flow), so keeping it live per symbol is the point of the
streaming form.

One shared integer fold kernel (:func:`flow_fold`) drives the streaming
processor, the batch twin (applyInPandas over full history), and — via
the test — the x315-shaped SQL window form: stream == batch == SQL on
identical integer-micro prices, the repo-wide stateful-op convention
(dedup_tws.py, heavy_hitters.py, asof_tws.py).

Semantics (matching x315 exactly): sign = +1 if price rose, −1 if it
fell; a zero-change tick inherits the LAST NONZERO sign; ticks before
any nonzero change (including each symbol's first) are unclassified.
Prices are integer micro-units end-to-end — no float enters the kernel.

Output per micro-batch: one cumulative snapshot row per symbol, tagged
with monotone ``n_trades`` (readers take the max-n_trades row per sym).
"""

from __future__ import annotations

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
    "sym LONG, n_trades LONG, n_buy LONG, n_sell LONG, n_unclassified LONG, "
    "signed_flow LONG"
)

# state tuple: (has_prev, last_px, last_sign, n_buy, n_sell, n_unc, flow)
EMPTY_STATE = (0, 0, 0, 0, 0, 0, 0)


def flow_fold(
    state: tuple[int, int, int, int, int, int, int], pxs: list[int]
) -> tuple[int, int, int, int, int, int, int]:
    """Fold integer micro-prices through the zero-tick rule.  Pure integer
    arithmetic; associative across chunks by construction (the state is
    exactly what the next chunk needs)."""
    has_prev, last_px, last_sign, nb, ns, nu, fl = state
    for px in pxs:
        if not has_prev:
            s = 0  # first-ever tick: no change to judge
        else:
            d = px - last_px
            if d > 0:
                s = 1
            elif d < 0:
                s = -1
            else:
                s = last_sign  # zero tick: inherit last nonzero (0 = none yet)
        if s == 1:
            nb += 1
        elif s == -1:
            ns += 1
        else:
            nu += 1
        fl += s
        if s != 0:
            last_sign = s
        has_prev, last_px = 1, px
    return (has_prev, last_px, last_sign, nb, ns, nu, fl)


class TickFlowProcessor(StatefulProcessor):
    """Per-sym cumulative tick-rule counters in one ValueState row."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState(
            "flow",
            "has_prev LONG, last_px LONG, last_sign LONG, n_buy LONG, "
            "n_sell LONG, n_unc LONG, flow LONG",
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (sym,) = key
        chunks = [c for c in rows if len(c)]
        if not chunks:
            return
        # concat BEFORE sorting: per-key micro-batch admission must be
        # globally event-time ordered even when Spark splits the key's
        # batch into several Arrow chunks (the dedup_tws lesson).
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        state = tuple(self._st.get()) if self._st.exists() else EMPTY_STATE
        state = flow_fold(state, pdf["px_micro"].astype("int64").tolist())
        self._st.update(state)
        _, _, _, nb, ns, nu, fl = state
        yield pd.DataFrame(
            {
                "sym": [sym],
                "n_trades": [nb + ns + nu],
                "n_buy": [nb],
                "n_sell": [ns],
                "n_unclassified": [nu],
                "signed_flow": [fl],
            }
        )

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def tick_flow_stream(stream: DataFrame) -> DataFrame:
    """(sym, ts, event_id, px_micro) stream → cumulative per-sym tick-rule
    snapshots.  One shuffle on sym; RocksDB state store required."""
    return (
        stream.select("sym", "ts", "event_id", "px_micro")
        .withWatermark("ts", "10 minutes")
        .groupBy("sym")
        .transformWithStateInPandas(
            TickFlowProcessor(),
            StructType.fromDDL(OUT_SCHEMA),
            "Append",
            "EventTime",
        )
    )


def tick_flow_batch(df: DataFrame) -> DataFrame:
    """Batch twin: full history per sym through the SAME kernel."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        _, _, _, nb, ns, nu, fl = flow_fold(
            EMPTY_STATE, pdf["px_micro"].astype("int64").tolist()
        )
        return pd.DataFrame(
            {
                "sym": [int(pdf["sym"].iloc[0])],
                "n_trades": [nb + ns + nu],
                "n_buy": [nb],
                "n_sell": [ns],
                "n_unclassified": [nu],
                "signed_flow": [fl],
            }
        )

    return (
        df.select("sym", "ts", "event_id", "px_micro")
        .groupBy("sym")
        .applyInPandas(fn, StructType.fromDDL(OUT_SCHEMA))
    )
