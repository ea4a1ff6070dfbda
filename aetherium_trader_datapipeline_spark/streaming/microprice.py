"""Live microstructure accumulator on ``transformWithStateInPandas``.

The streaming twin of x384 (Roll implied spread) and x386 (realized
semivariance / bipower variation): where the batch forms need the full
per-sym (ts, event_id) sort each run, the live form carries ONE
fixed-width integer state row per symbol — (last price, last price
change, and eight exact moment sums) — and updates in O(1) per tick.
An execution desk reads the spread/variance estimate mid-session; these
are exactly the statistics whose batch recomputation cost grows with
the session (x384/x386 measured ~15 s per full 100× re-scan) while the
streaming increment is constant.

One shared integer fold kernel (:func:`micro_fold`) drives the
streaming processor, the batch twin, and — via the test — the
x384/x386-shaped SQL window forms: stream == batch == SQL proven on
identical integer-micro prices with INTEGER-ONLY comparisons (the
covariance identity m1²·cov = m1·Σ(dp·dp₁) − Σdp·Σdp₁ avoids floats
entirely in the parity check), the repo-wide stateful-op convention
(dedup_tws.py, heavy_hitters.py, asof_tws.py, tickflow.py).

Prices are integer micro-units; all sums are exact Python ints in the
kernel and LONGs in state.  Headroom note: dp² terms are ~1e12 per
tick at the fixture's tick sizes, so the int64 state column caps a
per-symbol session at ~9×10⁶ ticks — beyond that the state row should
widen to DECIMAL(38,0) columns; the kernel itself (Python int) never
overflows.

Reference scope: trade-only spread estimation is the reference's data
reality (parquet.rs:28-43 stores no quotes); SURVEY §2 wave 101 has the
estimator derivations.
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
    "sym LONG, n_ticks LONG, n_rets LONG, n_lag_pairs LONG, "
    "sum_dp LONG, sum_dp2 LONG, sum_up2 LONG, sum_dn2 LONG, "
    "sum_dpdp1 LONG, sum_a LONG, sum_b LONG, sum_bp LONG"
)

STATE_SCHEMA = (
    "has_px LONG, last_px LONG, has_dp LONG, last_dp LONG, "
    "n_ticks LONG, n_rets LONG, n_pairs LONG, "
    "sum_dp LONG, sum_dp2 LONG, sum_up2 LONG, sum_dn2 LONG, "
    "sum_dpdp1 LONG, sum_a LONG, sum_b LONG, sum_bp LONG"
)

EMPTY_STATE = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)


def micro_fold(state: tuple, pxs: list[int]) -> tuple:
    """Fold integer micro-prices into the microstructure moment sums.
    Chunk-associative by construction: the state carries exactly the
    boundary information (last price + last price change) the next
    chunk needs."""
    (has_px, last_px, has_dp, last_dp, n, nr, m1,
     s_dp, s_dp2, s_up2, s_dn2, s_c1, s_a, s_b, s_bp) = state
    for px in pxs:
        n += 1
        if has_px:
            dp = px - last_px
            nr += 1
            s_dp += dp
            s_dp2 += dp * dp
            if dp > 0:
                s_up2 += dp * dp
            elif dp < 0:
                s_dn2 += dp * dp
            if has_dp:
                m1 += 1
                s_c1 += dp * last_dp
                s_a += dp
                s_b += last_dp
                s_bp += abs(dp) * abs(last_dp)
            last_dp, has_dp = dp, 1
        last_px, has_px = px, 1
    return (has_px, last_px, has_dp, last_dp, n, nr, m1,
            s_dp, s_dp2, s_up2, s_dn2, s_c1, s_a, s_b, s_bp)


def _emit(sym: int, state: tuple) -> pd.DataFrame:
    (_hp, _lp, _hd, _ld, n, nr, m1,
     s_dp, s_dp2, s_up2, s_dn2, s_c1, s_a, s_b, s_bp) = state
    return pd.DataFrame(
        {
            "sym": [sym], "n_ticks": [n], "n_rets": [nr], "n_lag_pairs": [m1],
            "sum_dp": [s_dp], "sum_dp2": [s_dp2], "sum_up2": [s_up2],
            "sum_dn2": [s_dn2], "sum_dpdp1": [s_c1], "sum_a": [s_a],
            "sum_b": [s_b], "sum_bp": [s_bp],
        }
    )


class MicrostructureProcessor(StatefulProcessor):
    """Per-sym microstructure moment sums in one ValueState row."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("micro", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (sym,) = key
        chunks = [c for c in rows if len(c)]
        if not chunks:
            return
        # concat BEFORE sorting (the dedup_tws lesson): the key's batch
        # may arrive as several Arrow chunks
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        state = tuple(self._st.get()) if self._st.exists() else EMPTY_STATE
        state = micro_fold(state, pdf["px_micro"].astype("int64").tolist())
        self._st.update(state)
        yield _emit(sym, state)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return iter(())

    def close(self) -> None:
        pass


def microstructure_stream(stream: DataFrame) -> DataFrame:
    """(sym, ts, event_id, px_micro) stream → cumulative per-sym
    microstructure moment snapshots.  One shuffle on sym; RocksDB state
    store required."""
    return (
        stream.select("sym", "ts", "event_id", "px_micro")
        .withWatermark("ts", "10 minutes")
        .groupBy("sym")
        .transformWithStateInPandas(
            MicrostructureProcessor(),
            StructType.fromDDL(OUT_SCHEMA),
            "Append",
            "EventTime",
        )
    )


def microstructure_batch(df: DataFrame) -> DataFrame:
    """Batch twin: full history per sym through the SAME kernel."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        state = micro_fold(
            EMPTY_STATE, pdf["px_micro"].astype("int64").tolist()
        )
        return _emit(int(pdf["sym"].iloc[0]), state)

    return (
        df.select("sym", "ts", "event_id", "px_micro")
        .groupBy("sym")
        .applyInPandas(fn, StructType.fromDDL(OUT_SCHEMA))
    )
