"""Custom stateful streaming operator: live additive Holt–Winters.

Streaming twin of x481's batch fold — the richest state any kernel in
this repo carries: level, trend, a 24-slot seasonal ring, and the step
counter all persist in GroupState, and every bar emits its smoothed
(level, trend, seasonal, one-step forecast) as it arrives.  The update
order is byte-identical to operators/timeseries.holt_winters_additive
(exact binary-fraction constants, warm-up passthrough for the first
season), so stream == batch bit-for-bit across micro-batch boundaries —
proven by the parity pytest, while x481's recursive-CTE oracle pins the
same recurrence against DuckDB.

State per key: 2 + 24 float64 + 1 int64 — O(season), the live seasonal
baseline a monitoring pipeline subtracts before alerting on residuals.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("lvl", DoubleType()),
        StructField("trd", DoubleType()),
        StructField("season", ArrayType(DoubleType())),
        StructField("i", LongType()),
    ]
)


def stateful_holt_winters(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    season_len: int = 24,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> DataFrame:
    """One shuffle on ``key_cols``; emits per-bar (keys + order cols +
    level/trend/seasonal/fc), append mode."""

    m = int(season_len)
    a, g, sg = float(alpha), float(beta), float(gamma)
    b, h, sh = 1.0 - a, 1.0 - g, 1.0 - sg
    out_schema = StructType(
        [stream.schema[c] for c in key_cols + order_cols]
        + [
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("seasonal", DoubleType()),
            StructField("fc", DoubleType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lvl, trd, season, i = state.get
            season = list(season)
        else:
            lvl, trd, season, i = 0.0, 0.0, [0.0] * m, 0
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(order_cols)
            lv, tr, se, fcs = [], [], [], []
            for x in pdf[value_col].tolist():
                x = float(x)
                i += 1
                slot = (i - 1) % m
                if i <= m:
                    lvl = x
                    trd = 0.0
                else:
                    s_old = season[slot]
                    l_new = a * (x - s_old) + b * (lvl + trd)
                    trd = g * (l_new - lvl) + h * trd
                    season[slot] = sg * (x - l_new) + sh * s_old
                    lvl = l_new
                lv.append(lvl)
                tr.append(trd)
                se.append(season[slot])
                fcs.append(lvl + trd + season[i % m])
            res = pdf[list(key_cols) + list(order_cols)].copy()
            res["level"] = lv
            res["trend"] = tr
            res["seasonal"] = se
            res["fc"] = fcs
            state.update((lvl, trd, season, i))
            yield res
        else:
            state.update((lvl, trd, season, i))

    return (
        stream.groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
