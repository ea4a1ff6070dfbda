"""Custom stateful streaming operator: live local-level Kalman filter.

Streaming form of x501 — per key, the (x̂, P) scalar state carries
across micro-batches and every event emits its filtered estimate as it
arrives.  The update is the SAME IEEE op order as the batch fold
(operators/timeseries.kalman_local_level) and the x501 recursive-CTE
oracle:

    P' = P + q ; K = P'/(P' + r) ; x̂ += K(z − x̂) ; P = (1−K)P'

with x̂₁ = z₁, P₁ = r on each key's first observation — so the stream,
the batch operator, and the SQL oracle agree bit-for-bit (the
stream==batch pytest proves the first two; x501's oracle gate proves
the third).

State per key: two float64s + a seen flag — O(1), the denoised-price
estimator a live marking pipeline runs next to the raw feed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

_STATE_SCHEMA = StructType(
    [
        StructField("xh", DoubleType()),
        StructField("pv", DoubleType()),
        StructField("seen", LongType()),
    ]
)


def stateful_kalman(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    q: float = 0.25,
    r: float = 1.0,
) -> DataFrame:
    """One shuffle on ``key_cols``; emits (keys + order cols + xhat +
    pvar) per event, append mode."""

    qf = float(q)
    rf = float(r)
    out_schema = StructType(
        [stream.schema[c] for c in key_cols + order_cols]
        + [StructField("xhat", DoubleType()), StructField("pvar", DoubleType())]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            xh, pv, seen = state.get
        else:
            xh, pv, seen = 0.0, 0.0, 0
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(order_cols)
            xs, ps = [], []
            for z in pdf[value_col].tolist():
                if not seen:
                    xh, pv, seen = float(z), rf, 1
                else:
                    pp = pv + qf
                    kg = pp / (pp + rf)
                    xh = xh + kg * (float(z) - xh)
                    pv = (1.0 - kg) * pp
                xs.append(xh)
                ps.append(pv)
            res = pdf[list(key_cols) + list(order_cols)].copy()
            res["xhat"] = xs
            res["pvar"] = ps
            state.update((xh, pv, seen))
            yield res
        else:
            state.update((xh, pv, seen))

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
