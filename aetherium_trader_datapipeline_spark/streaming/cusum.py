"""Custom stateful streaming operator: live CUSUM changepoint alarms.

Streaming form of x217 — drift monitoring on a live tick stream: per key,
the two-sided integer CUSUM state ``(target, s_hi, s_lo, seen)`` carries
across micro-batches and each alarm row is emitted as it fires. The fold
is the SAME ``cusum_step`` kernel the batch operator uses
(operators/timeseries.py), with the chunk discipline from
streaming/anomaly.py: concatenate and sort a group's Arrow chunks once
before the order-sensitive fold. The target latches to the key's first
observed value (``seen`` flags whether the latch happened — 0 is a valid
target, so presence can't encode it).

State per key: four int64s — O(1), the reference's per-key admission-state
shape (limiter.rs:130-192) applied to drift monitoring.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from aetherium_trader_datapipeline_spark.operators.timeseries import cusum_step

_STATE_SCHEMA = StructType(
    [
        StructField("target", LongType()),
        StructField("s_hi", LongType()),
        StructField("s_lo", LongType()),
        StructField("seen", LongType()),
    ]
)


def stateful_cusum(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    k: int,
    h: int,
) -> DataFrame:
    """One shuffle on ``key_cols``; emits alarm rows (keys + order cols +
    direction) as they fire, append mode.

    Same ``k >= 0 and h > 0`` precondition as the batch
    :func:`~..operators.timeseries.cusum_flags` (latch-row == oracle seed)."""

    if k < 0 or h <= 0:
        raise ValueError(
            f"stateful_cusum requires k >= 0 and h > 0 (got k={k}, h={h})"
        )
    out_schema = StructType(
        [stream.schema[c] for c in key_cols + order_cols]
        + [StructField("direction", StringType())]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            target, s_hi, s_lo, seen = state.get
        else:
            target, s_hi, s_lo, seen = 0, 0, 0, 0
        st = [target, s_hi, s_lo]
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(order_cols)
            keep: list[int] = []
            dirs: list[str] = []
            for i, x in enumerate(pdf[value_col].tolist()):
                if not seen:
                    st = [x, 0, 0]
                    seen = 1
                d = cusum_step(st, x, k, h)
                if d is not None:
                    keep.append(i)
                    dirs.append(d)
            out = pdf[key_cols + order_cols].iloc[keep].copy()
            out["direction"] = dirs
            yield out
        state.update((st[0], st[1], st[2], seen))

    return stream.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        fn, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
