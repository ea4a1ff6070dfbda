"""Custom stateful streaming operator: live average-cost PnL per key.

Streaming form of x213's average-cost accounting — the live-trading view
of the same book: every micro-batch folds its trades into per-key state
``(n, pos, cost, realized)`` via the SAME ``pnl_step`` kernel the batch
operator uses (operators/timeseries.py), and emits the key's current book
once per micro-batch. Batch == stream is therefore a property of sharing
one kernel, with the chunk-handling discipline from streaming/anomaly.py:
a group's rows can arrive as multiple Arrow chunks, so chunks are
concatenated and sorted ONCE before the order-sensitive fold runs.

State per key: four scalars — O(1), independent of stream length (the
reference's per-key admission-state shape, limiter.rs:130-192, applied to
position accounting).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from aetherium_trader_datapipeline_spark.operators.timeseries import pnl_step

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("pos", LongType()),
        StructField("cost", DoubleType()),
        StructField("realized", DoubleType()),
    ]
)


def stateful_pnl(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    side_col: str = "side",
    qty_col: str = "qty",
    price_col: str = "p",
) -> DataFrame:
    """One shuffle on ``key_cols``; emits each key's running book once per
    micro-batch (append mode): n_trades, pos, cost, realized."""

    out_schema = StructType(
        [stream.schema[c] for c in key_cols]
        + [
            StructField("n_trades", LongType()),
            StructField("pos", LongType()),
            StructField("cost", DoubleType()),
            StructField("realized", DoubleType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = list(state.get) if state.exists else [0, 0, 0.0, 0.0]
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(order_cols)
            for side, q, p in zip(
                pdf[side_col].tolist(), pdf[qty_col].tolist(), pdf[price_col].tolist()
            ):
                pnl_step(st, side, q, p)
            yield pd.DataFrame(
                [list(key) + st],
                columns=key_cols + ["n_trades", "pos", "cost", "realized"],
            )
        state.update(tuple(st))

    return stream.groupBy(*[F.col(k) for k in key_cols]).applyInPandasWithState(
        fn, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
