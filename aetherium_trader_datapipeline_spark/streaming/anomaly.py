"""Custom stateful streaming operator: trailing-window 3-sigma flags.

Streaming form of the x161 rolling-anomaly query: per key, keep the last
``window`` values (as integer cents) and flag an event when its deviation
from the trailing mean exceeds ``z`` standard deviations. The test is the
cross-multiplied integer inequality

    (n·x − s)² > z²·(n·ss − s²)      n = trailing count, s = Σx, ss = Σx²

so the kernel does no float arithmetic at all — batch, stream, and the
SQL window form (x161 / the x171 oracle) agree bit-for-bit. Warm-up keys
(n < ``min_n``) never flag.

State per key: at most ``window`` int64s — bounded, independent of stream
length. At scale the stream shuffles once on the key; this is the same
shape as the reference's per-key admission state
(`infrastructure/src/rate_limiting/limiter.rs:130-192`), reused for
monitoring instead of throttling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType([StructField("tail_cents", ArrayType(LongType()))])


def _zflag_kernel(
    xs: list[int], prev: list[int], window: int, min_n: int, z: int
) -> tuple[list[bool], list[int]]:
    """Sequential flags over value-ordered events; returns flags and the
    surviving trailing-value state (last ``window`` values). Rolling
    Σx/Σx² updates (exact integers — add incoming, subtract evicted) keep
    this O(n) instead of O(n·window); results are bit-identical to the
    recompute-per-event form."""
    from collections import deque

    state = deque(prev[-window:] if len(prev) > window else prev)
    s = sum(state)
    ss = sum(v * v for v in state)
    flags: list[bool] = []
    z2 = z * z
    for x in xs:
        n = len(state)
        if n >= min_n:
            flags.append((n * x - s) ** 2 > z2 * (n * ss - s * s))
        else:
            flags.append(False)
        state.append(x)
        s += x
        ss += x * x
        if len(state) > window:
            old = state.popleft()
            s -= old
            ss -= old * old
    return flags, list(state)


def _cents(df: DataFrame, value_col: str) -> DataFrame:
    # decimal-then-scale so the int is exact for 2-dp doubles (repo float policy)
    return df.withColumn(
        "_xc", (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    )


def _out_schema(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> StructType:
    fields = [df.schema[c] for c in key_cols + order_cols]
    return StructType(list(fields) + [StructField("flagged", BooleanType())])


def stateful_anomaly(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window: int = 50,
    min_n: int = 20,
    z: int = 3,
) -> DataFrame:
    """Streaming form: one shuffle on ``key_cols``; the trailing-value
    state carries across micro-batches via GroupState. A group's rows can
    arrive as MULTIPLE Arrow chunks in arbitrary order (split at
    arrow.maxRecordsPerBatch), so the chunks are concatenated and sorted
    ONCE before the order-sensitive kernel runs — per-chunk sorting would
    silently break stream==batch for keys with >10k events per
    micro-batch. Cross-batch order is the source's replay order
    (time-ordered for our sources)."""
    out_schema = _out_schema(stream, key_cols, order_cols)
    src = _cents(stream, value_col)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = list(state.get[0] or []) if state.exists else []
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(order_cols)
            flags, prev = _zflag_kernel(
                pdf["_xc"].tolist(), prev, window, min_n, z
            )
            out = pdf[key_cols + order_cols].copy()
            out["flagged"] = flags
            yield out
        state.update((prev,))

    return src.groupBy(*[F.col(k) for k in key_cols]).applyInPandasWithState(
        fn, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def anomaly_batch(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window: int = 50,
    min_n: int = 20,
    z: int = 3,
) -> DataFrame:
    """Batch form of the same kernel (applyInPandas over full history) —
    the oracle for the streaming path and the x171 registry query."""
    out_schema = _out_schema(df, key_cols, order_cols)
    src = _cents(df, value_col)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        flags, _ = _zflag_kernel(pdf["_xc"].tolist(), [], window, min_n, z)
        out = pdf[key_cols + order_cols].copy()
        out["flagged"] = flags
        return out

    return src.groupBy(*[F.col(k) for k in key_cols]).applyInPandas(fn, out_schema)
