"""Custom stateful streaming operator: multi-window rate-limit admission.

Reimplements the reference's R1 sliding-window rate limiter
(`infrastructure/src/rate_limiting/limiter.rs:130-192`, `limiter.lua:21-53`)
as a Structured Streaming stateful operator via ``applyInPandasWithState``.

Semantics (matching the Lua script): for each key, requests are admitted
in timestamp order; a request is admitted iff EVERY window (limit, dur)
currently holds fewer than ``limit`` admitted requests in
``(t - dur, t]``. Only *admitted* requests occupy window slots — a denied
request leaves no trace (`limiter.lua:44-49` only ZADDs after all checks
pass). That sequential dependence is why this is a stateful operator and
not the window-count query (q30/x51): COUNT(*) OVER RANGE counts every
event, admitted or not.

State per key: the timestamps of admitted requests still inside the
longest window — bounded by sum(limit_i), not by stream length.

The same kernel runs in batch via ``applyInPandas`` (``rate_limit_batch``)
— used as the oracle for the streaming path and exposed as a registry
query. At 100 TB scale the stream shuffles once on the key; state per key
is O(sum of limits) and the watermark bounds replay.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

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


@dataclass(frozen=True)
class RateWindow:
    limit: int
    duration_s: int


DEFAULT_WINDOWS = (  # reference defaults, limiter.rs:80-97
    RateWindow(60, 600),  # long window: 60 req / 600 s
    RateWindow(6, 2),  # contract window: 6 req / 2 s
    RateWindow(1, 15),  # duplicate window: 1 req / 15 s
)

_STATE_SCHEMA = StructType([StructField("admitted_ms", ArrayType(LongType()))])


def _admit_kernel(
    ts_ms: list[int], admitted_ms: list[int], windows: tuple[RateWindow, ...]
) -> tuple[list[bool], list[int]]:
    """Sequential admission over ts-ordered requests. Returns per-request
    verdicts and the surviving admitted-timestamp state."""
    max_dur_ms = max(w.duration_s for w in windows) * 1000
    state = list(admitted_ms)
    verdicts: list[bool] = []
    for t in ts_ms:
        # evict everything outside the longest window (ZREMRANGEBYSCORE)
        state = [s for s in state if s > t - max_dur_ms]
        ok = all(
            sum(1 for s in state if s > t - w.duration_s * 1000) < w.limit for w in windows
        )
        verdicts.append(ok)
        if ok:
            state.append(t)
    return verdicts, state


def stateful_rate_limit(
    stream: DataFrame,
    ts_col: str,
    key_cols: list[str],
    windows: tuple[RateWindow, ...] = DEFAULT_WINDOWS,
) -> DataFrame:
    """Streaming form: one shuffle on ``key_cols``; admitted-timestamp
    state carries across micro-batches via GroupState."""
    key_fields = [stream.schema[k] for k in key_cols]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("ts", stream.schema[ts_col].dataType),
            StructField("admitted", BooleanType()),
        ]
    )
    win = tuple(windows)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = list(state.get[0] or []) if state.exists else []
        # a group's rows can arrive as multiple Arrow chunks in arbitrary
        # order — concatenate and sort ONCE, or the sequential admission
        # walk diverges from the batch kernel for >10k-event micro-batches
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(ts_col)
            ts_ms = pdf[ts_col].to_numpy().astype("datetime64[ms]").astype("int64").tolist()
            verdicts, prev = _admit_kernel(ts_ms, prev, win)
            out = pd.DataFrame({k: pdf[kc].to_numpy() for k, kc in zip(key_cols, key_cols)})
            out["ts"] = pdf[ts_col].to_numpy()
            out["admitted"] = verdicts
            yield out
        state.update((prev,))

    return (
        stream.groupBy(*[F.col(k) for k in key_cols])
        .applyInPandasWithState(
            fn, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


def rate_limit_batch(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    windows: tuple[RateWindow, ...] = DEFAULT_WINDOWS,
) -> DataFrame:
    """Batch form of the same kernel (applyInPandas): the whole history of
    a key arrives as one group. Oracle for the streaming path."""
    key_fields = [df.schema[k] for k in key_cols]
    out_schema = StructType(
        list(key_fields)
        + [
            StructField("ts", df.schema[ts_col].dataType),
            StructField("admitted", BooleanType()),
        ]
    )
    win = tuple(windows)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        ts_ms = pdf[ts_col].to_numpy().astype("datetime64[ms]").astype("int64").tolist()
        verdicts, _ = _admit_kernel(ts_ms, [], win)
        out = pdf[key_cols].copy()
        out["ts"] = pdf[ts_col].to_numpy()
        out["admitted"] = verdicts
        return out

    return df.groupBy(*[F.col(k) for k in key_cols]).applyInPandas(fn, out_schema)
