"""Rate-limit analytics (op R1, analytic form) + source admission control.

The reference enforces N sliding windows atomically in Redis Lua
(rate_limiting/limiter.lua:21-53; defaults limiter.rs:52-99: 60/600s,
6/2s, 1/15s). As a *query* over a request log that is exactly a COUNT
OVER a RANGE frame per account; as *ingestion admission control* in Spark
it is a source option (maxFilesPerTrigger / rowsPerSecond), provided by
``admission_options``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RateWindow:
    """limit requests per duration_s seconds (reference limiter.rs:52-99)."""

    limit: int
    duration_s: int


# Reference defaults (limiter.rs:80-97): IB pacing, contract, duplicate.
REFERENCE_WINDOWS = (RateWindow(60, 600), RateWindow(6, 2), RateWindow(1, 15))


def sliding_window_counts(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    windows: tuple[RateWindow, ...] = REFERENCE_WINDOWS,
) -> DataFrame:
    """Per row: trailing-window request counts + over-limit flags, one
    window spec per configured RateWindow (single shuffle on the keys; all
    frames share the same sort)."""
    out = df
    keys = ", ".join(key_cols)
    for rw in windows:
        n_col = f"n_{rw.duration_s}s"
        out = out.withColumn(
            n_col,
            F.expr(
                f"COUNT(*) OVER (PARTITION BY {keys} ORDER BY {ts_col} "
                f"RANGE BETWEEN INTERVAL {rw.duration_s} SECONDS PRECEDING AND CURRENT ROW)"
            ).cast("bigint"),
        ).withColumn(f"over_{rw.duration_s}s", (F.col(n_col) > rw.limit).cast("int"))
    return out


def admission_options(
    rows_per_second: int | None = None, max_files_per_trigger: int | None = None
) -> dict[str, str]:
    """Source-side admission control options — Spark's native equivalent of
    the reference's acquire-before-fetch gate (historical.rs:59-62)."""
    opts: dict[str, str] = {}
    if rows_per_second is not None:
        opts["rowsPerSecond"] = str(rows_per_second)
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    return opts
