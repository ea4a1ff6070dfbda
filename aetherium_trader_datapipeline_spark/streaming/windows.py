"""Streaming window analytics (streaming forms of Q29/Q30/Q31/Q32 + D1).

Each takes an event DataFrame (streaming or batch — the expressions are
identical, which is how the batch forms in queries.py double as oracles),
applies a watermark when streaming, and returns the windowed aggregate.
Late rows beyond the watermark are dropped by the engine — the explicit
late-data policy the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    duration: str = "1 hour",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, duration), key_col)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .select(F.col("window.start").alias("w"), key_col, "n", "sv")
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    duration: str = "10 minutes",
    slide: str = "1 minute",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, duration, slide), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w"), key_col, "n")
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Streaming session windows; batch oracle is operators.sessionize."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("t0"),
            F.col("session_window.end").alias("t_end"),
            key_col,
            "n",
        )
    )


def streaming_ohlcv(
    df: DataFrame,
    ts_col: str = "timestamp",
    key_col: str = "symbol",
    price_col: str = "last_price",
    size_col: str = "last_size",
    duration: str = "1 minute",
    watermark: str | None = "2 minutes",
) -> DataFrame:
    """Streaming K-bars (op O1 under Structured Streaming)."""
    src = _maybe_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, duration), key_col)
        .agg(
            F.min_by(price_col, ts_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, ts_col).alias("close"),
            F.sum(size_col).alias("vol"),
        )
        .select(F.col("window.start").alias("w"), key_col, "open", "high", "low", "close", "vol")
    )


def dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "15 seconds",
) -> DataFrame:
    """Streaming duplicate suppression (op D1 — the reference's
    1-req/15 s duplicate window, limiter.rs:58-60) with bounded state:
    duplicates arriving within the watermark horizon are dropped."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)
