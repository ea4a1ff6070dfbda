"""K-bar / OHLCV aggregation — the reference system's signature query
workload (computed on the fly, never stored; reference
docs/…系統設計文件.md:69-72: tumble() + argMin/argMax/min/max).

Spark-first: a single groupBy with `min_by`/`max_by` — partial+final
aggregation (map-side combine) means the shuffle carries one row per
(key, bucket) per mapper, not the raw ticks. This is exactly the plan you
want at 100 TB; no window function, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlcv(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    price_col: str,
    size_col: str | None = None,
    bucket: str = "hour",
) -> DataFrame:
    """Candlesticks per (bucket, keys).

    ``bucket`` is a date_trunc unit ('minute'/'hour'/'day') — truncation
    keeps the output a plain timestamp column (SQL-oracle-friendly); use
    ``ohlcv_window`` for arbitrary N-minute buckets via window().
    """
    vol_src = size_col or price_col
    return (
        df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("w"), *key_cols)
        .agg(
            F.min_by(price_col, ts_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, ts_col).alias("close"),
            F.round(
                F.sum(F.col(vol_src).cast("decimal(14,4)")).cast("double"), 4
            ).alias("vol"),
        )
    )


def ohlcv_window(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    price_col: str,
    size_col: str | None = None,
    duration: str = "5 minutes",
) -> DataFrame:
    """Arbitrary-duration tumbling K-bars via window(); streaming-compatible
    (add a watermark upstream and this same expression runs under
    Structured Streaming)."""
    vol_src = size_col or price_col
    return (
        df.groupBy(F.window(F.col(ts_col), duration), *key_cols)
        .agg(
            F.min_by(price_col, ts_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, ts_col).alias("close"),
            F.sum(vol_src).alias("vol"),
        )
        .select(
            F.col("window.start").alias("w"), *key_cols, "open", "high", "low", "close", "vol"
        )
    )
