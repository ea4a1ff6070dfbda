"""Sessionization (gaps-and-islands) — batch form of session windows.

Semantics: a new session starts when a row's ts exceeds the previous row's
ts (per key) by more than ``gap``. Output: one row per (key, session_id)
with count + bounds. This is the batch oracle for the streaming
``session_window`` form (streaming/windows.py).

Plan shape: one shuffle on the keys, two window passes over the same sort
order (Catalyst reuses the sort), then a partial+final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
    order_cols: list[str] | None = None,
) -> DataFrame:
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    marked = df.withColumn("__new_s", new_session)
    with_id = marked.withColumn("session_id", F.sum("__new_s").over(w))
    return (
        with_id.groupBy(*key_cols, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts_col).alias("t0"),
            F.max(ts_col).alias("t1"),
        )
        .orderBy(*key_cols, "session_id")
    )
