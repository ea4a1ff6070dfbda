"""Backfill planning (op P1) — resume-from-cursor day planning.

Reference: plan_days_to_process (application/src/backfill_service.rs:296-317)
unions {effective_start} with gap days, clips to the range, dedupes and
sorts; resume_start clips the range start to the cursor high-water mark
(backfill_service.rs:288-294). The cursor is a high-water mark that
backfill never advances past live ingestion (IDD.md:20-22).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.operators.gaps import detect_gaps


def resume_start(range_start: dt.date, cursor_ms: int | None) -> dt.date:
    """Clip the range start to the day of the cursor HWM (reference
    backfill_service.rs:288-294: resume from the cursor's day, inclusive —
    a partially ingested day is re-planned)."""
    if cursor_ms is None:
        return range_start
    cursor_day = dt.datetime.fromtimestamp(cursor_ms / 1000, tz=dt.timezone.utc).date()
    return max(range_start, cursor_day)


def plan_backfill_days(
    present: DataFrame,
    start: str,
    end: str,
    cursor_ms: int | None = None,
    date_col: str = "d",
) -> DataFrame:
    """Sorted distinct days to process: {effective_start} ∪ gap days,
    clipped to [effective_start, end]. Output: (d DATE)."""
    spark = present.sparkSession
    start_d = dt.date.fromisoformat(start)
    eff_start = resume_start(start_d, cursor_ms)
    gaps = detect_gaps(present, str(eff_start), end, date_col=date_col)
    gap_days = gaps.select(
        F.explode(
            F.sequence(F.col("gap_start"), F.col("gap_end"), F.expr("INTERVAL 1 DAY"))
        ).alias("d")
    )
    seed = spark.range(1).select(F.lit(str(eff_start)).cast("date").alias("d"))
    return (
        seed.unionByName(gap_days)
        .where(F.col("d").between(F.lit(str(eff_start)), F.lit(end)))
        .distinct()
        .orderBy("d")
    )
