"""Gap detection (op G1) — missing-date islands.

Reference algorithm: domain/src/data_gap.rs:29-63 — walk the expected day
range, collect consecutive missing days into maximal DataGap runs.

Spark-first: date spine (`sequence` + `explode`, generated distributed) LEFT
ANTI JOIN present dates, then gaps-and-islands via row_number: consecutive
days share `d - rn * 1 day`. The spine for even a century is ~37k rows, so
the anti-join broadcasts the spine or the present set — either way no real
shuffle at any scale; the expensive side (present dates) arrives already
DISTINCT-aggregated (partial agg upstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def date_spine(spark_or_df, start: str, end: str) -> DataFrame:
    """One row per day in [start, end] (closed interval, like the reference's
    DateRange — date_range.rs:4-58)."""
    spark = spark_or_df if hasattr(spark_or_df, "range") else spark_or_df.sparkSession
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("d")
    )


def detect_gaps(present: DataFrame, start: str, end: str, date_col: str = "d") -> DataFrame:
    """Maximal runs of days in [start, end] absent from ``present``.

    Returns (gap_start DATE, gap_end DATE, days BIGINT) ordered by gap_start.
    """
    spark = present.sparkSession
    spine = date_spine(spark, start, end)
    present_d = present.select(F.col(date_col).cast("date").alias("d")).distinct()
    missing = spine.join(present_d, on="d", how="left_anti")
    # Islands: consecutive missing days have constant (d - rn days).
    rn = F.row_number().over(Window.orderBy("d"))
    grouped = missing.withColumn("rn", rn).withColumn(
        "island", F.expr("date_sub(d, rn)")
    )
    return (
        grouped.groupBy("island")
        .agg(
            F.min("d").alias("gap_start"),
            F.max("d").alias("gap_end"),
            F.count(F.lit(1)).alias("days"),
        )
        .drop("island")
        .orderBy("gap_start")
    )
