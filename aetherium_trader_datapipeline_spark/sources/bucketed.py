"""Bucketed-table helpers — shuffle-free co-located joins.

At 100 TB the dominant cost of fact-fact joins (orders ⨝ lineitem on
orderkey) is the shuffle. Writing both tables bucketed on the join key
lets Spark's planner use each side's bucketing as its output partitioning:
the sort-merge join reads co-located buckets with NO Exchange on either
side. That turns every subsequent join on that key into a scan-side merge
— the single biggest standing optimization a curated lake can buy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
