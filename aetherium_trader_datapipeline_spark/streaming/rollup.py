"""Continuous OHLCV rollup table — a streaming-maintained "hypertable
continuous aggregate" (the docs' on-the-fly K-bar workload,
docs/…系統設計文件.md:69-72, persisted incrementally instead of recomputed).

Design: the rollup table stores MERGEABLE partials per (key, window):
(open_ts, open, high, low, close_ts, close, vol, n). Each micro-batch
computes its own partials, reads back ONLY the affected date partitions,
merges, and rewrites exactly those partitions (dynamic partition
overwrite). Cost per batch scales with the batch's date spread — at
100 TB a late-running backfill touches its own days, never the table.

min_by/max_by carry open/close through the merge: partials combine by
taking the value at the smaller open_ts / larger close_ts, which is
associative, so batch boundaries cannot change the result (asserted
stream == batch in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTIAL_COLS = ("open_ts", "open", "high", "low", "close_ts", "close", "vol", "n")


def ohlcv_partials(
    df: DataFrame, ts_col: str, key_col: str, value_col: str, bucket: str = "1 hour"
) -> DataFrame:
    w = F.window(F.col(ts_col), bucket)
    return (
        df.groupBy(w.alias("win"), F.col(key_col))
        .agg(
            F.min(ts_col).alias("open_ts"),
            F.expr(f"min_by({value_col}, {ts_col})").alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max(ts_col).alias("close_ts"),
            F.expr(f"max_by({value_col}, {ts_col})").alias("close"),
            F.sum(value_col).alias("vol"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("win.start").alias("w_start"),
            F.to_date("win.start").alias("d"),
            key_col,
            *PARTIAL_COLS,
        )
    )


def merge_partials(df: DataFrame, key_col: str) -> DataFrame:
    """Combine partials of the same (window, key) — associative merge."""
    return df.groupBy("w_start", "d", key_col).agg(
        F.min("open_ts").alias("open_ts"),
        F.expr("min_by(open, open_ts)").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max("close_ts").alias("close_ts"),
        F.expr("max_by(close, close_ts)").alias("close"),
        F.sum("vol").alias("vol"),
        F.sum("n").alias("n"),
    )


def _table_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence check for the rollup target.  Used INSTEAD of
    a broad try/except around the read-back: swallowing a transient read
    or schema failure as 'first batch' would dynamic-overwrite the
    affected partitions with batch-only partials, silently losing the
    previously merged state (r12 review) — a real failure must fail the
    batch so the checkpoint retries it."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _affected_dates_filter(dates):
    """Partition filter for the read-back.  NULL event times produce a
    d=NULL partition, and ``isin`` can never match NULL (NULL IN (...)
    is NULL) — without the explicit isNull arm each batch would replace
    the NULL-date partition with only its own data (r12 review)."""
    cond = F.col("d").isin([d for d in dates if d is not None])
    if any(d is None for d in dates):
        cond = cond | F.col("d").isNull()
    return cond


def _incremental_rollup_sink(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    partials_fn,
    merge_fn,
):
    """Shared foreachBatch scaffolding for incrementally maintained,
    date-partitioned rollup tables: per batch compute partials (must
    carry a ``d`` date column), read back ONLY the affected date
    partitions, merge, dynamic-partition-overwrite those days."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        part = partials_fn(batch_df)
        if not part.head(1):
            return
        dates = [r.d for r in part.select("d").distinct().collect()]
        if _table_exists(spark, target_dir):
            existing = spark.read.parquet(target_dir).where(
                _affected_dates_filter(dates)
            )
            merged = merge_fn(part.unionByName(existing))
        else:
            merged = merge_fn(part)
        (
            merged.repartition("d")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("d")
            .parquet(target_dir)
        )

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ohlcv_rollup_sink(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    bucket: str = "1 hour",
):
    """Start a foreachBatch query maintaining the rollup table at
    ``target_dir`` (parquet, partitioned by date)."""
    return _incremental_rollup_sink(
        stream,
        target_dir,
        checkpoint_dir,
        partials_fn=lambda b: ohlcv_partials(b, ts_col, key_col, value_col, bucket),
        merge_fn=lambda all_parts: merge_partials(all_parts, key_col),
    )


def theta_rollup_sink(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "user_id",
    k: int = 4096,
):
    """Continuous DISTINCT rollup: maintain one theta/KMV sketch row per
    day at ``target_dir`` (parquet, partitioned by ``d``), merged
    incrementally per micro-batch — the set-operation-capable sibling of
    the OHLCV sink above (daily distinct users, intersect/difference
    across ranges, all from metadata-sized rows).

    Per batch: sketch the batch per day, read back ONLY the affected
    date partitions, :func:`theta_merge`, dynamic-partition-overwrite
    those days.  KMV's lossless merge makes the maintained table
    BIT-IDENTICAL to a from-scratch daily sketch of all data regardless
    of batch boundaries (asserted stream == batch in tests) — there is
    no drift to re-sync, unlike count-ish incremental aggregates."""
    from aetherium_trader_datapipeline_spark.operators.sketches import (
        theta_merge,
        theta_sketch,
    )

    return _incremental_rollup_sink(
        stream,
        target_dir,
        checkpoint_dir,
        partials_fn=lambda b: theta_sketch(
            b.withColumn("d", F.to_date(ts_col)), ["d"], value_col, k=k
        ),
        merge_fn=lambda all_parts: theta_merge(all_parts, ["d"]),
    )
