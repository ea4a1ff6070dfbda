"""Time-ordered replay (op O2).

Reference docs: read ticks ORDER BY (symbol, timestamp) and stream them to
a consumer at controlled speed (docs/…系統設計文件.md:68,105-112).

- ``ordered_export``: the batch form — sorted scan for bulk export.
  `sortWithinPartitions` after `repartition(symbol)` keeps the sort local
  per symbol (no global sort barrier) when per-symbol order is what the
  consumer needs; pass ``global_order=True`` for a total order.
- ``paced_replay``: the streaming form — a rate source clocks the replay;
  each micro-batch joins the next slice of historical rows by row index,
  giving N rows/sec pacing with Spark-native backpressure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def ordered_export(
    df: DataFrame,
    key_col: str = "symbol",
    ts_col: str = "timestamp",
    global_order: bool = False,
) -> DataFrame:
    if global_order:
        return df.orderBy(key_col, ts_col)
    return df.repartition(key_col).sortWithinPartitions(key_col, ts_col)


def paced_replay(
    df: DataFrame,
    sink_fn,
    rows_per_second: int = 10,
    key_col: str = "symbol",
    ts_col: str = "timestamp",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Replay ``df`` through ``sink_fn(batch_df, batch_id)`` at
    ``rows_per_second``, in (key, ts) order.

    The rate source emits a monotone `value`; micro-batch N carries values
    [a, b) and we forward historical rows with row_index in [a, b) — the
    micro-batch trigger provides the clock, checkpointing provides
    exactly-once offsets over the replay.
    """
    spark = df.sparkSession
    # Exact global (key, ts) row index WITHOUT a single-task window over
    # the whole replay frame (the x442 class at a large lake): grid_rank
    # decomposes it as offsets-over-the-key-grid (bounded: one row per
    # symbol) + a key-partitioned rank (r11).
    from aetherium_trader_datapipeline_spark.operators.layout import grid_rank

    indexed = (
        # backtick-quote: grid_rank's bucket is a SQL EXPRESSION string,
        # so a reserved-word or spaced column name must be quoted to keep
        # the old Window.orderBy(name) resolution semantics
        grid_rank(df, f"`{key_col}`", [ts_col], "__rn")
        .withColumn("__idx", F.col("__rn") - 1)
        .drop("__rn")
        .cache()
    )
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )

    def emit(batch_df, batch_id: int) -> None:
        bounds = batch_df.agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).collect()[0]
        if bounds.lo is None:
            return
        slice_df = indexed.where(
            (F.col("__idx") >= bounds.lo) & (F.col("__idx") <= bounds.hi)
        ).drop("__idx")
        sink_fn(slice_df, batch_id)

    writer = rate.writeStream.foreachBatch(emit)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
