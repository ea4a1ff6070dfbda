"""Streaming CDC apply: a change stream merged into a keyed parquet table.

The reference's storage is append-only hourly files; a full platform also
consumes *change* feeds (order state, reference data) where the sink must
upsert, not append. Spark-first shape: ``foreachBatch`` + the batch
``merge_upsert`` operator (operators/merge.py) — each micro-batch is
deduped to last-writer-wins per key (by a sequence column), then applied
as a partition-scoped dynamic-overwrite upsert. Exactly-once comes from
the streaming checkpoint: a replayed batch re-applies the same idempotent
merge (tested in tests/test_merge_compact.py for the batch op, and in
tests/test_streaming.py for the stream path).

At 100 TB: each micro-batch rewrites only the partitions it touches;
state never accumulates in the streaming query itself (the table IS the
state), so the query's memory is O(batch), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def merge_stream(
    changes: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    partition_col: str,
    seq_col: str,
    delete_col: str | None = None,
    trigger_seconds: int = 5,
    available_now: bool = False,
) -> StreamingQuery:
    """Start a streaming query applying a CDC feed to a keyed table.

    ``seq_col`` orders changes globally: within a batch the highest seq
    per key wins (ties broken deterministically by a content hash), and
    the column is persisted in the table so a LATER micro-batch carrying
    an OLDER seq (out-of-order file arrival) cannot clobber newer state —
    merge_upsert compares it per key. ``delete_col`` marks tombstones.
    """
    from aetherium_trader_datapipeline_spark.operators.merge import merge_upsert

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # Last-writer-wins within the batch: highest seq per key; equal-seq
        # rows tie-break on a hash of the full row so replays pick the same
        # winner every time.
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), F.xxhash64(F.struct(*batch.columns))
        )
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        merge_upsert(
            batch.sparkSession,
            table_path,
            latest,
            key_cols=key_cols,
            partition_col=partition_col,
            delete_col=delete_col,
            seq_col=seq_col,
        )

    writer = changes.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
