"""Keyed merge-upsert and small-file compaction on plain parquet tables.

The reference's storage layer appends immutable hourly files
(`repositories/parquet.rs:45-57`) and relies on instance-stamped filenames
for idempotent re-runs (IDD `:181,227`). A full pipeline also needs the two
table-maintenance operations that layer on top:

- **merge_upsert** — CDC-style upsert of a change batch into a keyed table
  (insert new keys, replace matched keys, optionally delete tombstones).
  Without a transaction log (Delta/Iceberg aren't in this environment) the
  unit of atomicity is the partition directory: we rewrite ONLY the
  partitions the change batch touches (dynamic partition overwrite), which
  is also the 100 TB answer — work scales with the changed partitions, not
  the table. Spark's task-commit protocol keeps each partition swap atomic.

- **compact_partitions** — bin-packs a partition's many small files (the
  natural residue of 5 s streaming triggers, `di.rs:41-42`) into
  target-size files, preserving the in-file sort (symbol, ts) so parquet
  min/max footer pruning keeps working.

Scale notes: merge shuffles only the change batch plus the touched
partitions (partition-pruned scan, pushed filter on the partition column);
compaction is one coalesce-write per partition with no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    key_cols: list[str],
    partition_col: str,
    delete_col: str | None = None,
    seq_col: str | None = None,
) -> dict:
    """Upsert `changes` into the parquet table at `table_path`.

    Matched keys take the change row (last-writer-wins inside a batch is
    the caller's responsibility — dedupe first); unmatched keys insert.
    Rows with `delete_col = true` are tombstones: the key is removed.
    Only partitions present in `changes` are rewritten.

    ``seq_col``: when given, the column is persisted in the table and a
    matched key is replaced (or tombstoned) only if the change's sequence
    is >= the stored one — out-of-order change feeds can no longer clobber
    newer state with older values (ties prefer the change).
    """
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        touched = [r[0] for r in changes.select(partition_col).distinct().collect()]

        def minus_tombstones(df: DataFrame) -> DataFrame:
            if delete_col is None:
                return df
            return df.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
                delete_col
            )

        try:
            current = spark.read.parquet(table_path).where(
                F.col(partition_col).isin(touched)
            )
            eff = changes
            if seq_col is not None:
                cur_seq = current.select(
                    *key_cols, F.col(seq_col).alias("__cur_seq")
                )
                eff = (
                    changes.join(cur_seq, on=key_cols, how="left")
                    .where(
                        F.col("__cur_seq").isNull()
                        | (F.col(seq_col) >= F.col("__cur_seq"))
                    )
                    .drop("__cur_seq")
                )
            # keep current rows whose key has no surviving row (upsert OR
            # tombstone) in the change batch
            keep = current.join(
                eff.select(*key_cols).distinct(), on=key_cols, how="left_anti"
            )
            # allowMissingColumns: additive schema evolution — a change
            # batch may carry new columns (old rows get NULL) and old
            # columns the batch lacks survive as NULL on the new rows.
            merged = keep.unionByName(minus_tombstones(eff), allowMissingColumns=True)
        except Exception:  # table does not exist yet → plain insert
            merged = minus_tombstones(changes)
        # Dynamic overwrite only replaces partitions PRESENT in the output;
        # a partition fully emptied by tombstones writes no rows, so its old
        # files would survive. Find those partitions BEFORE the write (the
        # plan reads the pre-write files; evaluating it afterwards would
        # re-scan paths the overwrite just deleted).
        surviving = {r[0] for r in merged.select(partition_col).distinct().collect()}
        (
            merged.repartition(F.col(partition_col))
            .sortWithinPartitions(*key_cols)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_path)
        )
        # Drop emptied partition directories explicitly (the same
        # metadata-only delete a lake format's DELETE commit performs).
        emptied = [p for p in touched if p not in surviving]
        if emptied:
            jvm = spark._jvm
            jsc = spark._jsc
            conf = jsc.hadoopConfiguration()
            for p in emptied:
                path = jvm.org.apache.hadoop.fs.Path(
                    f"{table_path}/{partition_col}={p}"
                )
                fs = path.getFileSystem(conf)
                if fs.exists(path):
                    fs.delete(path, True)
        return {
            "touched_partitions": len(touched),
            "emptied_partitions": len(emptied),
        }
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    partitions: list | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite the given partitions (default: all) into ~target-size files.

    File count per partition = ceil(partition_bytes / target); rows are
    re-sorted by `sort_cols` inside each output file so footer min/max
    stats stay tight after compaction.
    """
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df = spark.read.parquet(table_path)
        if partitions is not None:
            df = df.where(F.col(partition_col).isin(partitions))
        # size estimate from the files backing the (pruned) scan
        files = df.select(F.input_file_name().alias("f")).distinct()
        n_files = files.count()
        import os

        total = 0
        for (f,) in files.collect():
            p = f.removeprefix("file://")
            if os.path.exists(p):
                total += os.path.getsize(p)
        n_out = max(1, -(-total // target_file_bytes))  # ceil
        out = df.repartition(int(n_out), F.col(partition_col))
        if sort_cols:
            out = out.sortWithinPartitions(partition_col, *sort_cols)
        out.write.mode("overwrite").partitionBy(partition_col).parquet(table_path)
        return {"files_before": n_files, "target_files": int(n_out)}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
