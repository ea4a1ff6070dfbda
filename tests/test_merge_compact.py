"""merge_upsert (partition-scoped CDC upsert) and compact_partitions.

Covers the table-maintenance layer over the reference's append-only hourly
parquet layout (`repositories/parquet.rs:45-57`): insert/update/delete
semantics, untouched-partition preservation, and small-file bin-packing.
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.operators.merge import (
    compact_partitions,
    merge_upsert,
)


def _rows(spark, path):
    return {
        (r.k, r.v, r.d)
        for r in spark.read.parquet(path).select("k", "v", "d").collect()
    }


def test_merge_upsert_insert_update_delete(spark):
    base = os.path.join(tempfile.mkdtemp(prefix="merge-"), "t")
    seed = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (4, "d", "p3")],
        "k int, v string, d string",
    )
    merge_upsert(spark, base, seed, key_cols=["k"], partition_col="d")
    assert _rows(spark, base) == {
        (1, "a", "p1"),
        (2, "b", "p1"),
        (3, "c", "p2"),
        (4, "d", "p3"),
    }

    changes = spark.createDataFrame(
        [
            (2, "B", "p1", False),  # update
            (5, "e", "p1", False),  # insert into existing partition
            (6, "f", "p4", False),  # insert into new partition
            (3, None, "p2", True),  # delete tombstone
        ],
        "k int, v string, d string, is_delete boolean",
    )
    stats = merge_upsert(
        spark, base, changes, key_cols=["k"], partition_col="d", delete_col="is_delete"
    )
    assert stats["touched_partitions"] == 3
    assert _rows(spark, base) == {
        (1, "a", "p1"),
        (2, "B", "p1"),
        (5, "e", "p1"),
        (6, "f", "p4"),
        (4, "d", "p3"),  # untouched partition survives the rewrite
    }
    # p2 is now empty of rows but p3 was never rewritten
    assert (
        spark.read.parquet(base).where(F.col("d") == "p2").count() == 0
    )


def test_merge_upsert_rewrites_only_touched_partitions(spark):
    base = os.path.join(tempfile.mkdtemp(prefix="merge-"), "t")
    seed = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "k int, v string, d string"
    )
    merge_upsert(spark, base, seed, key_cols=["k"], partition_col="d")
    p2_files_before = set(glob.glob(os.path.join(base, "d=p2", "*.parquet")))

    changes = spark.createDataFrame([(1, "A", "p1")], "k int, v string, d string")
    merge_upsert(spark, base, changes, key_cols=["k"], partition_col="d")

    p2_files_after = set(glob.glob(os.path.join(base, "d=p2", "*.parquet")))
    assert p2_files_before == p2_files_after  # physically untouched


def test_compact_partitions_reduces_file_count(spark):
    base = os.path.join(tempfile.mkdtemp(prefix="compact-"), "t")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.col("id").cast("string").alias("v"),
        (F.col("id") % 2).cast("string").alias("d"),
    )
    # 16 tiny files per partition — the residue of frequent streaming triggers
    df.repartition(16).write.partitionBy("d").parquet(base)
    files_before = glob.glob(os.path.join(base, "d=*", "*.parquet"))
    assert len(files_before) > 4

    before = {(r.k, r.v, r.d) for r in spark.read.parquet(base).collect()}
    stats = compact_partitions(
        spark, base, partition_col="d", sort_cols=["k"], target_file_bytes=1 << 30
    )
    files_after = glob.glob(os.path.join(base, "d=*", "*.parquet"))
    assert len(files_after) < len(files_before)
    assert stats["files_before"] == len(files_before)
    after = {(r.k, r.v, r.d) for r in spark.read.parquet(base).collect()}
    assert before == after


def test_merge_upsert_idempotent_reapply(spark):
    """Re-applying the same CDC batch is a no-op — the engine-side
    equivalent of the reference's idempotent re-run guarantee
    (instance-stamped files + atomic rename, IDD:181,227)."""
    base = os.path.join(tempfile.mkdtemp(prefix="merge-idem-"), "t")
    seed = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2"), (3, "c", "p2")], "k int, v string, d string"
    )
    merge_upsert(spark, base, seed, key_cols=["k"], partition_col="d")
    changes = spark.createDataFrame(
        [(2, "B", "p2", False), (3, None, "p2", True), (4, "d", "p3", False)],
        "k int, v string, d string, is_delete boolean",
    )
    for _ in range(3):  # first apply + two replays
        merge_upsert(
            spark, base, changes,
            key_cols=["k"], partition_col="d", delete_col="is_delete",
        )
        assert _rows(spark, base) == {
            (1, "a", "p1"),
            (2, "B", "p2"),
            (4, "d", "p3"),
        }


def test_merge_upsert_additive_schema_evolution(spark, tmp_path):
    """A change batch carrying a NEW column merges cleanly: existing rows
    get NULL for it, and subsequent reads see the widened schema."""
    from aetherium_trader_datapipeline_spark.operators.merge import merge_upsert

    table = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", "v1"), (2, "a", "v2")], "k LONG, part STRING, val STRING"
    ).write.partitionBy("part").parquet(table)

    changes = spark.createDataFrame(
        [(2, "a", "v2-new", "extra2"), (3, "a", "v3", "extra3")],
        "k LONG, part STRING, val STRING, note STRING",
    )
    merge_upsert(spark, table, changes, key_cols=["k"], partition_col="part")

    got = {
        r.k: (r.val, r.note)
        for r in spark.read.option("mergeSchema", "true").parquet(table).collect()
    }
    assert got == {1: ("v1", None), 2: ("v2-new", "extra2"), 3: ("v3", "extra3")}
