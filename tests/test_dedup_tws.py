"""Streaming duplicate suppression (transformWithStateInPandas + TTL'd
value state) must equal the batch twin exactly — both run one shared
greedy admit kernel (reference: the 1-per-15s duplicate request window,
`rate_limiting/limiter.rs:92-97`)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _mk_events(spark):
    """3 users × bursts: duplicates 3s apart inside a 15s window, bursts
    40s apart; interleaved file order so suppression state spans
    micro-batches."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for uid in range(1, 4):
        for burst in range(4):
            start = base + dt.timedelta(seconds=40 * burst + uid)
            for k in range(4):  # 4 arrivals 3 s apart -> only the first admits
                eid += 1
                rows.append((eid, uid, start + dt.timedelta(seconds=3 * k)))
    schema = "event_id LONG, user_id LONG, ts TIMESTAMP"
    return spark.createDataFrame(rows, schema)


def test_dup_suppress_stream_equals_batch(spark, tmp_path):
    from aetherium_trader_datapipeline_spark.streaming.dedup_tws import (
        dup_suppress_batch,
        dup_suppress_stream,
    )

    events = _mk_events(spark)
    src = str(tmp_path / "src")
    # two files -> two micro-batches, split on the TIME axis (bursts 0-1
    # then 2-3): per key the later batch only carries later events, so the
    # last-admit state must persist across the batch boundary. (The
    # processor admits in arrival order — like the reference limiter, it
    # does not re-sort history — so the source must deliver per-key
    # event-time order across batches, which time-axis splitting gives.)
    cut = dt.datetime(2024, 3, 1, 12, 1, 10)
    events.where(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(src)
    events.where(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = dup_suppress_stream(stream, window="15 seconds")
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.user_id, r.ts, r.event_id)
            for r in spark.table("dedup_tws").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    want = {
        (r.user_id, r.ts, r.event_id)
        for r in dup_suppress_batch(events, window="15 seconds").collect()
    }
    assert want, "batch twin emitted nothing — fixture broken"
    assert got == want
    # every burst admits exactly its first arrival: 3 users × 4 bursts
    assert len(want) == 12


def test_admit_kernel_boundaries():
    from aetherium_trader_datapipeline_spark.streaming.dedup_tws import admit_indices

    # exact-boundary arrival (gap == window) is ADMITTED (>= semantics)
    keep, last = admit_indices([0, 14_999, 15_000], None, 15_000)
    assert keep == [0, 2] and last == 15_000
    # carried state suppresses the head of the next batch
    keep, last = admit_indices([15_001, 30_000], 15_000, 15_000)
    assert keep == [1] and last == 30_000
    # empty input round-trips state
    keep, last = admit_indices([], 7, 15_000)
    assert keep == [] and last == 7
