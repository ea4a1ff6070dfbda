"""Streaming Misra–Gries heavy hitters (transformWithStateInPandas +
MapState) must equal the batch twin exactly — one shared fold kernel —
and the kernel must honor the classic deterministic guarantee."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _mk_events(spark):
    """2 event types × skewed users: user u arrives with multiplicity
    ~ 40 // (u + 1) — a deterministic Zipf-ish head."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for et in ("click", "view"):
        t = 0
        for rep in range(40):
            for u in range(12):
                if rep < 40 // (u + 1):
                    eid += 1
                    t += 1
                    rows.append((et, u, base + dt.timedelta(seconds=t), eid))
    return spark.createDataFrame(
        rows, "event_type STRING, user_id LONG, ts TIMESTAMP, event_id LONG"
    )


def test_mg_kernel_guarantee():
    from aetherium_trader_datapipeline_spark.streaming.heavy_hitters import mg_fold

    items = [1] * 50 + [2] * 30 + list(range(100, 180))  # n = 160
    k = 7
    got = mg_fold({}, items, k)
    assert len(got) <= k
    # every item with freq > n/(k+1) = 20 is tracked, under-counted <= 20
    for it, true in ((1, 50), (2, 30)):
        assert it in got
        assert true - 160 // (k + 1) <= got[it] <= true


def test_heavy_hitters_stream_equals_batch(spark, tmp_path):
    from aetherium_trader_datapipeline_spark.streaming.heavy_hitters import (
        heavy_hitters_batch,
        heavy_hitters_stream,
    )

    events = _mk_events(spark)
    src = str(tmp_path / "src")
    cut = dt.datetime(2024, 3, 1, 12, 2, 0)
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
        q = (
            heavy_hitters_stream(stream, k=5)
            .writeStream.format("memory")
            .queryName("hh_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.table("hh_tws").collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    # snapshots are tagged with cumulative n_seen; current = max per key
    last_n = {}
    for r in rows:
        last_n[r.event_type] = max(last_n.get(r.event_type, 0), r.n_seen)
    got = {
        (r.event_type, r.item, r.c_est, r.n_seen)
        for r in rows
        if r.n_seen == last_n[r.event_type]
    }
    want = {
        (r.event_type, r.item, r.c_est, r.n_seen)
        for r in heavy_hitters_batch(events, k=5).collect()
    }
    assert got == want
    assert len({et for et, *_ in got}) == 2
    # at least two micro-batches actually ran (state crossed a boundary):
    # some snapshot rows carry a smaller cumulative count than the final one
    assert any(r.n_seen < last_n[r.event_type] for r in rows)
