"""transformWithStateInPandas state-type integration: exercise ListState
and MapState CRUD (append/put/iterate/update/remove/contains) end-to-end
through the JVM state server via streaming/ledger.py. The python↔JVM
protocol rides the vendored protobuf shim in this container, so this is
also the shim's coverage for the ListStateCall/MapStateCall message
families (value-state/timers are covered by the sessionizer and dedup
tests)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_list_and_map_state_roundtrip(spark, tmp_path):
    from aetherium_trader_datapipeline_spark.streaming.ledger import ledger_stream

    base = dt.datetime(2024, 5, 1, 8, 0, 0)
    rows = []
    eid = 0
    for uid in (1, 2):
        for k in range(3):
            for et in ("view", "click", "click"):
                eid += 1
                rows.append((eid, uid, et, base + dt.timedelta(seconds=eid)))
    events = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
    )
    src = str(tmp_path / "src")
    cut = 9  # user 1 entirely in file 1; user 2 entirely in file 2
    events.where(F.col("event_id") <= cut).coalesce(1).write.mode("append").parquet(src)
    events.where(F.col("event_id") > cut).coalesce(1).write.mode("append").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            ledger_stream(stream)
            .writeStream.format("memory")
            .queryName("state_zoo")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {(r.user_id, r.batch): r for r in spark.table("state_zoo").collect()}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    u1b1 = got[(1, 1)]
    assert u1b1.list_len == 9 and u1b1.list_sum == sum(range(1, 10))
    # 3 views folded then retired; 6 clicks remain in the tally
    assert u1b1.clicks == 6 and u1b1.had_views and u1b1.removed
    assert u1b1.map_size == 1

    u2 = [v for (uid, _), v in got.items() if uid == 2]
    assert len(u2) == 1  # user 2's rows all arrive in its first batch
    assert u2[0].list_len == 9 and u2[0].list_sum == sum(range(10, 19))
    assert u2[0].clicks == 6 and u2[0].map_size == 1 and u2[0].removed
