"""Streaming as-of enrichment (tws ValueState) must equal BOTH the
shared-kernel batch twin AND the declarative window operator
(asof_latest_prior) — the stream == batch == window triangle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _mk_events(spark):
    """3 users, interleaved views/clicks incl. (a) a click BEFORE any view
    (NULL prior), (b) a click at the SAME ts as a view (inclusive tie),
    (c) multiple views between clicks (max wins)."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows, eid = [], 0
    for uid in range(1, 4):
        t0 = base + dt.timedelta(seconds=uid)
        seq = [
            ("click", 0),         # (a) no prior view yet
            ("view", 5),
            ("view", 9),
            ("click", 9),         # (b) tie: the ts=9 view IS visible
            ("view", 20),
            ("view", 30),
            ("click", 41),        # (c) latest of the two views
            ("click", 55),        # same prior again
        ]
        for et, off in seq:
            eid += 1
            rows.append((eid, uid, et, t0 + dt.timedelta(seconds=off)))
    return spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
    )


def test_asof_stream_equals_batch_equals_window(spark, tmp_path):
    from aetherium_trader_datapipeline_spark.operators.asof import asof_latest_prior
    from aetherium_trader_datapipeline_spark.streaming.asof_tws import (
        asof_enrich_batch,
        asof_enrich_stream,
    )

    events = _mk_events(spark)

    # window operator (inner semantics: NULL priors dropped)
    want_window = {
        (r.event_id, r.prior_view)
        for r in asof_latest_prior(
            events, "ts", ["user_id"],
            of_interest="event_type = 'click'",
            prior_filter="event_type = 'view'",
            result_col="prior_view",
        ).collect()
    }

    # batch twin (keeps NULL priors; filter for comparison)
    batch = asof_enrich_batch(events).collect()
    want_batch_all = {(r.event_id, r.prior_view) for r in batch}
    assert {(e, p) for e, p in want_batch_all if p is not None} == want_window
    assert sum(1 for _, p in want_batch_all if p is None) == 3  # one per user

    # streaming across a micro-batch boundary (time-axis split)
    src = str(tmp_path / "src")
    cut = dt.datetime(2024, 3, 1, 12, 0, 15)
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
            asof_enrich_stream(stream)
            .writeStream.format("memory")
            .queryName("asof_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.event_id, r.prior_view) for r in spark.table("asof_tws").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    assert got == want_batch_all


def test_asof_step_kernel_properties():
    from aetherium_trader_datapipeline_spark.streaming.asof_tws import asof_step

    # split invariance: folding in two chunks with carried state == one fold
    # rows pre-sorted by (ts, is_evt, eid) per the kernel contract
    rows = [(1, 0, 10), (3, 0, 12), (3, 1, 11), (5, 1, 13), (9, 0, 14), (9, 1, 15)]
    whole, last_w = asof_step(None, rows)
    a, last_a = asof_step(None, rows[:3])
    b, last_b = asof_step(last_a, rows[3:])
    assert a + b == whole and last_b == last_w
    # tie visibility: the view at ts==3 and ts==9 is seen by the same-ts click
    assert whole == [(11, 3, 3), (13, 5, 3), (15, 9, 9)]
    # no prior at all -> None emitted
    out0, _ = asof_step(None, [(2, 1, 7)])
    assert out0 == [(7, 2, None)]
