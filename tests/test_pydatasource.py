"""Python Data Source (aetherium_ticks): batch day-partitioned reads match
the JVM-side generator row-for-row; the stream reader emits deterministic
offset-keyed micro-batches."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def registered(spark):
    from aetherium_trader_datapipeline_spark.sources.pydatasource import (
        AetheriumTickDataSource,
    )

    spark.dataSource.register(AetheriumTickDataSource)
    return spark


def test_batch_read_matches_jvm_generator(registered):
    spark = registered
    from aetherium_trader_datapipeline_spark.sources.ticks import historical_range

    pyds = (
        spark.read.format("aetherium_ticks")
        .option("symbol", "NQ")
        .option("start", "2024-01-01")
        .option("end", "2024-01-02")
        .load()
    )
    jvm = historical_range(
        spark, "NQ", "2024-01-01", "2024-01-02", today=dt.date(2024, 6, 1)
    )
    assert pyds.count() == 2880
    assert pyds.schema["bid_price"].dataType.simpleString() == "decimal(10,4)"
    a = sorted(map(tuple, pyds.collect()))
    b = sorted(map(tuple, jvm.collect()))
    assert a == b


def test_batch_read_one_partition_per_day(registered):
    df = (
        registered.read.format("aetherium_ticks")
        .option("start", "2024-03-01")
        .option("end", "2024-03-05")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5


def test_stream_reader_deterministic_batches(registered):
    spark = registered
    out = tempfile.mkdtemp(prefix="pyds-sink-")
    ckpt = tempfile.mkdtemp(prefix="pyds-ckpt-")
    stream = (
        spark.readStream.format("aetherium_ticks")
        .option("symbol", "NQ")
        .option("start", "2024-01-01")
        .option("ticksPerBatch", "120")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.read.schema(stream.schema).parquet(out)
            if got.count() >= 240:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = spark.read.schema(stream.schema).parquet(out)
    n = got.count()
    assert n >= 240  # at least two micro-batches landed
    # deterministic content: first 240 minutes of 2024-01-01, no gaps/dups
    first = got.orderBy("timestamp").limit(240).collect()
    assert first[0].timestamp == dt.datetime(2024, 1, 1, 0, 0)
    assert first[239].timestamp == dt.datetime(2024, 1, 1, 3, 59)
    assert got.select("timestamp").distinct().count() == n
