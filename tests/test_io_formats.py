"""Multi-format IO: write/read round-trips with declared schemas for every
supported interchange format, on the tick schema (timestamp + decimal +
int + string)."""

from __future__ import annotations

import datetime as dt

import pytest

from aetherium_trader_datapipeline_spark.sources.io import FORMATS, read_table, write_table
from aetherium_trader_datapipeline_spark.sources.ticks import historical_ticks


@pytest.fixture(scope="module")
def tick_df(spark):
    return historical_ticks(spark, "NQ", "2024-01-02", today=dt.date(2024, 6, 1))


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(spark, tick_df, fmt, tmp_path):
    path = str(tmp_path / f"t_{fmt}")
    write_table(tick_df, path, fmt)
    back = read_table(spark, path, fmt, schema=tick_df.schema)
    # nullability is advisory on read paths; names + types are the contract
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in tick_df.schema.fields
    ]
    a = sorted(map(tuple, tick_df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b, f"{fmt} round-trip mismatch"


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="declared schema"):
        read_table(spark, str(tmp_path), "csv")


def test_partitioned_write_layout(spark, tick_df, tmp_path):
    import pyspark.sql.functions as F

    path = str(tmp_path / "p")
    df = tick_df.withColumn("hour", F.hour("timestamp"))
    write_table(df, path, "parquet", partition_by=["symbol", "hour"])
    files = [str(p) for p in (tmp_path / "p").rglob("*.parquet")]
    assert files and all("symbol=NQ" in f and "hour=" in f for f in files)


def test_binary_blob_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingest → metadata-extract → embed: the multimodal path
    end-to-end, with the size filter pruning on file metadata."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        embed_blobs,
        extract_image_meta,
    )
    from aetherium_trader_datapipeline_spark.sources.io import read_binary_blobs

    (tmp_path / "a.png").write_bytes(bytes([10, 20, 30, 40]))
    (tmp_path / "b.png").write_bytes(bytes(range(200)))
    (tmp_path / "skip.txt").write_bytes(b"not media")

    df = read_binary_blobs(spark, str(tmp_path), glob="*.png", max_bytes=100)
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 1 and rows[0].path.endswith("a.png")

    meta = extract_image_meta(df.select("path", df.content.alias("blob"))).collect()
    assert meta[0].n_bytes == 4 and meta[0].width == 11

    emb = embed_blobs(df.select("path", df.content.alias("blob"))).collect()
    assert len(emb[0].embedding) == 8
