"""Multi-format batch IO with declared schemas.

The reference reads/writes parquet only (repositories/parquet.rs); a
complete engine must also ingest the interchange formats around it. Policy
(mirrors the reference's fixed-schema stance, parquet.rs:28-43): schemas
are always DECLARED — ``inferSchema`` is never used, so a malformed file
fails loudly instead of silently changing types.

Format notes:
- csv/json: explicit timestampFormat (ISO-8601 with µs) on both write and
  read; mode=FAILFAST so corrupt rows raise (csv additionally header=true).
- orc/parquet: self-describing, schema argument validates via cast-free
  select (names + order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    if fmt in ("csv", "json"):
        w = w.option("timestampFormat", _TS_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_binary_blobs(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest opaque media files (image/audio/video) as BINARY rows via the
    built-in ``binaryFile`` source: (path, modificationTime, length, content).

    The scale story: listing + reads distribute across executors, and the
    `length` column is populated from file metadata, so a `max_bytes`
    filter prunes oversized blobs BEFORE content is read (pushed filter on
    length). Downstream decode goes through operators/multimodal.py
    (Arrow-batched mapInPandas), never a driver-side loop.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    if max_bytes is not None:
        df = df.filter(df["length"] <= max_bytes)
    return df


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: StructType | None = None
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true")
    if fmt in ("csv", "json"):
        r = r.option("timestampFormat", _TS_FMT).option("mode", "FAILFAST")
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} requires a declared schema (inferSchema is banned)")
    df = r.load(path)
    if schema is not None:
        # name/order normalization; types already enforced by the reader
        df = df.select(*[f.name for f in schema.fields])
    return df
