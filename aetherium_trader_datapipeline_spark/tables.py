"""Fixture-table loading and view registration.

Schemas are fixed/declared (the reference hard-codes its Arrow schema,
reference parquet.rs:28-43); we read the driver-generated parquet as-is
(its footers carry the authoritative types) and register temp views so the
whole query library can run through ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# (session id, sf_dir) -> loaded DataFrames; plus the sf_dir whose views are
# currently registered per session, so repeated query calls don't re-read
# parquet footers (schema resolution is the fixed cost, not the lazy scan).
_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}
_REGISTERED: dict[str, str] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every fixture table under ``sf_dir`` and register temp views.

    Reads are lazy; registering a view costs nothing until a query runs, so
    we always register all ten. Column pruning + predicate pushdown then
    reach the parquet scans (verify with ``df.explain('formatted')`` —
    ``PushedFilters`` / ``ReadSchema``).
    """
    from aetherium_trader_datapipeline_spark.session import ensure_engine_conf

    sess_key = spark.sparkContext.applicationId
    cache_key = (sess_key, sf_dir)
    if cache_key in _CACHE and _REGISTERED.get(sess_key) == sf_dir:
        return _CACHE[cache_key]

    ensure_engine_conf(spark)
    # Spark 4 rejects parquet TIMESTAMP(NANOS); read nanos as BIGINT and
    # convert with integer division (ns epoch ≈ 1.7e18 overflows a double's
    # 53-bit mantissa, so never divide in float).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dfs = _CACHE.get(cache_key)
    if dfs is None:
        dfs = {}
        for name in TABLE_NAMES:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            elif name == "events" and isinstance(
                df.schema["ts"].dataType, TimestampNTZType
            ):
                # Fixture generations vary: timestamp[us] without tz reads as
                # TIMESTAMP_NTZ. Session tz is UTC, so the cast reinterprets
                # the wall clock as the same UTC instant — lossless, and it
                # keeps the whole library (unix_micros, window(), watermarks)
                # on the one TIMESTAMP type the engine declares (SURVEY §1.2).
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            dfs[name] = df
        _CACHE[cache_key] = dfs
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    _REGISTERED[sess_key] = sf_dir
    return dfs
