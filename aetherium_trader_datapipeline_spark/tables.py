"""Fixture-table loading and view registration.

Schemas are fixed/declared (the reference hard-codes its Arrow schema,
reference parquet.rs:28-43); we read the driver-generated parquet as-is
(its footers carry the authoritative types) and register temp views so the
whole query library can run through ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every fixture table under ``sf_dir`` and register temp views.

    Reads are lazy; registering a view costs nothing until a query runs, so
    we always register all ten. Column pruning + predicate pushdown then
    reach the parquet scans (verify with ``df.explain('formatted')`` —
    ``PushedFilters`` / ``ReadSchema``).
    """
    from aetherium_trader_datapipeline_spark.session import ensure_engine_conf

    ensure_engine_conf(spark)
    # Spark 4 rejects parquet TIMESTAMP(NANOS); read nanos as BIGINT and
    # convert with integer division (ns epoch ≈ 1.7e18 overflows a double's
    # 53-bit mantissa, so never divide in float).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    dfs: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
