"""ANSI edge-semantics surface (x123–x124): by-name union of ragged
schemas and null-safe equality joins — the quiet correctness traps when
consolidating heterogeneous feeds (the reference's multi-gateway ingest,
`ingestion/infrastructure/src/gateways/*.rs`, is exactly a ragged-schema
union at the platform level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- unionByName with missing columns: schema-evolution-safe append ---------


@register(
    "x123_union_by_name",
    oracle="""
    SELECT kind, key, COALESCE(bal, 0.0) AS bal, COALESCE(n_orders, 0) AS n_orders
    FROM (
      SELECT 'cust' AS kind, c_custkey AS key, ROUND(c_acctbal, 2) AS bal,
             CAST(NULL AS BIGINT) AS n_orders FROM customer
      UNION ALL BY NAME
      SELECT 'buyer' AS kind, o_custkey AS key,
             CAST(NULL AS DOUBLE) AS bal, COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey
    ) u
    ORDER BY kind, key LIMIT 300
    """,
    tags=("union", "ansi"),
)
def x123_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): columns matched by name, not
    position; absent columns null-filled — Spark's schema-evolution append."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        F.lit("cust").alias("kind"),
        F.col("c_custkey").alias("key"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    buyers = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(F.lit("buyer").alias("kind"), "key", "n_orders")
    )
    return (
        cust.unionByName(buyers, allowMissingColumns=True)
        .select(
            "kind",
            "key",
            F.coalesce("bal", F.lit(0.0)).alias("bal"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        .orderBy("kind", "key")
        .limit(300)
    )


# -- null-safe equality join (<=> / IS NOT DISTINCT FROM) -------------------

register_sql(
    "x124_null_safe_join",
    spark_sql="""
SELECT a.k AS k, COUNT(*) AS n
FROM (SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey % 11 END AS k
      FROM orders WHERE o_orderkey <= 3000) a
JOIN (SELECT CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_orderkey % 11 END AS k
      FROM lineitem WHERE l_orderkey <= 3000) b
ON a.k <=> b.k
GROUP BY a.k ORDER BY k NULLS FIRST
""",
    duckdb_sql="""
SELECT a.k AS k, COUNT(*) AS n
FROM (SELECT CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey % 11 END AS k
      FROM orders WHERE o_orderkey <= 3000) a
JOIN (SELECT CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_orderkey % 11 END AS k
      FROM lineitem WHERE l_orderkey <= 3000) b
ON a.k IS NOT DISTINCT FROM b.k
GROUP BY a.k ORDER BY k NULLS FIRST
""",
    tags=("join", "ansi", "nulls"),
)
