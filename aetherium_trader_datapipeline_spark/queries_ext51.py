"""Fifty-first extension wave — modern SQL definition surface:

x253 sql udf         a scalar function defined IN SQL (CREATE TEMPORARY
                     FUNCTION ... RETURN expr — the Spark 4 SQL UDF
                     surface) used by a revenue aggregation; the oracle
                     inlines the identical expression, proving the UDF is
                     pure declaration (Catalyst inlines it — no black box,
                     unlike Python UDFs)
x254 lateral alias   lateral column aliases: later SELECT items reference
                     earlier ones without a subquery

Scale shapes: both compile to ordinary scans + aggregations; the SQL UDF
inlines into whole-stage codegen (the reason to prefer it over a Python
UDF for row-level business logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x253: SQL-defined scalar UDF -------------------------------------------

# net_rev rounds the scale-4 decimal sum to 2 places IN DECIMAL SPACE first
# (exact, identical tie-breaks: Spark HALF_UP and DuckDB half-away-from-zero
# agree on decimals), THEN casts to double; the outer ROUND(...,2) is a no-op
# on the already-2-place value but keeps the double repr canonical.  Rounding
# after the double cast instead would let a genuine .xx50 tie resolve
# differently per engine (advisor r8, queries_ext51).
_X253_ORACLE = """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DECIMAL(18,2)) AS DOUBLE), 2) AS net_rev
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register(
    "x253_sql_udf",
    oracle=_X253_ORACLE,
    tags=("sql", "udf"),
)
def x253_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE)
        RETURNS DECIMAL(18,4)
        RETURN CAST(p * (1 - d) AS DECIMAL(18,4))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(CAST(ROUND(SUM(net_price(l_extendedprice, l_discount)), 2) AS DECIMAL(18,2)) AS DOUBLE), 2) AS net_rev
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


# -- x254: lateral column aliases -------------------------------------------

# all-decimal chain after the one established double->DECIMAL(18,4) cast:
# tax and gross are exact decimal products/sums, so no per-row ROUND (whose
# tie-breaks differ across engines) appears anywhere in the MATH; the FINAL
# projection casts each exact decimal to double (repr-stable — decimal
# finals hash-diverge on the driver, r7 red family) via an outer SELECT so
# the lateral-alias chain under test stays all-decimal
_X254_BODY = """
    SELECT l_orderkey, l_linenumber,
           ROUND(CAST(net AS DOUBLE), 4) AS net,
           ROUND(CAST(tax AS DOUBLE), 6) AS tax,
           ROUND(CAST(gross AS DOUBLE), 6) AS gross
    FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS net,
             CAST(net * CAST(0.07 AS DECIMAL(4,2)) AS DECIMAL(18,6)) AS tax,
             CAST(net + tax AS DECIMAL(18,6)) AS gross
      FROM lineitem
    )
    ORDER BY l_orderkey, l_linenumber LIMIT 300
"""

register_sql(
    "x254_lateral_alias",
    spark_sql=_X254_BODY,
    duckdb_sql=_X254_BODY,
    tags=("sql", "surface"),
)
