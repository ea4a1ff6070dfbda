"""Statistical analytics breadth (x101–x103).

x101 computes the least-squares fit from DECIMAL-exact moment sums rather
than the engines' regr_* aggregates: float moment accumulation is
summation-order-dependent, so regr_slope(double) is not reproducible
across engines/partitionings, but decimal sums are exact and the final
double division is a single IEEE operation.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- least-squares slope/intercept per group, decimal-exact moments ---------

_LINREG = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS sxx,
         SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       ROUND(CAST((n * sxy - sx * sy) AS DOUBLE) / CAST((n * sxx - sx * sx) AS DOUBLE), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE) - CAST((n * sxy - sx * sy) AS DOUBLE)
              / CAST((n * sxx - sx * sx) AS DOUBLE) * CAST(sx AS DOUBLE)) / n, 4) AS intercept
FROM m ORDER BY l_returnflag
"""
register_sql("x101_linreg", spark_sql=_LINREG, duckdb_sql=_LINREG, headline=True, tags=("stats", "agg"))

# -- numeric RANGE frame (value-based, not row- or interval-based) ----------

_RANGE_FRAME = """
SELECT c_custkey, c_nationkey,
       ROUND(c_acctbal, 2) AS bal,
       COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                      RANGE BETWEEN 500.0 PRECEDING AND CURRENT ROW) AS n_within_500
FROM customer ORDER BY c_custkey LIMIT 500
"""
register_sql(
    "x102_numeric_range_frame",
    spark_sql=_RANGE_FRAME,
    duckdb_sql=_RANGE_FRAME,
    tags=("window", "frame"),
)

# -- median / quartile selection (order-statistic, engine-agnostic) ---------

_MEDIAN = """
SELECT o_orderstatus,
       ROUND(CAST(MEDIAN(o_totalprice) AS DOUBLE), 2) AS med_price,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""
register_sql("x103_median", spark_sql=_MEDIAN, duckdb_sql=_MEDIAN, tags=("stats", "agg"))
