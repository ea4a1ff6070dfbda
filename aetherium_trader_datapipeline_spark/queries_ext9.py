"""Remaining TPC-H shapes (x104–x110): with queries_ext5 this covers all
22 classic shapes, adapted to the fixture schema (FIXTURES.md §4 — lineitem
bridges part↔supplier in place of partsupp; s_acctbal stands in for
ps_supplycost; shipdate relations replace commit/receipt dates).

Determinism: DECIMAL-accumulated double sums, total ORDER BY everywhere.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- Q2: min-cost supplier per part (correlated MIN subquery) ---------------

_Q2 = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_type
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_size = 15 AND p_type = 'LARGE'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM supplier s2, lineitem l2, nation n2, region r2
    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
GROUP BY s_acctbal, s_name, n_name, p_partkey, p_type
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""
register_sql("x104_tpch_q2", spark_sql=_Q2, duckdb_sql=_Q2, tags=("tpch", "subquery"))

# -- Q8: market share of one nation within a region, by year ----------------

_Q8 = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT YEAR(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN DATE'1995-01-01' AND DATE'1996-12-31'
) all_nations
GROUP BY o_year ORDER BY o_year
"""
register_sql(
    "x105_tpch_q8",
    spark_sql=_Q8,
    duckdb_sql=_Q8.replace("YEAR(o_orderdate)", "CAST(year(o_orderdate) AS INT)"),
    tags=("tpch", "join"),
)

# -- Q9: product-type profit by nation and year -----------------------------
# ps_supplycost stand-in: s_acctbal/100 per unit (deterministic, positive-ish).

_Q9 = """
SELECT nation, o_year, ROUND(CAST(CAST(ROUND(SUM(amount), 2) AS DECIMAL(38,2)) AS DOUBLE), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
           - CAST(ROUND(s_acctbal / 100.0, 4) AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year ORDER BY nation, o_year DESC
"""
register_sql(
    "x106_tpch_q9",
    spark_sql=_Q9,
    duckdb_sql=_Q9.replace("YEAR(o_orderdate)", "CAST(year(o_orderdate) AS INT)"),
    tags=("tpch", "join"),
)

# -- Q11: important stock value with global-fraction HAVING -----------------

_Q11 = """
WITH pv AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_2'
  GROUP BY l_partkey)
SELECT partkey, ROUND(CAST(value AS DOUBLE), 2) AS value
FROM pv
WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
ORDER BY value DESC, partkey LIMIT 100
"""
register_sql("x107_tpch_q11", spark_sql=_Q11, duckdb_sql=_Q11, tags=("tpch", "cte", "subquery"))

# -- Q12: shipping-priority class counts (o_orderpriority for l_shipmode) ---

_Q12 = """
SELECT l_linestatus,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1997-01-01'
  AND l_shipdate > o_orderdate
GROUP BY l_linestatus ORDER BY l_linestatus
"""
register_sql(
    "x108_tpch_q12",
    spark_sql=_Q12,
    duckdb_sql=_Q12.replace(
        "SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)",
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)",
    ).replace(
        "SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)",
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)",
    ),
    tags=("tpch", "join"),
)

# -- Q20: suppliers shipping more than half the average part volume ---------

_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')
    AND l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1997-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > (
    SELECT 0.5 * AVG(l_quantity) FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')))
ORDER BY s_suppkey
"""
register_sql("x109_tpch_q20", spark_sql=_Q20, duckdb_sql=_Q20, tags=("tpch", "subquery"))

# -- Q21: multi-supplier orders where exactly one supplier shipped late -----

_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""
# r13: the Spark side runs the classic decorrelated Q21 — ONE lineitem scan
# grouped by order instead of l1 + a semi-join (EXISTS l2) + an anti-join
# (NOT EXISTS l3), each of which re-scanned and re-shuffled lineitem (the
# plan showed 3 lineitem scans; guide §3.3 / §2.4). Equivalence: an l1 row
# qualifies iff it is late, its order is 'F' and multi-supplier
# (n_supp > 1 ⟺ EXISTS l2), and every late row of the order shares l1's
# supplier (n_late_supp = 1, which given late(l1) forces
# late_supp = l1.l_suppkey ⟺ NOT EXISTS l3). The qualifying rows of an
# order are then exactly its n_late late rows, all owned by late_supp, so
# COUNT(*) per supplier == SUM(n_late). collect_set sizes replace
# COUNT(DISTINCT) to keep the aggregate EXPAND-free; the nation filter
# applies only to the outer supplier, as in the original. The DuckDB oracle
# keeps the textbook EXISTS form.
_Q21_SPARK = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
g AS (
  SELECT l_orderkey,
         size(collect_set(l_suppkey)) AS n_supp,
         size(collect_set(CASE WHEN late = 1 THEN l_suppkey END)) AS n_late_supp,
         MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp,
         SUM(late) AS n_late
  FROM lo GROUP BY l_orderkey
),
q AS (
  SELECT late_supp, n_late FROM g WHERE n_supp > 1 AND n_late_supp = 1
)
SELECT s_name, CAST(SUM(n_late) AS BIGINT) AS numwait
FROM supplier
JOIN q ON s_suppkey = q.late_supp
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""
register_sql("x110_tpch_q21", spark_sql=_Q21_SPARK, duckdb_sql=_Q21, headline=True, tags=("tpch", "subquery", "exists"))
