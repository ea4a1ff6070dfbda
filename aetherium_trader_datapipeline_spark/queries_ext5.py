"""TPC-H-shaped relational breadth (x81–x92).

The reference's documented OLAP layer (ClickHouse tick store,
docs/…系統設計文件.md:60-72) implies the full ad-hoc SQL surface; we verify it
with the classic TPC-H query shapes adapted to the driver fixture schema
(FIXTURES.md §4 — no partsupp table, so `lineitem` is the part↔supplier
bridge; no commit/receipt dates, so Q4/Q12/Q21 shapes use `l_shipdate`
relations instead).

Determinism rules (same as queries.py): every double SUM accumulates in
DECIMAL (exact, order-independent) and only then casts to DOUBLE; every
query has a total ORDER BY. Spark and DuckDB strings are kept textually
identical wherever the dialects agree.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- Q6: forecasting revenue change (pure scan + filter + agg) --------------

_Q6 = """
SELECT ROUND(CAST(CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""
register_sql("x81_tpch_q6", spark_sql=_Q6, duckdb_sql=_Q6, tags=("scan", "tpch"))

# -- Q4: order priority checking (EXISTS semi join) -------------------------
# Reference fixture has no commit/receipt dates; the EXISTS predicate keeps
# the Q4 shape using "some line shipped more than 30 days after order".

_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
register_sql("x82_tpch_q4", spark_sql=_Q4, duckdb_sql=_Q4, tags=("join", "tpch", "subquery"))

# -- Q10: returned item reporting ------------------------------------------

_Q10 = """
SELECT c_custkey, c_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) DESC,
         c_custkey LIMIT 20
"""
register_sql("x83_tpch_q10", spark_sql=_Q10, duckdb_sql=_Q10, headline=True, tags=("join", "tpch"))

# -- Q14: promotion effect (conditional agg ratio) --------------------------

_Q14 = """
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE'1996-09-01' AND l_shipdate < DATE'1996-10-01'
"""
register_sql("x84_tpch_q14", spark_sql=_Q14, duckdb_sql=_Q14, tags=("join", "tpch"))

# -- Q18: large volume customers -------------------------------------------

_Q18 = """
SELECT c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       ROUND(o_totalprice, 2) AS o_total,
       ROUND(CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE), 2) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
ORDER BY o_total DESC, o_orderkey LIMIT 100
"""
register_sql("x85_tpch_q18", spark_sql=_Q18, duckdb_sql=_Q18, tags=("join", "tpch", "having"))

# -- Q17: small-quantity-order revenue (correlated avg subquery) ------------

_Q17 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#25'
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""
register_sql("x86_tpch_q17", spark_sql=_Q17, duckdb_sql=_Q17, tags=("join", "tpch", "subquery"))

# -- Q19: discounted revenue under disjunctive predicates -------------------

_Q19 = """
SELECT ROUND(CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""
register_sql("x87_tpch_q19", spark_sql=_Q19, duckdb_sql=_Q19, tags=("join", "tpch"))

# -- Q22: global sales opportunity (anti join + scalar subquery) ------------
# Fixture has no c_phone; nation-key parity stands in for the country-code
# bucket. Nearly every fixture customer has orders (see q08), so the
# NOT EXISTS keeps Q22's anti-join shape as "never placed a large order".

_Q22 = """
SELECT MOD(c_nationkey, 5) AS cntry_bucket, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
GROUP BY MOD(c_nationkey, 5) ORDER BY cntry_bucket
"""
register_sql("x88_tpch_q22", spark_sql=_Q22, duckdb_sql=_Q22, tags=("tpch", "subquery", "antijoin"))

# -- Q15: top supplier (CTE + max-equality subquery) ------------------------
# Revenue compared in exact DECIMAL so the max-equality is cross-engine-safe.

_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE'1996-01-01' AND l_shipdate < DATE'1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, ROUND(CAST(total_rev AS DOUBLE), 2) AS total_rev
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""
register_sql("x89_tpch_q15", spark_sql=_Q15, duckdb_sql=_Q15, tags=("tpch", "cte", "subquery"))

# -- Q7: volume shipping between two nations (year breakdown) ---------------

_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(CAST(CAST(ROUND(SUM(vol), 2) AS DECIMAL(38,2)) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS vol
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2'))
    AND l_shipdate BETWEEN DATE'1996-01-01' AND DATE'1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""
register_sql(
    "x90_tpch_q7",
    spark_sql=_Q7,
    duckdb_sql=_Q7.replace("YEAR(l_shipdate)", "CAST(year(l_shipdate) AS INT)"),
    tags=("join", "tpch"),
)

# -- Q13: customer order-count distribution (left join + double group) ------

_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey) c_orders
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""
register_sql("x91_tpch_q13", spark_sql=_Q13, duckdb_sql=_Q13, tags=("join", "tpch"))

# -- Q16: supplier breadth per part group (NOT IN + count distinct) ---------
# lineitem bridges part↔supplier (no partsupp table); negative account
# balance stands in for the complaints filter.

_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#25' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100
"""
register_sql("x92_tpch_q16", spark_sql=_Q16, duckdb_sql=_Q16, tags=("tpch", "subquery", "distinct"))
