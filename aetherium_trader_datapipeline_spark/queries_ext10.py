"""Modern ANSI-SQL surface (x111–x113): FILTER-clause aggregates,
correlated LATERAL subqueries, GROUP BY ALL — dialect features a user
switching from any current OLAP engine expects to keep working.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- FILTER (WHERE ...) aggregates + boolean aggregates ---------------------

_FILTER_AGG = """
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_large,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS n_urgent,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_totalprice > 400000) AS any_huge
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""
register_sql(
    "x111_filter_agg",
    spark_sql=_FILTER_AGG,
    duckdb_sql=_FILTER_AGG,
    tags=("agg", "ansi"),
)

# -- correlated LATERAL: per-nation top spender (join-per-row semantics) ----

_LATERAL = """
SELECT n_nationkey, n_name, top.c_custkey AS top_custkey, ROUND(top.c_acctbal, 2) AS top_bal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 1) top
ORDER BY n_nationkey
"""
register_sql(
    "x112_lateral_topper",
    spark_sql=_LATERAL,
    duckdb_sql=_LATERAL,
    tags=("join", "lateral", "ansi"),
)

# -- GROUP BY ALL (keys inferred from the select list) ----------------------

_GBALL = """
SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ALL ORDER BY c_mktsegment, o_orderstatus
"""
register_sql("x113_group_by_all", spark_sql=_GBALL, duckdb_sql=_GBALL, tags=("agg", "ansi"))
