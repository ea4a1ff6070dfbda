"""Wave 158 (x543–x545): supply-chain KPIs on the order/lineitem
relations — the operational reading of the TPC-H schema the x81–x110
query shapes never take.

x543 — OTIF (on-time-in-full) fill rate: an order is on-time when its
LAST line ships within 30 days of the order date; per order priority:
order counts, OTIF share, and the mean ship lag — the service-level
table a fulfilment org reviews weekly.

x544 — order cycle-time quantiles: exact p50/p90/p99 of the
order-to-last-ship latency per priority class by rank selection —
the latency-SLO cousin of x543's binary cut.

x545 — single-source risk: per part, the quantity share of its top
supplier (from exact integer quantity sums); parts above 80% are
single-sourced, aggregated into the procurement-risk table with the
supplier-level HHI alongside (the part-level variant of x249/x347's
revenue concentration).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x543: OTIF fill rate -----------------------------------------------------------------

_X543 = """
    WITH order_ship AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             {datediff} AS ship_lag_days
      FROM orders o
      JOIN (
        SELECT l_orderkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey
      ) l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN ship_lag_days <= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS otif_orders,
           ROUND(CAST(SUM(CASE WHEN ship_lag_days <= 30 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS otif_share,
           ROUND(CAST(SUM(ship_lag_days) AS DOUBLE) / COUNT(*), 4)
             AS mean_ship_lag_days
    FROM order_ship GROUP BY o_orderpriority ORDER BY priority
"""

register_sql(
    "x543_otif_fill_rate",
    spark_sql=_X543.format(datediff="DATEDIFF(l.last_ship, o.o_orderdate)"),
    duckdb_sql=_X543.format(
        datediff="DATEDIFF('day', o.o_orderdate, l.last_ship)"
    ),
    tags=("warehouse", "planning"),
)

# -- x544: cycle-time quantiles ------------------------------------------------------------------

_X544 = """
    WITH order_ship AS (
      SELECT o.o_orderpriority AS priority,
             {datediff} AS lag_days
      FROM orders o
      JOIN (
        SELECT l_orderkey, MAX(l_shipdate) AS last_ship
        FROM lineitem GROUP BY l_orderkey
      ) l ON o.o_orderkey = l.l_orderkey
    ),
    ranked AS (
      SELECT priority, lag_days,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY lag_days) AS rk,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM order_ship
    )
    SELECT priority, CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(CASE WHEN rk = (n + 1) {intdiv} 2
                         THEN lag_days END) AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN rk = (9 * n + 9) {intdiv} 10
                         THEN lag_days END) AS BIGINT) AS p90_days,
           CAST(MAX(CASE WHEN rk = (99 * n + 99) {intdiv} 100
                         THEN lag_days END) AS BIGINT) AS p99_days
    FROM ranked GROUP BY priority ORDER BY priority
"""

register_sql(
    "x544_cycle_time_quantiles",
    spark_sql=_X544.format(
        intdiv="DIV", datediff="DATEDIFF(l.last_ship, o.o_orderdate)"
    ),
    duckdb_sql=_X544.format(
        intdiv="//",
        datediff="DATEDIFF('day', o.o_orderdate, l.last_ship)",
    ),
    tags=("warehouse", "stats"),
)

# -- x545: single-source risk ----------------------------------------------------------------------

_X545 = """
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    shares AS (
      SELECT l_partkey, qty,
             SUM(qty) OVER (PARTITION BY l_partkey) AS tot
      FROM supply
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(MAX(tot) AS DECIMAL(38,2)) AS total_qty,
             CAST(MAX(qty) AS DECIMAL(38,2)) AS top_qty,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             -- part-level supplier HHI, 1e6-quantized shares squared
             CAST(SUM(CAST(FLOOR(POWER(CAST(qty AS DOUBLE), 2) * 1e6
                                 / POWER(CAST(tot AS DOUBLE), 2))
                           AS BIGINT)) AS BIGINT) AS hhi_fp
      FROM shares GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(AVG(n_suppliers) AS DOUBLE), 4)
             AS mean_suppliers_per_part,
           CAST(SUM(CASE WHEN CAST(top_qty AS DOUBLE)
                              / CAST(total_qty AS DOUBLE) > 0.8
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS single_sourced_parts,
           ROUND(CAST(SUM(CASE WHEN CAST(top_qty AS DOUBLE)
                                    / CAST(total_qty AS DOUBLE) > 0.8
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS single_source_share,
           ROUND(CAST(SUM(hhi_fp) AS DOUBLE) / COUNT(*) / 1e6, 6)
             AS mean_part_hhi
    FROM per_part
"""

register_sql(
    "x545_single_source_risk",
    spark_sql=_X545,
    duckdb_sql=_X545,
    tags=("warehouse", "planning"),
)
