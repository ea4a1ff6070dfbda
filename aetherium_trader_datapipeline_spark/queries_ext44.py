"""Forty-fourth extension wave — portfolio risk:

x234 var_es      historical-simulation Value-at-Risk and Expected
                 Shortfall of the equal-weight portfolio: daily portfolio
                 returns (cross-sectional mean of per-instrument daily
                 returns, quantized to DECIMAL(19,7)), exact p05 rank
                 statistic, and the tail mean as an exact decimal sum —
                 no approx percentiles anywhere
x235 flow_imbalance hourly signed order-flow imbalance (x213's side/qty
                 synthesis) joined to the next hour's price move — the
                 microstructure predictive-signal table

Scale shapes: x234 reduces to |days| rows before ranking; x235 is two
hourly aggregations joined on an integer hour key.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x234: historical VaR + expected shortfall ------------------------------

_X234_FMT = """
    WITH dp AS (
      SELECT user_id, CAST(ts AS DATE) AS d, MAX_BY(value, event_id) AS px
      FROM events WHERE value > 0 GROUP BY user_id, CAST(ts AS DATE)
    ),
    r AS (
      SELECT user_id, d,
             CAST(ROUND(px / NULLIF(LAG(px) OVER (PARTITION BY user_id ORDER BY d), 0) - 1, 7)
                  AS DECIMAL(19,7)) AS r
      FROM dp
    ),
    port AS (
      SELECT d, CAST(ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*), 7) AS DECIMAL(19,7)) AS pr
      FROM r WHERE r IS NOT NULL GROUP BY d
    ),
    ranked AS (
      SELECT d, pr, ROW_NUMBER() OVER (ORDER BY pr, d) AS rk,
             COUNT(*) OVER () AS n
      FROM port
    ),
    kth AS (SELECT CAST(CEIL(0.05 * MAX(n)) AS BIGINT) AS k, MAX(n) AS n FROM ranked)
    SELECT kth.n AS n_days, kth.k,
           CAST(FLOOR(1e6 * CAST(MAX(CASE WHEN ranked.rk = kth.k THEN ranked.pr END) AS DOUBLE))
                AS BIGINT) AS var05_micro,
           CAST(FLOOR(1e6 * (CAST(SUM(CASE WHEN ranked.rk <= kth.k THEN ranked.pr
                                            ELSE CAST(0 AS DECIMAL(19,7)) END) AS DOUBLE)
                             / kth.k)) AS BIGINT) AS es05_micro
    FROM ranked CROSS JOIN kth
    GROUP BY kth.n, kth.k
"""

_X234_DUCK = _X234_FMT.replace("MAX_BY(value, event_id)", "arg_max(value, event_id)")

register_sql(
    "x234_var_es",
    spark_sql=_X234_FMT,
    duckdb_sql=_X234_DUCK,
    tags=("finance", "risk", "window"),
)

# -- x235: order-flow imbalance vs next-hour move ---------------------------

_X235_FMT = """
    WITH tr AS (
      SELECT user_id, {hourkey} AS h,
             CASE WHEN event_type IN ('click','view','signup') THEN 1 ELSE -1 END
               * CAST(1 + event_id % 3 AS BIGINT) AS signed_qty,
             event_id, value
      FROM events WHERE value > 0
    ),
    flow AS (
      SELECT user_id, h,
             CAST(SUM(signed_qty) AS BIGINT) AS imbalance,
             CAST(SUM(ABS(signed_qty)) AS BIGINT) AS volume,
             MAX_BY(value, event_id) AS close_px
      FROM tr GROUP BY user_id, h
    ),
    j AS (
      SELECT f.user_id, f.h, f.imbalance, f.volume,
             CAST(ROUND(n.close_px / NULLIF(f.close_px, 0) - 1, 7) AS DECIMAL(19,7)) AS next_ret
      FROM flow f JOIN flow n ON f.user_id = n.user_id AND n.h = f.h + 1
    )
    SELECT user_id, h, imbalance, volume,
           CAST(FLOOR(1e6 * CAST(next_ret AS DOUBLE)) AS BIGINT) AS next_ret_micro
    FROM j ORDER BY user_id, h LIMIT 500
"""

_X235_SPARK = _X235_FMT.format(hourkey="CAST(FLOOR(unix_seconds(ts) / 3600) AS BIGINT)")
_X235_DUCK = _X235_FMT.format(hourkey="CAST(FLOOR(epoch(ts) / 3600) AS BIGINT)").replace(
    "MAX_BY(value, event_id)", "arg_max(value, event_id)"
)

register_sql(
    "x235_flow_imbalance",
    spark_sql=_X235_SPARK,
    duckdb_sql=_X235_DUCK,
    tags=("finance", "microstructure", "join"),
)
