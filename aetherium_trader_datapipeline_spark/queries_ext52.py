"""Fifty-second extension wave — longitudinal customer analytics:

x255 decile migration  customer revenue-decile transition matrix between
                       two periods (1996 vs 1997): where does each decile
                       move — the retention-economics migration table
x256 user lifetime     per-user lifetime span, active days, and activity
                       density (events per active day) — integer/exact

Scale shapes: x255 is two per-period aggregates + ntile windows over
|customers| rows, then a 10×10 matrix rollup; x256 is one aggregation
keyed by user.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x255: revenue-decile migration -----------------------------------------

_X255_BODY = """
    WITH rev AS (
      SELECT o_custkey AS ck,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders
      WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
    ),
    d AS (
      SELECT ck, yr,
             CAST(NTILE(10) OVER (PARTITION BY yr ORDER BY r, ck) AS BIGINT) AS decile
      FROM rev
    ),
    m AS (
      SELECT a.decile AS decile_1996, b.decile AS decile_1997
      FROM d a JOIN d b ON a.ck = b.ck AND a.yr = 1996 AND b.yr = 1997
    )
    SELECT decile_1996, decile_1997, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM m GROUP BY decile_1996, decile_1997
    ORDER BY decile_1996, decile_1997
"""

register_sql(
    "x255_decile_migration",
    spark_sql=_X255_BODY,
    duckdb_sql=_X255_BODY,
    tags=("analytics", "window", "join"),
)

# -- x256: user lifetime stats ----------------------------------------------

_X256_FMT = """
    WITH peru AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
             CAST({span_days} AS BIGINT) AS span_days
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, active_days, span_days,
           CAST(FLOOR(1e3 * (CAST(n_events AS DOUBLE) / active_days)) AS BIGINT)
             AS events_per_active_day_milli,
           CAST(FLOOR(1e6 * (CAST(active_days AS DOUBLE) / (span_days + 1))) AS BIGINT)
             AS density_micro
    FROM peru ORDER BY user_id LIMIT 300
"""

register_sql(
    "x256_user_lifetime",
    spark_sql=_X256_FMT.format(
        span_days="DATEDIFF(CAST(MAX(ts) AS DATE), CAST(MIN(ts) AS DATE))"
    ),
    duckdb_sql=_X256_FMT.format(
        span_days="datediff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))"
    ),
    tags=("analytics", "agg"),
)
