"""Fifty-seventh extension wave — risk velocity and trend estimation:

x265 velocity flags  trailing-2-hour event-velocity check per user
                     (RANGE frame over epoch seconds) — the fraud/abuse
                     rapid-fire detector; flags events whose trailing
                     window reaches a threshold count (window sized to
                     the fixtures' event density; the frame expression
                     is identical at any horizon)
x266 share trend     OLS slope of each event type's daily share of
                     traffic (micro-floored) — is the mix shifting —
                     from exact integer counts and decimal share sums

Scale shapes: x265 is one window pass keyed by user with a RANGE frame
(no row materialization beyond the frame); x266 reduces to |days| ×
|types| cells before regression sums.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x265: rapid-fire velocity flags ----------------------------------------

_X265_FMT = """
    WITH e AS (
      SELECT user_id, event_id, {epoch} AS es
      FROM events
    ),
    w AS (
      SELECT user_id, event_id,
             CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY es
                                 RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_window
      FROM e
    )
    SELECT user_id, event_id, n_window
    FROM w WHERE n_window >= 3
    ORDER BY user_id, event_id LIMIT 500
"""

register_sql(
    "x265_velocity_flags",
    spark_sql=_X265_FMT.format(epoch="unix_seconds(ts)"),
    duckdb_sql=_X265_FMT.format(epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"),
    tags=("risk", "window"),
)

# -- x266: traffic-mix share trend ------------------------------------------

_X266_BODY = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY CAST(ts AS DATE), event_type
    ),
    tot AS (
      SELECT d, CAST(SUM(n) AS BIGINT) AS dn FROM daily GROUP BY d
    ),
    obs AS (
      SELECT daily.event_type,
             CAST(ROW_NUMBER() OVER (PARTITION BY daily.event_type ORDER BY daily.d)
                  AS DECIMAL(18,0)) AS x,
             CAST(ROUND(1e6 * CAST(daily.n AS DOUBLE) / tot.dn) AS DECIMAL(18,0)) AS y
      FROM daily JOIN tot ON daily.d = tot.d
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM obs GROUP BY event_type
    )
    SELECT event_type, n_days,
           CAST(FLOOR((n_days * sxy - sx * sy) / (n_days * sxx - sx * sx)) AS BIGINT)
             AS share_slope_ppm_per_day
    FROM m WHERE n_days > 2 ORDER BY event_type
"""

register_sql(
    "x266_share_trend",
    spark_sql=_X266_BODY,
    duckdb_sql=_X266_BODY,
    tags=("analytics", "regression"),
)
