"""Fifty-fourth extension wave — growth accounting:

x259 growth accounting  per-period active-user movement: new / retained /
                        resurrected / churned (the growth-accounting
                        identity: actives_p = new + retained +
                        resurrected; churned counts against p-1). The
                        fixtures span one month, so the period is a DAY
                        here — the expressions are identical at month
                        granularity.
x260 nrr                net revenue retention per period: revenue in p
                        from users who purchased in p-1, over those same
                        users' p-1 revenue

Scale shapes: both reduce to per-(user, month) aggregates first; the
movement classification is a self-join on adjacent integer month keys.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x259: growth accounting -------------------------------------------------

_X259_FMT = """
    WITH um AS (
      SELECT DISTINCT user_id, {mkey} AS m FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(m) AS m0 FROM um GROUP BY user_id
    ),
    classified AS (
      SELECT cur.m,
             CASE WHEN f.m0 = cur.m THEN 'new'
                  WHEN prev.user_id IS NOT NULL THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM um cur
      JOIN firsts f ON cur.user_id = f.user_id
      LEFT JOIN um prev ON cur.user_id = prev.user_id AND prev.m = cur.m - 1
    ),
    churned AS (
      SELECT prev.m + 1 AS m, CAST(COUNT(*) AS BIGINT) AS churned
      FROM um prev
      LEFT JOIN um cur ON prev.user_id = cur.user_id AND cur.m = prev.m + 1
      WHERE cur.user_id IS NULL
      GROUP BY prev.m + 1
    ),
    moves AS (
      SELECT m,
             CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS retained,
             CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS resurrected,
             CAST(COUNT(*) AS BIGINT) AS mau
      FROM classified GROUP BY m
    )
    SELECT mv.m AS period_key, mv.mau, mv.new_users, mv.retained, mv.resurrected,
           CAST(COALESCE(c.churned, 0) AS BIGINT) AS churned
    FROM moves mv LEFT JOIN churned c ON mv.m = c.m
    ORDER BY mv.m
"""

register_sql(
    "x259_growth_accounting",
    spark_sql=_X259_FMT.format(
        mkey="unix_seconds(ts) DIV 86400"
    ),
    duckdb_sql=_X259_FMT.format(
        mkey="CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)"
    ),
    tags=("growth", "analytics", "join"),
)

# -- x260: net revenue retention --------------------------------------------

_X260_FMT = """
    WITH rev AS (
      SELECT user_id, {mkey} AS m,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS r
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, {mkey}
    ),
    paired AS (
      SELECT prev.m + 1 AS m,
             SUM(prev.r) AS base_rev,
             SUM(COALESCE(cur.r, CAST(0.00 AS DECIMAL(18,2)))) AS retained_rev,
             CAST(COUNT(*) AS BIGINT) AS n_base_users
      FROM rev prev
      LEFT JOIN rev cur ON prev.user_id = cur.user_id AND cur.m = prev.m + 1
      GROUP BY prev.m + 1
    )
    SELECT m AS period_key, n_base_users,
           ROUND(CAST(base_rev AS DOUBLE), 2) AS base_rev,
           ROUND(CAST(retained_rev AS DOUBLE), 2) AS retained_rev,
           CAST(FLOOR(1e6 * (CAST(retained_rev AS DOUBLE) / CAST(base_rev AS DOUBLE)))
                AS BIGINT) AS nrr_micro
    FROM paired ORDER BY m
"""

register_sql(
    "x260_nrr",
    spark_sql=_X260_FMT.format(
        mkey="unix_seconds(ts) DIV 86400"
    ),
    duckdb_sql=_X260_FMT.format(
        mkey="CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)"
    ),
    tags=("growth", "revenue", "join"),
)
