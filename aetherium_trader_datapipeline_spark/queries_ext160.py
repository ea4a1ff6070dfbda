"""Wave 160 (x549–x550): selection-bias demonstrations — the
methodological bookends to x448's Simpson reversal.

x549 — survivorship bias, measured: per-user activity metrics computed
on the FULL panel vs only on "survivors" (users still active in the
final week).  The survivor-only mean overstates engagement by a
measured factor — the bias every retention dashboard quietly bakes in
when it filters to active users.  Exact integer sums both ways.

x550 — Berkson (collider) selection: value and activity are nearly
uncorrelated in the full population; conditioning on the union
"high-activity OR high-value" (the shape of any TOP-USERS list)
induces a spurious negative correlation between them.  Both
correlations from DECIMAL-exact moments; the sign flip is the
demonstration.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x549: survivorship bias -----------------------------------------------------------------

_X549 = """
    WITH per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT)
               AS value_fp,
             MAX({day}) AS last_day
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    tagged AS (
      SELECT *, CASE WHEN last_day >= 24 THEN 1 ELSE 0 END AS survivor
      FROM per_user
    )
    SELECT 'all_users' AS panel,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 4)
             AS mean_events_per_user,
           ROUND(CAST(SUM(value_fp) AS DOUBLE) / COUNT(*) / 1e6, 4)
             AS mean_value_per_user
    FROM tagged
    UNION ALL
    SELECT 'survivors_only',
           CAST(SUM(survivor) AS BIGINT),
           ROUND(CAST(SUM(CASE WHEN survivor = 1 THEN n_events ELSE 0 END)
                      AS DOUBLE) / SUM(survivor), 4),
           ROUND(CAST(SUM(CASE WHEN survivor = 1 THEN value_fp ELSE 0 END)
                      AS DOUBLE) / SUM(survivor) / 1e6, 4)
    FROM tagged
    ORDER BY panel
"""

register_sql(
    "x549_survivorship_bias",
    spark_sql=_X549.format(day="dayofmonth(ts)"),
    duckdb_sql=_X549.format(day="CAST(EXTRACT(day FROM ts) AS BIGINT)"),
    tags=("stats", "events"),
)

# -- x550: Berkson selection ------------------------------------------------------------------

_X550 = """
    WITH per_user AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    thresholds AS (
      -- exact 70th-percentile cutoffs by rank selection
      SELECT
        (SELECT x FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rk,
                               COUNT(*) OVER () AS n FROM per_user) r
          WHERE rk = (7 * n + 9) {intdiv} 10) AS x_cut,
        (SELECT y FROM (SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS rk,
                               COUNT(*) OVER () AS n FROM per_user) r
          WHERE rk = (7 * n + 9) {intdiv} 10) AS y_cut
    ),
    tagged AS (
      SELECT p.x, p.y,
             CASE WHEN p.x >= t.x_cut OR p.y >= t.y_cut THEN 1 ELSE 0 END
               AS selected
      FROM per_user p CROSS JOIN thresholds t
    ),
    moms AS (
      SELECT selected_grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * x) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(18,0)) * y) AS DECIMAL(38,0))
               AS syy,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * y) AS DECIMAL(38,0))
               AS sxy
      FROM (
        SELECT x, y, 'full_population' AS selected_grp FROM tagged
        UNION ALL
        SELECT x, y, 'selected_top_list' FROM tagged WHERE selected = 1
      ) u GROUP BY selected_grp
    )
    SELECT selected_grp AS panel, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                   / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS corr_activity_value
    FROM moms ORDER BY panel
"""

register_sql(
    "x550_berkson_selection",
    spark_sql=_X550.format(intdiv="DIV"),
    duckdb_sql=_X550.format(intdiv="//"),
    tags=("stats", "events"),
)
