"""Wave 139 (x485–x487): proportion intervals, population estimation,
and ratio-metric variance.

x485 — Wilson score intervals for each event type's share of traffic:
the interval that stays inside [0,1] and behaves at extreme rates,
where the Wald interval (±1.96√(pq/n)) collapses — both are emitted so
the difference is visible.  Closed form over exact counts.

x486 — capture–recapture (Lincoln–Petersen with Chapman correction):
the corpus-population estimator applied to users — the first and
second half-month are two "captures", the overlap m sizes the
population N̂ = (n1+1)(n2+1)/(m+1) − 1.  The same estimator teams use
to size a dedup universe from two crawl snapshots; exact integer
counts, Chapman variance alongside.

x487 — delta-method standard error for a RATIO metric (value per
event, clustered by user): per-user (sum value, count) pairs make the
metric Σx/Σy; Var ≈ (σx² − 2R̂σxy + R̂²σy²)/(n·ȳ²) from DECIMAL-exact
user-level moments.  The variance every experimentation platform needs
for revenue-per-session metrics — naive per-event variance ignores the
user clustering and understates it.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x485: Wilson score interval -----------------------------------------------------------

_X485 = """
    WITH counts AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    ps AS (
      SELECT event_type, k, n,
             CAST(k AS DOUBLE) / n AS p,
             3.8416 / n AS z2n
      FROM counts
    )
    SELECT event_type, k, n,
           ROUND(p, 6) AS share,
           ROUND(GREATEST(0.0, p - 1.96 * SQRT(p * (1 - p) / n)), 6)
             AS wald_lo,
           ROUND(LEAST(1.0, p + 1.96 * SQRT(p * (1 - p) / n)), 6)
             AS wald_hi,
           ROUND((p + z2n / 2
                  - 1.96 * SQRT(p * (1 - p) / n + z2n / (4 * n)))
                 / (1 + z2n), 6) AS wilson_lo,
           ROUND((p + z2n / 2
                  + 1.96 * SQRT(p * (1 - p) / n + z2n / (4 * n)))
                 / (1 + z2n), 6) AS wilson_hi
    FROM ps ORDER BY event_type
"""

register_sql(
    "x485_wilson_ci",
    spark_sql=_X485,
    duckdb_sql=_X485,
    tags=("stats", "experiment"),
)

# -- x486: capture-recapture -----------------------------------------------------------------

_X486 = """
    WITH tagged AS (
      SELECT user_id,
             MAX(CASE WHEN {day} <= 15 THEN 1 ELSE 0 END) AS in_first,
             MAX(CASE WHEN {day} > 15 THEN 1 ELSE 0 END) AS in_second
      FROM events GROUP BY user_id
    ),
    counts AS (
      SELECT CAST(SUM(in_first) AS BIGINT) AS n1,
             CAST(SUM(in_second) AS BIGINT) AS n2,
             CAST(SUM(in_first * in_second) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS true_n
      FROM tagged
    )
    SELECT n1 AS first_capture, n2 AS second_capture, m AS recaptured,
           true_n AS true_population,
           CAST((n1 + 1) * (n2 + 1) {intdiv} (m + 1) - 1 AS BIGINT)
             AS chapman_estimate,
           ROUND(SQRT(CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
                      * (n1 - m) * (n2 - m)
                      / ((m + 1) * (m + 1) * (m + 2))), 2)
             AS chapman_se,
           ROUND(CAST((n1 + 1) * (n2 + 1) {intdiv} (m + 1) - 1 AS DOUBLE)
                 / true_n, 6) AS estimate_over_truth
    FROM counts
"""

register_sql(
    "x486_capture_recapture",
    spark_sql=_X486.format(
        intdiv="DIV",
        day="dayofmonth(ts)",
    ),
    duckdb_sql=_X486.format(
        intdiv="//",
        day="CAST(EXTRACT(day FROM ts) AS BIGINT)",
    ),
    tags=("stats", "dedup"),
)

# -- x487: delta-method ratio metric -----------------------------------------------------------

_X487 = """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    moms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(18,0)) * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * y) AS DECIMAL(38,0)) AS sxy
      FROM per_user
    ),
    stats AS (
      SELECT n,
             CAST(sx AS DOUBLE) / sy AS r_hat,
             CAST(sy AS DOUBLE) / n AS ybar,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)
               AS vx,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)
               AS vy,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1)
               AS cxy
      FROM moms
    )
    SELECT n AS n_users,
           ROUND(r_hat / 1e6, 6) AS value_per_event,
           ROUND(SQRT(GREATEST(0.0,
                 (vx - 2 * r_hat * cxy + r_hat * r_hat * vy)
                 / (n * ybar * ybar))) / 1e6, 9) AS delta_method_se,
           -- the WRONG (unclustered, per-event) SE for contrast
           ROUND(SQRT(vx / n) / ybar / 1e6, 9) AS naive_se_ignoring_ratio
    FROM stats
"""

register_sql(
    "x487_ratio_metric_delta",
    spark_sql=_X487,
    duckdb_sql=_X487,
    tags=("experiment", "stats"),
)
