"""Wave 150 (x519–x521): adoption curves, retention decay, and skew
salting.

x519 — Bass diffusion estimated by the classic OLS discretization:
daily signups n_t regressed on cumulative adopters N_{t−1} and N²_{t−1}
(n = a + bN + cN²; p = a/m, q = b + p, m from the quadratic root) —
LINEAR in the regressors, so the x477 two-variable closed form applies
and the innovation/imitation split (p, q) drops out of exact moments.

x520 — retention-decay fit: the x164 cohort curve compressed to a
model — log-linear OLS of retention share on cohort age gives the
daily decay rate and half-life per signup cohort week.  Shares are
exact integer ratios; log points 1e9-quantized into the linreg
moments.

x521 — skew-salting plan: per hot user_id key (top 10 by frequency),
the salt factor that caps a salted partition at 2× the average key
load — ceil(key_rows / (2·avg)) — plus the max-partition improvement
factor.  The PLANNING step ahead of x206's measured salted
aggregation; exact integer counts end to end.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x519: Bass diffusion -----------------------------------------------------------------

_X519 = """
    WITH daily AS (
      SELECT {epoch} {intdiv} 86400 AS dkey,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS adopters
      FROM events WHERE event_type = 'signup'
      GROUP BY {epoch} {intdiv} 86400
    ),
    cum AS (
      SELECT dkey, adopters AS n_t,
             CAST(COALESCE(SUM(adopters) OVER (ORDER BY dkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS n_prev
      FROM daily
    ),
    moms AS (
      -- y = n_t ; x1 = N(t-1) ; x2 = N(t-1)^2 (exact integers)
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(n_t AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(n_prev AS DECIMAL(18,0))) AS DECIMAL(38,0))
               AS s1,
             CAST(SUM(CAST(n_prev AS DECIMAL(18,0)) * n_prev)
                  AS DECIMAL(38,0)) AS s2,
             CAST(SUM(CAST(n_prev AS DECIMAL(18,0)) * n_prev * n_prev)
                  AS DECIMAL(38,0)) AS s12,
             CAST(SUM(CAST(n_prev AS DECIMAL(18,0)) * n_prev * n_prev
                      * n_prev) AS DECIMAL(38,0)) AS s22,
             CAST(SUM(CAST(n_prev AS DECIMAL(18,0)) * n_t)
                  AS DECIMAL(38,0)) AS s1y,
             CAST(SUM(CAST(n_prev AS DECIMAL(18,0)) * n_prev * n_t)
                  AS DECIMAL(38,0)) AS s2y
      FROM cum
    ),
    centered AS (
      SELECT n,
             CAST(n * s2 - s1 * s1 AS DOUBLE) AS c11,
             CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
             CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
             CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
             CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
             CAST(sy AS DOUBLE) AS sy_d, CAST(s1 AS DOUBLE) AS s1_d,
             CAST(s2 AS DOUBLE) AS s2_d
      FROM moms
    ),
    fit AS (
      SELECT n,
             (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b_lin,
             (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS c_quad,
             (sy_d - ((c22 * c1y - c12 * c2y)
                      / (c11 * c22 - c12 * c12)) * s1_d
                   - ((c11 * c2y - c12 * c1y)
                      / (c11 * c22 - c12 * c12)) * s2_d) / n AS a_const
      FROM centered WHERE c11 * c22 - c12 * c12 != 0
    )
    SELECT n AS n_days,
           ROUND(a_const, 6) AS bass_a,
           ROUND(b_lin, 9) AS bass_b,
           ROUND(c_quad, 12) AS bass_c,
           -- m = (-b - sqrt(b^2 - 4ac)) / (2c) (market potential root)
           CASE WHEN c_quad < 0
                 AND b_lin * b_lin - 4 * a_const * c_quad >= 0 THEN
             ROUND((-b_lin - SQRT(b_lin * b_lin - 4 * a_const * c_quad))
                   / (2 * c_quad), 2)
           END AS market_potential_m,
           CASE WHEN c_quad < 0
                 AND b_lin * b_lin - 4 * a_const * c_quad >= 0 THEN
             ROUND(a_const
                   / ((-b_lin - SQRT(b_lin * b_lin
                                     - 4 * a_const * c_quad))
                      / (2 * c_quad)), 6)
           END AS innovation_p
    FROM fit
"""

register_sql(
    "x519_bass_diffusion",
    spark_sql=_X519.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X519.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("events", "stats"),
)

# -- x520: retention decay fit -------------------------------------------------------------

_X520 = """
    WITH first_seen AS (
      SELECT user_id, MIN({epoch} {intdiv} 86400) AS d0
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             ({epoch} {intdiv} 86400) - f.d0 AS age
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    ),
    cohort_size AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM first_seen
    ),
    by_age AS (
      SELECT age, CAST(COUNT(*) AS BIGINT) AS active
      FROM activity WHERE age BETWEEN 1 AND 20 GROUP BY age
    ),
    pts AS (
      -- x = age ; y = ln(active/n0), 1e9-quantized
      SELECT CAST(b.age AS BIGINT) AS x,
             CAST(FLOOR(LN(CAST(b.active AS DOUBLE) / c.n0) * 1e9)
                  AS BIGINT) AS y
      FROM by_age b CROSS JOIN cohort_size c
    ),
    moms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * y) AS DECIMAL(38,0))
               AS sxy
      FROM pts
    )
    SELECT n AS n_ages,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS DECIMAL(18,0)) * sx AS DOUBLE)
                 / 1e9, 9) AS daily_decay_rate,
           CASE WHEN CAST(n * sxy - sx * sy AS DOUBLE) < 0 THEN
             ROUND(-LN(2.0)
                   / (CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - CAST(sx AS DECIMAL(18,0)) * sx
                             AS DOUBLE) / 1e9), 2)
           END AS half_life_days
    FROM moms WHERE n > 3
"""

register_sql(
    "x520_retention_decay_fit",
    spark_sql=_X520.format(intdiv="DIV", epoch="unix_seconds(e.ts)")
    .replace("MIN(unix_seconds(e.ts) DIV 86400)", "MIN(unix_seconds(ts) DIV 86400)"),
    duckdb_sql=_X520.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(e.ts)) AS BIGINT)"
    ).replace(
        "MIN(CAST(FLOOR(epoch(e.ts)) AS BIGINT) // 86400)",
        "MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400)",
    ),
    tags=("events", "stats"),
)

# -- x521: skew-salting plan ----------------------------------------------------------------

_X521 = """
    WITH key_counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    stats AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM key_counts
    ),
    hot AS (
      SELECT k.user_id, k.c,
             ROW_NUMBER() OVER (ORDER BY k.c DESC, k.user_id) AS rk,
             s.total, s.n_keys
      FROM key_counts k CROSS JOIN stats s
    )
    SELECT CAST(user_id AS BIGINT) AS hot_key,
           c AS key_rows,
           -- FLOOR-quantized: ROUND(,2) split engines on .5 boundaries
           CAST(FLOOR(CAST(c AS DOUBLE)
                      / (CAST(total AS DOUBLE) / n_keys) * 100) AS BIGINT)
             AS skew_factor_x100,
           -- salt so a salted partition holds <= 2x the average key load
           CAST(CEIL(CAST(c AS DOUBLE)
                     / (2.0 * total / n_keys)) AS BIGINT) AS salt_factor,
           CAST(FLOOR(CAST(c AS DOUBLE)
                      / CEIL(CAST(c AS DOUBLE) / (2.0 * total / n_keys))
                      / (CAST(total AS DOUBLE) / n_keys) * 100) AS BIGINT)
             AS max_partition_after_salt_x100
    FROM hot WHERE rk <= 10 ORDER BY key_rows DESC, hot_key
"""

register_sql(
    "x521_salt_plan",
    spark_sql=_X521,
    duckdb_sql=_X521,
    tags=("planning", "profiling"),
)
