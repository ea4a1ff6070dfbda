"""Fifty-eighth extension wave — cohort economics and inventory audit:

x267 cohort ltv      cumulative revenue per first-seen-day cohort by day
                     offset — the LTV curve build (revenue counterpart of
                     the retention-count matrix x164)
x268 welch t         Welch's unequal-variance t statistic between the
                     spend of even- vs odd-parity users — exact decimal
                     moment sums, one closed-form double
x269 catalog coverage never-ordered part rate per brand via anti-join —
                     the assortment dead-stock audit

Scale shapes: x267 reduces to (cohort, offset) cells; x268 is a 2-group
moment aggregate; x269 is one anti-join on the part key rolled up per
brand.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x267: cohort LTV curve --------------------------------------------------

_X267_FMT = """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    spend AS (
      SELECT e.user_id, f.d0,
             CAST({offset_days} AS BIGINT) AS day_offset,
             CAST(ROUND(e.value, 2) AS DECIMAL(18,2)) AS v
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    ),
    cells AS (
      SELECT d0 AS cohort_day, day_offset, SUM(v) AS rev
      FROM spend GROUP BY d0, day_offset
    )
    SELECT cohort_day, day_offset,
           ROUND(CAST(SUM(rev) OVER (PARTITION BY cohort_day ORDER BY day_offset
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
             AS cum_revenue
    FROM cells
    ORDER BY cohort_day, day_offset LIMIT 400
"""

register_sql(
    "x267_cohort_ltv",
    spark_sql=_X267_FMT.format(
        offset_days="DATEDIFF(CAST(e.ts AS DATE), f.d0)"
    ),
    duckdb_sql=_X267_FMT.format(
        offset_days="datediff('day', f.d0, CAST(e.ts AS DATE))"
    ),
    tags=("cohort", "revenue", "window"),
)

# -- x268: Welch's t ---------------------------------------------------------

_X268_BODY = """
    WITH s AS (
      SELECT CAST(user_id % 2 AS INT) AS grp,
             CAST(ROUND(value, 2) AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS DOUBLE) AS sx,
             CAST(SUM(v * v) AS DOUBLE) AS sxx
      FROM s GROUP BY grp
    ),
    wide AS (
      SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n0,
             MAX(CASE WHEN grp = 0 THEN sx END) AS sx0,
             MAX(CASE WHEN grp = 0 THEN sxx END) AS sxx0,
             MAX(CASE WHEN grp = 1 THEN n END) AS n1,
             MAX(CASE WHEN grp = 1 THEN sx END) AS sx1,
             MAX(CASE WHEN grp = 1 THEN sxx END) AS sxx1
      FROM m
    )
    SELECT n0, n1,
           CAST(FLOOR(1e6 * (((sx0 / n0) - (sx1 / n1))
                 / SQRT((((sxx0 - (sx0 * sx0) / n0) / (n0 - 1)) / n0)
                        + (((sxx1 - (sx1 * sx1) / n1) / (n1 - 1)) / n1))))
                AS BIGINT) AS welch_t_micro
    FROM wide
"""

register_sql(
    "x268_welch_t",
    spark_sql=_X268_BODY,
    duckdb_sql=_X268_BODY,
    tags=("stats", "experiment"),
)

# -- x269: catalog coverage --------------------------------------------------

_X269_BODY = """
    WITH ordered_parts AS (
      SELECT DISTINCT l_partkey FROM lineitem
    ),
    flags AS (
      SELECT p.p_brand AS brand,
             CASE WHEN o.l_partkey IS NULL THEN 1 ELSE 0 END AS dead
      FROM part p LEFT JOIN ordered_parts o ON p.p_partkey = o.l_partkey
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(dead) AS BIGINT) AS n_never_ordered,
           CAST(FLOOR(1e6 * (CAST(SUM(dead) AS DOUBLE) / COUNT(*))) AS BIGINT)
             AS dead_rate_micro
    FROM flags GROUP BY brand ORDER BY brand
"""

register_sql(
    "x269_catalog_coverage",
    spark_sql=_X269_BODY,
    duckdb_sql=_X269_BODY,
    tags=("audit", "join"),
)
