"""Wave 97 (x375–x377): streaks, Pareto concentration, seasonality strength.

x375 — longest up/down STREAKS per symbol: the gaps-and-islands
grouping key (row_number minus per-sign row_number — both off one
(sym, ts) sort) turns consecutive same-sign runs into islands; the
answer is the max island size per direction.  Complements x346: the
runs TEST says whether the sign process is random; the longest streak
is the tail statistic a risk desk actually asks about ("worst losing
streak in the sample").

x376 — the Pareto/80-20 point of volume concentration: the smallest
number of users covering 80% of each symbol's volume, plus the share
of the top-1 user.  One rank-by-volume window and one running-sum
threshold selection per symbol (DECIMAL-exact volumes) — the
concentration CURVE's operating point, where x347's HHI is its scalar
summary.

x377 — seasonality STRENGTH: the share of daily-volume variance
explained by hour-of-day means, R² = 1 − SS_within/SS_total over
(sym, day, hour) cells — the effect-size companion to x362's per-cell
anomaly flags (a 3σ flag means little if the seasonal profile explains
2% of variance).  Sums of squares accumulate in DECIMAL (exact); the
single division per symbol is per-row IEEE.  Identity used:
SS_within = Σ(v²) − Σ_h(S_h²/n_h), both terms exact.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x375: longest signed streaks ----------------------------------------------

_X375 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    signs AS (
      SELECT sym, ts, event_id,
             CASE WHEN px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) > 0
                  THEN 1
                  WHEN px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) < 0
                  THEN -1 END AS s
      FROM ticks
    ),
    keyed AS (
      SELECT sym, s,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY sym, s ORDER BY ts, event_id)
               AS grp
      FROM signs WHERE s IS NOT NULL
    ),
    islands AS (
      SELECT sym, s, grp, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM keyed GROUP BY sym, s, grp
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(MAX(CASE WHEN s = 1 THEN run_len END) AS BIGINT) AS longest_up,
           CAST(MAX(CASE WHEN s = -1 THEN run_len END) AS BIGINT) AS longest_down,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM islands GROUP BY sym ORDER BY sym
"""

register_sql(
    "x375_longest_streaks",
    spark_sql=_X375,
    duckdb_sql=_X375,
    headline=True,
    tags=("finance", "window"),
)

# -- x376: Pareto 80/20 concentration point ------------------------------------

_X376 = """
    WITH per_user AS (
      SELECT user_id % 10 AS sym, user_id,
             CAST(SUM(CAST(ABS(value) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS uvol
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id % 10, user_id
    ),
    ranked AS (
      SELECT sym, uvol,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY uvol DESC, user_id) AS r,
             SUM(uvol) OVER (PARTITION BY sym ORDER BY uvol DESC, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(uvol) OVER (PARTITION BY sym) AS tot,
             COUNT(*) OVER (PARTITION BY sym) AS n_users
      FROM per_user
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST(MIN(CASE WHEN cum * 5 >= tot * 4 THEN r END) AS BIGINT)
             AS users_for_80pct,
           ROUND(CAST(MAX(CASE WHEN r = 1 THEN cum END) AS DOUBLE)
                 / CAST(MAX(tot) AS DOUBLE), 6) AS top1_share
    FROM ranked GROUP BY sym ORDER BY sym
"""

register_sql(
    "x376_pareto_concentration",
    spark_sql=_X376,
    duckdb_sql=_X376,
    tags=("finance", "audit"),
)

# -- x377: seasonality strength ------------------------------------------------

_X377_FMT = """
    WITH cells AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d, {hour_of} AS h,
             CAST(SUM(CAST(ABS(value) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id % 10, CAST(ts AS DATE), {hour_of}
    ),
    by_hour AS (
      SELECT sym, h,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(v) AS DECIMAL(38,6)) AS s_h,
             CAST(SUM(v * v) AS DECIMAL(38,6)) AS q_h
      FROM cells GROUP BY sym, h
    ),
    agg AS (
      SELECT sym,
             CAST(SUM(n_h) AS BIGINT) AS n,
             CAST(SUM(s_h) AS DECIMAL(38,6)) AS s,
             CAST(SUM(q_h) AS DECIMAL(38,6)) AS q,
             -- Σ_h S_h²/n_h: per-hour scalars, quantized to 1e6 before
             -- the cross-hour sum (24 terms, exact)
             CAST(SUM(CAST(FLOOR(CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)
                  / n_h * 1e6) AS BIGINT)) AS BIGINT) AS between_fp
      FROM by_hour GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(n AS BIGINT) AS n_cells,
           ROUND(1 - (CAST(q AS DOUBLE) - CAST(between_fp AS DOUBLE) / 1e6)
                     / (CAST(q AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n), 6)
             AS seasonal_r2
    FROM agg ORDER BY sym
"""

register_sql(
    "x377_seasonality_strength",
    spark_sql=_X377_FMT.format(hour_of="HOUR(ts)"),
    duckdb_sql=_X377_FMT.format(hour_of="CAST(extract('hour' FROM ts) AS INT)"),
    tags=("finance", "stats"),
)
