"""Wave 87 (x345–x347): calendar seasonality, randomness runs, concentration.

x345 — day-of-week return seasonality: mean and dispersion of daily
close-to-close returns grouped by weekday.  The engines disagree on
weekday numbering (Spark DAYOFWEEK is 1=Sunday, DuckDB dow is
0=Sunday), so both are normalized to 0=Monday in their own dialect —
the kind of silent off-by-one a cross-engine oracle exists to catch.
Per-day returns are quantized to 1e9 fixed-point before the per-weekday
sums (x321 discipline); dispersion is the exact integer sum of squared
fixed-point returns.

x346 — the Wald–Wolfowitz runs test on nonzero tick signs: too FEW
runs = trending, too MANY = mean-reverting bounce.  The run count is a
pure integer window computation (1 + sign changes over one per-sym
sort); expectation and variance under H₀ come from the exact +/−
counts, and the z-score is a handful of per-row IEEE ops.  Pairs with
x327 (same question via moments) — a series can pass one screen and
fail the other, which is why surveillance runs both.

x347 — Herfindahl–Hirschman concentration of each symbol's volume
across users: HHI = Σ share², reported with its effective-participant
count 1/HHI.  Squared shares are per-user scalars quantized to 1e12
BEFORE the cross-user sum (exact), and the share basis (DECIMAL volume
sums) is exact.  The flow-concentration screen next to x286's
partition-skew report — same math, different lake.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x345: day-of-week seasonality ---------------------------------------------

_X345_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, d, {close_px} AS close_px
      FROM ticks GROUP BY sym, d
    ),
    rets AS (
      SELECT sym, d,
             CAST(FLOOR((CAST(close_px AS DOUBLE)
                         / CAST(LAG(close_px) OVER (PARTITION BY sym ORDER BY d)
                                AS DOUBLE) - 1) * 1e9) AS BIGINT) AS ret_fp
      FROM daily
    ),
    tagged AS (
      SELECT {dow} AS dow, ret_fp FROM rets WHERE ret_fp IS NOT NULL
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(CAST(SUM(CAST(ret_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(*) / 1e9, 8) AS mean_ret,
           CAST(CAST(SUM(CAST(ret_fp AS DECIMAL(18,0)) * ret_fp)
                AS DECIMAL(38,0)) AS DOUBLE) / 1e18 AS sum_sq_ret
    FROM tagged GROUP BY dow ORDER BY dow
"""

register_sql(
    "x345_dow_seasonality",
    spark_sql=_X345_FMT.format(
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
        dow="(DAYOFWEEK(d) + 5) % 7",
    ),
    duckdb_sql=_X345_FMT.format(
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
        dow="(CAST(extract('dow' FROM d) AS BIGINT) + 6) % 7",
    ),
    tags=("finance", "window"),
)

# -- x346: Wald-Wolfowitz runs test --------------------------------------------

_X346 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    d AS (
      SELECT sym, ts, event_id,
             px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) AS dp
      FROM ticks
    ),
    signs AS (
      SELECT sym, ts, event_id,
             CASE WHEN dp > 0 THEN 1 ELSE -1 END AS s
      FROM d WHERE dp IS NOT NULL AND dp <> 0
    ),
    changes AS (
      SELECT sym, s,
             CASE WHEN LAG(s) OVER (PARTITION BY sym ORDER BY ts, event_id) IS NULL
                  THEN 1
                  WHEN LAG(s) OVER (PARTITION BY sym ORDER BY ts, event_id) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signs
    ),
    agg AS (
      SELECT sym,
             CAST(SUM(new_run) AS BIGINT) AS runs,
             CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      FROM changes GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, runs, n_pos, n_neg,
           ROUND(CAST(2 AS DOUBLE) * n_pos * n_neg / (n_pos + n_neg) + 1, 4)
             AS expected_runs,
           ROUND((runs - (CAST(2 AS DOUBLE) * n_pos * n_neg / (n_pos + n_neg) + 1))
                 / SQRT(CAST(2 AS DOUBLE) * n_pos * n_neg
                        * (CAST(2 AS DOUBLE) * n_pos * n_neg - n_pos - n_neg)
                        / (POW(CAST(n_pos + n_neg AS DOUBLE), 2)
                           * (n_pos + n_neg - 1))), 4) AS z_score
    FROM agg ORDER BY sym
"""

register_sql(
    "x346_runs_test",
    spark_sql=_X346,
    duckdb_sql=_X346,
    tags=("finance", "stats"),
)

# -- x347: HHI volume concentration --------------------------------------------

_X347 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, user_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol
      FROM events WHERE value IS NOT NULL
    ),
    per_user AS (
      SELECT sym, user_id, CAST(SUM(vol) AS DECIMAL(28,6)) AS uvol
      FROM ticks GROUP BY sym, user_id
    ),
    per_sym AS (
      SELECT sym, CAST(SUM(uvol) AS DECIMAL(38,6)) AS tvol,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM per_user GROUP BY sym
    ),
    shares AS (
      SELECT u.sym, s.n_users,
             CAST(FLOOR(POW(CAST(u.uvol AS DOUBLE) / CAST(s.tvol AS DOUBLE), 2)
                        * 1e12) AS BIGINT) AS share_sq_fp
      FROM per_user u JOIN per_sym s ON u.sym = s.sym
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(MAX(n_users) AS BIGINT) AS n_users,
           ROUND(CAST(CAST(SUM(CAST(share_sq_fp AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS DOUBLE) / 1e12, 8) AS hhi,
           ROUND(1e12 / CAST(CAST(SUM(CAST(share_sq_fp AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS DOUBLE), 2) AS effective_users
    FROM shares GROUP BY sym ORDER BY sym
"""

register_sql(
    "x347_hhi_concentration",
    spark_sql=_X347,
    duckdb_sql=_X347,
    tags=("finance", "audit"),
)
