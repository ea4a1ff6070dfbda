"""Wave 101 (x384–x386): liquidity/spread estimators from trades alone.

The microstructure trio every execution/risk desk computes when quote
data is unavailable (reference scope: the engine only stores trades —
parquet.rs:28-43 has no bid/ask columns — so trade-only estimators ARE
the spread/liquidity surface):

x384 — Roll (1984) implied spread: adjacent price changes of a security
bouncing between bid and ask are negatively autocorrelated, and
cov(Δp_t, Δp_{t-1}) = −s²/4 ⇒ s = 2·√(−cov).  The lag covariance
demeans BOTH factors over the common lag-1 sample (per-lag means — the
x378 r6 lesson applied from the start, not retrofitted); all moment
sums are DECIMAL-exact, the final sqrt is per-row IEEE on a scalar.
Positive-cov symbols report NULL spread (the estimator is undefined
there — that is the textbook answer, not a fudge).

x385 — Amihud (2002) illiquidity: mean over days of |daily return| /
daily dollar volume (×1e6).  Daily closes are max_by selections (the
OHLCV discipline), dollar volume is a DECIMAL sum; each day's ratio is
quantized to a 1e12-scaled BIGINT before the cross-day mean so the
aggregation order cannot perturb the result (x321 discipline).

x386 — realized semivariance (Barndorff-Nielsen et al. 2008) and
bipower variation (Barndorff-Nielsen & Shephard 2004): RS⁺/RS⁻ split
realized variance by return sign (downside risk ≠ upside risk), and
BV = (π/2)·Σ|r_t||r_{t-1}| is robust to jumps, so
max(0, 1 − BV/RV) estimates the JUMP share of variance.  r and the
|r_t||r_{t-1}| cross products are exact DECIMAL column arithmetic; only
the final π/2 scaling and the ratio are IEEE, rounded.

All three ride ONE per-(sym) sort on (ts, event_id) — the same window
spine as x375/x378 — and group to 10 rows; nothing here shuffles more
than the tick scan itself.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_TICKS = """
    ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    )
"""

# -- x384: Roll implied spread --------------------------------------------------

_X384 = f"""
    WITH {_TICKS},
    d AS (
      SELECT sym,
             px - LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id) AS dp,
             LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id)
               - LAG(px, 2) OVER (PARTITION BY sym ORDER BY ts, event_id) AS dp1
      FROM ticks
    ),
    m AS (
      SELECT sym,
             CAST(COUNT(dp1) AS DOUBLE) AS m1,
             CAST(CAST(SUM(dp * dp1) AS DECIMAL(38,12)) AS DOUBLE) AS c1,
             CAST(CAST(SUM(CASE WHEN dp1 IS NOT NULL THEN dp END)
                  AS DECIMAL(38,6)) AS DOUBLE) AS sa,
             CAST(CAST(SUM(dp1) AS DECIMAL(38,6)) AS DOUBLE) AS sb
      FROM d GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(m1 AS BIGINT) AS n_lag_pairs,
           ROUND(c1 / m1 - (sa / m1) * (sb / m1), 10) AS cov_dp,
           CASE WHEN c1 / m1 - (sa / m1) * (sb / m1) < 0
                THEN ROUND(2 * SQRT(-(c1 / m1 - (sa / m1) * (sb / m1))), 8)
                END AS roll_spread
    FROM m ORDER BY sym
"""

register_sql(
    "x384_roll_spread",
    spark_sql=_X384,
    duckdb_sql=_X384,
    tags=("finance", "microstructure"),
)

# -- x385: Amihud illiquidity ---------------------------------------------------

_X385_FMT = f"""
    WITH {_TICKS},
    daily AS (
      SELECT sym, CAST(ts AS DATE) AS d,
             {{close_px}} AS close_px,
             CAST(SUM(px * vol) AS DECIMAL(38,12)) AS dollar_vol
      FROM ticks GROUP BY sym, CAST(ts AS DATE)
    ),
    rets AS (
      SELECT sym, d, dollar_vol,
             CAST(close_px AS DOUBLE)
               / CAST(LAG(close_px) OVER (PARTITION BY sym ORDER BY d)
                      AS DOUBLE) - 1 AS r
      FROM daily
    ),
    quant AS (
      SELECT sym,
             CAST(FLOOR(ABS(r) / CAST(dollar_vol AS DOUBLE) * 1e6 * 1e12)
                  AS BIGINT) AS illiq_fp
      FROM rets WHERE r IS NOT NULL AND dollar_vol > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(CAST(SUM(CAST(illiq_fp AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS DOUBLE) / COUNT(*) / 1e12, 8)
             AS amihud_illiq_x1e6
    FROM quant GROUP BY sym ORDER BY sym
"""

register_sql(
    "x385_amihud_illiquidity",
    spark_sql=_X385_FMT.format(
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))"
    ),
    duckdb_sql=_X385_FMT.format(
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))"
    ),
    tags=("finance", "microstructure"),
)

# -- x386: realized semivariance + bipower variation ---------------------------

_X386 = f"""
    WITH {_TICKS},
    d AS (
      SELECT sym,
             px - LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r,
             ABS(px - LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id))
               * ABS(LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id)
                     - LAG(px, 2) OVER (PARTITION BY sym ORDER BY ts, event_id))
               AS bp_term
      FROM ticks
    ),
    m AS (
      SELECT sym,
             CAST(COUNT(r) AS BIGINT) AS n,
             CAST(CAST(SUM(CASE WHEN r > 0 THEN r * r END)
                  AS DECIMAL(38,12)) AS DOUBLE) AS rs_up,
             CAST(CAST(SUM(CASE WHEN r < 0 THEN r * r END)
                  AS DECIMAL(38,12)) AS DOUBLE) AS rs_dn,
             CAST(CAST(SUM(r * r) AS DECIMAL(38,12)) AS DOUBLE) AS rv,
             CAST(CAST(SUM(bp_term) AS DECIMAL(38,12)) AS DOUBLE) AS bp_sum
      FROM d GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n AS n_rets,
           ROUND(rs_up, 8) AS semivar_up,
           ROUND(rs_dn, 8) AS semivar_down,
           ROUND(rv, 8) AS realized_var,
           ROUND(PI() / 2 * bp_sum, 8) AS bipower_var,
           ROUND(GREATEST(0.0, 1 - (PI() / 2 * bp_sum) / rv), 6) AS jump_share
    FROM m ORDER BY sym
"""

register_sql(
    "x386_semivariance_bipower",
    spark_sql=_X386,
    duckdb_sql=_X386,
    tags=("finance", "microstructure"),
)
