"""Wave 79 (x321–x323): liquidity measures + a forensic digit audit.

x321 is the Amihud illiquidity ratio — the workhorse price-impact proxy
when only daily bars exist (vs x316's Kyle lambda, which needs signed
order flow): ILLIQ = mean over days of |daily return| / dollar volume.
Day closes come from the same max_by-over-(ts, event_id) ordering as the
OHLCV operator, dollar volume accumulates in DECIMAL (exact), and each
day's ratio is quantized to integer 1e15 fixed-point BEFORE the per-sym
mean so the cross-day sum is order-independent — the x319 residual
pattern applied to a ratio statistic.

x322 is Roll's implied spread: under Roll's model the serial covariance
of price CHANGES is -s²/4, so s = 2·sqrt(-cov(Δp_t, Δp_{t-1})).  Both
lag passes ride ONE per-sym sort (the window operator reuses the
partition), moment sums are DECIMAL-exact, and the final covariance /
sqrt are single per-row IEEE ops.  Positive-covariance symbols report
NULL spread — the estimator is undefined there, and saying so beats
clamping.

x323 is a Benford first-digit audit over l_extendedprice — the classic
fabricated-data screen for ingested feeds.  Cents are recovered exactly
(ROUND(px*100) — the values are 2-decimal; CAST alone would truncate in
Spark but round in DuckDB, hence the explicit ROUND), the leading digit
is taken from the integer's decimal string (no log10 on data values →
no libm-ulp hazard on the extraction path), and the output is per-digit
rows (observed vs Benford share + chi-square term) rather than one
summed statistic, so no cross-row float accumulation exists at all.

All three are shuffle-minimal: one hash partition by sym (x321/x322)
reused by every window pass, one scan + 9-group agg (x323).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x321: Amihud illiquidity --------------------------------------------------
# Per-day ratio |ret_d| / dvol_d quantized to 1e15 fixed-point per day,
# THEN summed per sym: BIGINT sum is exact and order-free, so the mean is
# engine-identical. Ratios are ~1e-8..1e-5 here, so 1e15 keeps 7+ digits.

_X321 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d, ts, event_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, d,
             {close_px} AS close_px,
             CAST(SUM(px * vol) AS DECIMAL(28,6)) AS dvol
      FROM ticks GROUP BY sym, d
    ),
    rets AS (
      SELECT sym, d, close_px, dvol,
             LAG(close_px) OVER (PARTITION BY sym ORDER BY d) AS prev_px
      FROM daily
    ),
    quantized AS (
      SELECT sym,
             CAST(FLOOR(ABS(CAST(close_px AS DOUBLE) / CAST(prev_px AS DOUBLE) - 1)
                        / CAST(dvol AS DOUBLE) * 1e15) AS BIGINT) AS illiq_fp
      FROM rets WHERE prev_px IS NOT NULL AND dvol > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(CAST(SUM(CAST(illiq_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(*) / 1e15 * 1e6, 6) AS avg_illiq_x1m
    FROM quantized GROUP BY sym ORDER BY sym
"""

register_sql(
    "x321_amihud_illiquidity",
    spark_sql=_X321.format(
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))"
    ),
    duckdb_sql=_X321.format(
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))"
    ),
    tags=("finance", "window"),
)

# -- x322: Roll implied spread -------------------------------------------------
# cov(x, y) = (Sxy - Sx*Sy/n)/n with x = Δp, y = Δp lagged one trade.
# Both LAGs share one (sym, ts, event_id) sort; sums are DECIMAL-exact
# (Δp has 6 fractional digits → products fit DECIMAL(38,12)); covariance
# and sqrt are per-row double ops on scalars.

_X322 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    d1 AS (
      SELECT sym, ts, event_id,
             px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) AS dp
      FROM ticks
    ),
    d2 AS (
      SELECT sym, dp,
             LAG(dp) OVER (PARTITION BY sym ORDER BY ts, event_id) AS dp_prev
      FROM d1 WHERE dp IS NOT NULL
    ),
    moments AS (
      SELECT sym,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(dp_prev) AS DECIMAL(38,6)) AS DOUBLE) AS sy,
             CAST(CAST(SUM(dp * dp_prev) AS DECIMAL(38,12)) AS DOUBLE) AS sxy
      FROM d2 WHERE dp_prev IS NOT NULL GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(n AS BIGINT) AS n_pairs,
           ROUND((sxy - sx * sy / n) / n, 8) + 0.0E0 AS serial_cov,
           CASE WHEN (sxy - sx * sy / n) / n < 0
                THEN ROUND(2 * SQRT(-((sxy - sx * sy / n) / n)), 6)
           END AS roll_spread
    FROM moments ORDER BY sym
"""

register_sql(
    "x322_roll_spread",
    spark_sql=_X322,
    duckdb_sql=_X322,
    tags=("finance", "window"),
)

# -- x323: Benford first-digit audit -------------------------------------------
# Digit extraction is pure integer/string work; the only float ops are
# per-digit-row (9 rows) and rounded, so nothing order-dependent exists.

_X323 = """
    WITH cents AS (
      SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c
      FROM lineitem WHERE l_extendedprice > 0
    ),
    digits AS (
      SELECT CAST(SUBSTRING(CAST(c AS STRING), 1, 1) AS BIGINT) AS digit
      FROM cents
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs)
    SELECT o.digit, o.n_obs,
           ROUND(CAST(o.n_obs AS DOUBLE) / t.n_total, 6) AS obs_share,
           ROUND(LOG10(1 + 1.0 / o.digit), 6) AS benford_share,
           ROUND(POW(CAST(o.n_obs AS DOUBLE) - t.n_total * LOG10(1 + 1.0 / o.digit), 2)
                 / (t.n_total * LOG10(1 + 1.0 / o.digit)), 4) AS chi2_term
    FROM obs o CROSS JOIN tot t ORDER BY o.digit
"""

register_sql(
    "x323_benford_digits",
    spark_sql=_X323,
    duckdb_sql=_X323,
    tags=("quality", "audit"),
)
