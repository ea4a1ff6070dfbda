"""Wave 141 (x491–x493): sequential testing, backtest deflation, and
factor evaluation.

x491 — Wald's SPRT on purchase conversion per symbol: the two per-step
log-likelihood increments (event is/isn't a purchase, H1 rate = 1.2×
the pooled H0 rate) are quantized ONCE to 1e9 integers, so the LLR
walk is an exact integer cumsum; the first crossing of ±ln(19)
(α = β = 0.05) gives the sequential decision and how many events it
needed vs the fixed-horizon x441 plan.

x492 — Deflated Sharpe Ratio (Bailey & López de Prado): each symbol is
one "trial"; SR₀ is the expected max SR among N=10 trials from the
cross-trial SR dispersion (fixed public normal quantiles for N=10),
and DSR = Φ((SR̂−SR₀)√(n−1)/√(1−γ₃SR̂+((γ₄−1)/4)SR̂²)) with skew and
kurtosis from DECIMAL-exact 1e6-quantized return moments and the A&S
Φ (the x468 helper).  The multiple-testing-aware significance of a
backtest — the finance twin of x453's BH correction.

x493 — information coefficient: per hour, the Spearman rank IC between
each symbol's PAST-hour return (the signal) and NEXT-hour return (the
target) across the 10-symbol cross-section; the information ratio
IR = mean(IC)/std(IC) over ~720 hourly cross-sections is THE standard
factor-quality number.  Hourly ICs are 1e9-quantized before the
cross-hour moments.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql


def _ncdf(x: str) -> str:
    t = f"(1.0 / (1.0 + 0.2316419 * ABS({x})))"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * (1.781477937 "
        f"+ {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    tail = f"(EXP(-({x}) * ({x}) / 2) / SQRT(2 * PI()) * {poly})"
    return f"(CASE WHEN {x} >= 0 THEN 1 - {tail} ELSE {tail} END)"


# -- x491: SPRT -----------------------------------------------------------------------------

_X491 = """
    WITH base AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
      FROM events
    ),
    p0 AS (
      SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS p FROM base
    ),
    incs AS (
      -- the two per-step LLR increments, quantized once
      SELECT CAST(FLOOR(LN(1.2) * 1e9) AS BIGINT) AS inc_hit,
             CAST(FLOOR(LN((1 - 1.2 * p.p) / (1 - p.p)) * 1e9) AS BIGINT)
               AS inc_miss
      FROM p0 p
    ),
    walk AS (
      SELECT b.sym,
             ROW_NUMBER() OVER (PARTITION BY b.sym
                                ORDER BY b.ts, b.event_id) AS i,
             SUM(CASE WHEN b.x = 1 THEN i2.inc_hit ELSE i2.inc_miss END)
               OVER (PARTITION BY b.sym ORDER BY b.ts, b.event_id) AS llr_fp
      FROM base b CROSS JOIN incs i2
    ),
    crossings AS (
      SELECT sym,
             CAST(MAX(i) AS BIGINT) AS n_steps,
             CAST(MIN(CASE WHEN llr_fp >= 2944438979 THEN i END) AS BIGINT)
               AS first_reject_h0,
             CAST(MIN(CASE WHEN llr_fp <= -2944438979 THEN i END) AS BIGINT)
               AS first_accept_h0,
             CAST(MAX(CASE WHEN i_is_last = 1 THEN llr_fp END) AS BIGINT)
               AS final_llr_fp
      FROM (
        SELECT sym, i, llr_fp,
               CASE WHEN i = MAX(i) OVER (PARTITION BY sym)
                    THEN 1 ELSE 0 END AS i_is_last
        FROM walk
      ) w GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n_steps,
           first_reject_h0, first_accept_h0,
           ROUND(final_llr_fp / 1e9, 6) AS final_llr,
           CASE
             WHEN first_accept_h0 IS NOT NULL
              AND (first_reject_h0 IS NULL
                   OR first_accept_h0 < first_reject_h0) THEN 'accept_h0'
             WHEN first_reject_h0 IS NOT NULL THEN 'reject_h0'
             ELSE 'continue' END AS sprt_decision
    FROM crossings ORDER BY sym
"""

register_sql(
    "x491_sprt_sequential",
    spark_sql=_X491,
    duckdb_sql=_X491,
    tags=("experiment", "stats"),
)

# -- x492: Deflated Sharpe Ratio ---------------------------------------------------------------

_X492 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    lastpx AS (
      SELECT sym, mkey, px FROM (
        SELECT sym, mkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t WHERE rn = 1
    ),
    rets AS (
      SELECT sym,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)
                           / CAST(LAG(px) OVER (PARTITION BY sym
                                                ORDER BY mkey) AS DOUBLE))
                        * 1e6) AS BIGINT) AS r
      FROM lastpx
    ),
    moms AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(r AS DECIMAL(18,0)) * r) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(CAST(r AS DECIMAL(18,0)) * r * r) AS DECIMAL(38,0))
               AS s3,
             CAST(SUM(CAST(r AS DECIMAL(18,0)) * r * r * r)
                  AS DECIMAL(38,0)) AS s4
      FROM rets WHERE r IS NOT NULL GROUP BY sym
    ),
    shaped AS (
      SELECT sym, n,
             CAST(s1 AS DOUBLE) / n AS m1,
             CAST(s2 AS DOUBLE) / n AS m2,
             CAST(s3 AS DOUBLE) / n AS m3,
             CAST(s4 AS DOUBLE) / n AS m4
      FROM moms WHERE n > 30
    ),
    stats AS (
      SELECT sym, n,
             (m1 / SQRT(m2 - m1 * m1)) AS sr,
             (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
               / POWER(m2 - m1 * m1, 1.5) AS skew,
             (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * POWER(m1, 4))
               / POWER(m2 - m1 * m1, 2) AS kurt
      FROM shaped WHERE m2 - m1 * m1 > 0
    ),
    quant AS (
      SELECT sym, n, sr, skew, kurt,
             CAST(FLOOR(sr * 1e9) AS BIGINT) AS sr_fp
      FROM stats
    ),
    pooled AS (
      SELECT sym, n, sr, skew, kurt,
             CAST(SUM(sr_fp) OVER () AS DOUBLE) / COUNT(*) OVER () / 1e9
               AS sr_mean,
             COUNT(*) OVER () AS n_trials,
             CAST(SUM(sr_fp * sr_fp) OVER () AS DOUBLE)
               / COUNT(*) OVER () / 1e18 AS sr_sq_mean
      FROM quant
    ),
    deflate AS (
      -- SR0 = sd(SR) * ((1-g)*z_a + g*z_b), a = 1-1/N, b = 1-1/(N*e),
      -- N=10: z = 1.2816, 1.7894 (public normal quantiles), g = 0.5772
      SELECT sym, n, sr, skew, kurt,
             SQRT(GREATEST(0.0, sr_sq_mean - sr_mean * sr_mean))
               * ((1 - 0.5772) * 1.2816 + 0.5772 * 1.7894) AS sr0
      FROM pooled
    ),
    zsc AS (
      SELECT sym, n, sr, skew, kurt, sr0,
             (sr - sr0) * SQRT(CAST(n - 1 AS DOUBLE))
               / SQRT(GREATEST(0.1,
                      1 - skew * sr + (kurt - 1) / 4 * sr * sr)) AS z
      FROM deflate
    )
    SELECT CAST(sym AS BIGINT) AS sym, n,
           ROUND(sr, 6) AS sharpe_per_minute,
           ROUND(skew, 4) AS skew,
           ROUND(kurt, 4) AS kurtosis,
           ROUND(sr0, 6) AS expected_max_sr_null,
           ROUND({ncdf_z}, 6) AS deflated_sharpe_prob,
           CASE WHEN {ncdf_z} > 0.95 THEN 1 ELSE 0 END AS survives_deflation
    FROM zsc ORDER BY sym
"""

register_sql(
    "x492_deflated_sharpe",
    spark_sql=_X492.format(
        intdiv="DIV", epoch="unix_seconds(ts)", ncdf_z=_ncdf("z")
    ),
    duckdb_sql=_X492.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)",
        ncdf_z=_ncdf("z"),
    ),
    tags=("finance", "stats"),
)

# -- x493: information coefficient ----------------------------------------------------------------

_X493 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 3600 AS hkey, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    lastpx AS (
      SELECT sym, hkey, px FROM (
        SELECT sym, hkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, hkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t WHERE rn = 1
    ),
    rets AS (
      SELECT sym, hkey,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)
                           / CAST(LAG(px) OVER (PARTITION BY sym
                                                ORDER BY hkey) AS DOUBLE))
                        * 1e9) AS BIGINT) AS r
      FROM lastpx
    ),
    aligned AS (
      -- signal = this hour's return; target = NEXT hour's return
      SELECT sym, hkey, r AS signal,
             LEAD(r) OVER (PARTITION BY sym ORDER BY hkey) AS fwd
      FROM rets WHERE r IS NOT NULL
    ),
    ranked AS (
      SELECT hkey,
             2 * RANK() OVER (PARTITION BY hkey ORDER BY signal)
               + COUNT(*) OVER (PARTITION BY hkey, signal) - 1 AS rs,
             2 * RANK() OVER (PARTITION BY hkey ORDER BY fwd)
               + COUNT(*) OVER (PARTITION BY hkey, fwd) - 1 AS rf
      FROM aligned WHERE fwd IS NOT NULL
    ),
    per_hour AS (
      SELECT hkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rs) AS BIGINT) AS ss,
             CAST(SUM(rf) AS BIGINT) AS sf,
             CAST(SUM(CAST(rs AS DECIMAL(18,0)) * rs) AS DECIMAL(38,0))
               AS sss,
             CAST(SUM(CAST(rf AS DECIMAL(18,0)) * rf) AS DECIMAL(38,0))
               AS sff,
             CAST(SUM(CAST(rs AS DECIMAL(18,0)) * rf) AS DECIMAL(38,0))
               AS ssf
      FROM ranked GROUP BY hkey
    ),
    ics AS (
      SELECT hkey,
             CAST(FLOOR(CAST(n * ssf - ss * sf AS DOUBLE)
                        / SQRT(CAST(n * sss - ss * ss AS DOUBLE)
                               * CAST(n * sff - sf * sf AS DOUBLE)) * 1e9)
                  AS BIGINT) AS ic_fp
      FROM per_hour
      WHERE n > 5 AND n * sss - ss * ss > 0 AND n * sff - sf * sf > 0
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ic_fp) AS BIGINT) AS si,
             CAST(SUM(CAST(ic_fp AS DECIMAL(18,0)) * ic_fp)
                  AS DECIMAL(38,0)) AS sii
      FROM ics
    )
    SELECT n AS n_hours,
           ROUND(CAST(si AS DOUBLE) / n / 1e9, 6) AS mean_ic,
           ROUND(SQRT(GREATEST(0.0, CAST(sii AS DOUBLE) / n / 1e18
                      - POWER(CAST(si AS DOUBLE) / n / 1e9, 2))), 6)
             AS std_ic,
           CASE WHEN CAST(sii AS DOUBLE) / n / 1e18
                     - POWER(CAST(si AS DOUBLE) / n / 1e9, 2) > 0 THEN
             ROUND((CAST(si AS DOUBLE) / n / 1e9)
                   / SQRT(CAST(sii AS DOUBLE) / n / 1e18
                          - POWER(CAST(si AS DOUBLE) / n / 1e9, 2)), 6)
           END AS information_ratio
    FROM sums WHERE n > 1
"""

register_sql(
    "x493_information_coefficient",
    spark_sql=_X493.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X493.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "eval"),
)
