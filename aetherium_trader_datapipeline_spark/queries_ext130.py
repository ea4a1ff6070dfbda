"""Wave 130 (x462–x464): execution scheduling & capital allocation.

x462 — Almgren–Chriss optimal liquidation: per symbol, the
variance/impact inputs are MEASURED (per-minute return variance from
DECIMAL-exact moments; temporary impact η from the x316-style
|Δp|-on-volume slope), then the closed-form schedule
x_j = sinh(κ(T−t_j))/sinh(κT) is emitted over 10 slices.  sinh is
spelled (eˣ−e⁻ˣ)/2 so both engines evaluate the identical IEEE tree.
The remaining-holdings and per-slice trade shares are what an execution
desk hands to the scheduler.

x463 — Kelly sizing: per symbol, full-Kelly f* = μ/σ² from per-minute
return moments, plus the half-Kelly desks actually run and the growth
rate g = μ²/2σ² it forfeits.  All inputs exact-moment derived.

x464 — risk-parity (inverse-volatility) allocation across the 10
symbols under a diagonal covariance: weights w_i ∝ 1/σ_i are computed
in integer 1e12-quantized reciprocal-vol units (so shares are exact
integer ratios), with each symbol's risk contribution w_i·σ_i
alongside — equal by construction, which the column demonstrates.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_RET_MOMS = """
    ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey, ts, event_id,
             CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    bars AS (
      SELECT sym, mkey,
             CAST(SUM(vol_fp) AS BIGINT) AS vol,
             CAST(MAX(CASE WHEN rn = 1 THEN px END) AS DECIMAL(18,6)) AS cl
      FROM (
        SELECT sym, mkey, px, vol_fp,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t GROUP BY sym, mkey
    ),
    rets AS (
      SELECT sym, vol,
             CAST(FLOOR(LN(CAST(cl AS DOUBLE)
                           / CAST(LAG(cl) OVER (PARTITION BY sym
                                                ORDER BY mkey) AS DOUBLE))
                        * 1e9) AS BIGINT) AS r_fp
      FROM bars
    ),
    moms AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r_fp AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sr,
             CAST(SUM(CAST(r_fp AS DECIMAL(18,0)) * r_fp) AS DECIMAL(38,0))
               AS srr,
             CAST(SUM(CAST(ABS(r_fp) AS DECIMAL(18,0))) AS DECIMAL(38,0))
               AS sar,
             CAST(SUM(CAST(vol AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sv
      FROM rets WHERE r_fp IS NOT NULL GROUP BY sym
    )
"""

# -- x462: Almgren–Chriss schedule ---------------------------------------------------------

_X462 = (
    "WITH " + _RET_MOMS + """,
    params AS (
      -- sigma2 per minute (in return² units); eta = mean|r| / mean vol
      -- (the x316-flavored average impact per unit volume); lambda
      -- (risk aversion) fixed at 1e-6; kappa = sqrt(lambda*sigma2/eta)
      SELECT sym,
             (CAST(srr AS DOUBLE) / n / 1e18
              - (CAST(sr AS DOUBLE) / n / 1e9)
                * (CAST(sr AS DOUBLE) / n / 1e9)) AS sigma2,
             (CAST(sar AS DOUBLE) / n / 1e9)
               / (CAST(sv AS DOUBLE) / n / 1e6) AS eta
      FROM moms WHERE n > 10
    ),
    kappas AS (
      SELECT sym, sigma2, eta,
             SQRT(1e-6 * sigma2 / eta) AS kappa
      FROM params WHERE eta > 0 AND sigma2 > 0
    ),
    slices AS (
      SELECT 0 AS j UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL
      SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL
      SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL
      SELECT 9 UNION ALL SELECT 10
    ),
    traj AS (
      -- holdings share after slice j over horizon T = 10:
      -- sinh(kappa*(T-j)) / sinh(kappa*T), sinh via (e^x - e^-x)/2
      SELECT k.sym, s.j, k.kappa,
             ((EXP(k.kappa * (10 - s.j)) - EXP(-k.kappa * (10 - s.j))) / 2)
             / ((EXP(k.kappa * 10) - EXP(-k.kappa * 10)) / 2) AS hold
      FROM kappas k CROSS JOIN slices s
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(j AS BIGINT) AS slice,
           ROUND(kappa, 9) AS kappa,
           ROUND(hold, 9) AS holdings_share,
           ROUND(COALESCE(LAG(hold) OVER (PARTITION BY sym ORDER BY j), 1.0)
                 - hold, 9) AS trade_share
    FROM traj ORDER BY sym, slice
"""
)

register_sql(
    "x462_almgren_chriss",
    spark_sql=_X462.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X462.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "planning"),
)

# -- x463: Kelly sizing ----------------------------------------------------------------------

_X463 = (
    "WITH " + _RET_MOMS + """
    SELECT CAST(sym AS BIGINT) AS sym, n,
           ROUND(CAST(sr AS DOUBLE) / n / 1e9, 9) AS mean_ret,
           ROUND(CAST(srr AS DOUBLE) / n / 1e18
                 - (CAST(sr AS DOUBLE) / n / 1e9)
                   * (CAST(sr AS DOUBLE) / n / 1e9), 12) AS var_ret,
           CASE WHEN CAST(srr AS DOUBLE) / n / 1e18
                     - (CAST(sr AS DOUBLE) / n / 1e9)
                       * (CAST(sr AS DOUBLE) / n / 1e9) > 0 THEN
             ROUND((CAST(sr AS DOUBLE) / n / 1e9)
                   / (CAST(srr AS DOUBLE) / n / 1e18
                      - (CAST(sr AS DOUBLE) / n / 1e9)
                        * (CAST(sr AS DOUBLE) / n / 1e9)), 4) + 0.0E0
           END AS kelly_fraction,
           CASE WHEN CAST(srr AS DOUBLE) / n / 1e18
                     - (CAST(sr AS DOUBLE) / n / 1e9)
                       * (CAST(sr AS DOUBLE) / n / 1e9) > 0 THEN
             ROUND((CAST(sr AS DOUBLE) / n / 1e9)
                   / (CAST(srr AS DOUBLE) / n / 1e18
                      - (CAST(sr AS DOUBLE) / n / 1e9)
                        * (CAST(sr AS DOUBLE) / n / 1e9)) / 2, 4) + 0.0E0
           END AS half_kelly,
           CASE WHEN CAST(srr AS DOUBLE) / n / 1e18
                     - (CAST(sr AS DOUBLE) / n / 1e9)
                       * (CAST(sr AS DOUBLE) / n / 1e9) > 0 THEN
             ROUND(POWER(CAST(sr AS DOUBLE) / n / 1e9, 2) / 2
                   / (CAST(srr AS DOUBLE) / n / 1e18
                      - (CAST(sr AS DOUBLE) / n / 1e9)
                        * (CAST(sr AS DOUBLE) / n / 1e9)), 12) + 0.0E0
           END AS growth_rate
    FROM moms WHERE n > 10 ORDER BY sym
"""
)

register_sql(
    "x463_kelly_fraction",
    spark_sql=_X463.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X463.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "planning"),
)

# -- x464: risk parity -------------------------------------------------------------------------

_X464 = (
    "WITH " + _RET_MOMS + """,
    vols AS (
      SELECT sym,
             SQRT(CAST(srr AS DOUBLE) / n / 1e18
                  - (CAST(sr AS DOUBLE) / n / 1e9)
                    * (CAST(sr AS DOUBLE) / n / 1e9)) AS sigma
      FROM moms WHERE n > 10
    ),
    inv AS (
      -- 1e12-quantized reciprocal vols: weight shares become exact
      -- integer ratios
      SELECT sym, sigma,
             CAST(FLOOR(1e12 / sigma / 1e6) AS BIGINT) AS iv_fp
      FROM vols WHERE sigma > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           ROUND(sigma * 1e6, 6) AS sigma_ppm,
           ROUND(CAST(iv_fp AS DOUBLE) / SUM(iv_fp) OVER (), 6)
             AS risk_parity_weight,
           ROUND(CAST(iv_fp AS DOUBLE) / SUM(iv_fp) OVER () * sigma * 1e6,
                 6) AS risk_contribution_ppm
    FROM inv ORDER BY sym
"""
)

register_sql(
    "x464_risk_parity",
    spark_sql=_X464.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X464.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "planning"),
)
