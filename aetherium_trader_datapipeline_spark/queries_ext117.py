"""Wave 117 (x424–x426): stationarity & pairs-trading battery.

Completes the time-series diagnostics (x327 ACF, x328 variance ratio,
x329 Hurst) with the tests a stat-arb desk actually gates strategies on.

Shared machinery: per-minute last log-price quantized ONCE to 1e9
integers (lp_fp); first differences are then pure integer subtraction,
and every OLS runs on DECIMAL-exact moments of those integers — the
x101 linreg discipline.  Slope/intercept/t-statistics are single IEEE
expression trees over exact integer moments, written identically in
both engines.

x424 — Dickey–Fuller test per symbol: Δp_t = α + γ·p_{t−1} + ε; the
t-statistic of γ against the −2.86 (5%, with-constant) critical value.
SSR via the normal-equation identity Syy − α·Sy − γ·Sxy.

x425 — AR(1) mean-reversion half-life: φ from p_t ~ α + φ·p_{t−1};
half-life = −ln 2 / ln φ minutes when 0 < φ < 1 (NULL otherwise — a
random-walk or explosive fit has no half-life).

x426 — Engle–Granger pairs cointegration over all 45 symbol pairs:
step 1 hedges lnp_a on lnp_b (β, α from pair moments, broadcast back),
step 2 runs the x424 Dickey–Fuller machinery on the 1e9-quantized
residual, flagged against the Engle–Granger 2-variable 5% critical
value −3.34.  The pair frame is a minute-key self-join (sym_a < sym_b),
|pairs|×|minutes| rows — linear in the tick count, never all-pairs of
rows.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

_LP_SERIES = """
    ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    lp AS (
      SELECT sym, mkey,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)) * 1e9) AS BIGINT) AS lp_fp
      FROM (
        SELECT sym, mkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t WHERE rn = 1
    )
"""

# x424/x425 share the lag frame and the OLS moment block.
_DF_MOMENTS = """
    lagged AS (
      SELECT sym,
             LAG(lp_fp) OVER (PARTITION BY sym ORDER BY mkey) AS x,
             lp_fp AS p
      FROM lp
    ),
    pairs AS (
      SELECT sym, x, p - x AS y, p FROM lagged WHERE x IS NOT NULL
    ),
    moms AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST({yy} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * {yy}) AS DECIMAL(38,0))
               AS sxy,
             CAST(SUM(CAST({yy} AS DECIMAL(18,0)) * {yy}) AS DECIMAL(38,0))
               AS syy
      FROM pairs GROUP BY sym
    )
"""

_DF_FIT = """
    fit1 AS (
      SELECT sym, n, sx, sy, sxy, syy,
             CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS gamma
      FROM moms WHERE n > 10 AND n * sxx - sx * sx > 0
    ),
    fit2 AS (
      SELECT sym, n, dxx, gamma,
             (CAST(syy AS DOUBLE)
              - ((CAST(sy AS DOUBLE) - gamma * CAST(sx AS DOUBLE)) / n)
                * CAST(sy AS DOUBLE)
              - gamma * CAST(sxy AS DOUBLE)) / (n - 2) AS s2
      FROM fit1
    ),
    fit AS (
      SELECT sym, n, gamma,
             CASE WHEN s2 > 0
                  THEN gamma / SQRT(s2 * n / dxx) END AS t_stat
      FROM fit2
    )
"""

_X424 = (
    "WITH " + _LP_SERIES + "," + _DF_MOMENTS.format(yy="y") + ","
    + _DF_FIT + """
    SELECT CAST(sym AS BIGINT) AS sym, n,
           ROUND(gamma, 8) AS gamma,
           ROUND(t_stat, 4) AS adf_t,
           CASE WHEN t_stat < -2.86 THEN 1 ELSE 0 END AS stationary_5pct
    FROM fit ORDER BY sym
"""
)

register_sql(
    "x424_adf_test",
    spark_sql=_X424.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X424.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

_X425 = (
    "WITH " + _LP_SERIES + "," + _DF_MOMENTS.format(yy="p") + """
    SELECT CAST(sym AS BIGINT) AS sym, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 8) AS phi,
           CASE WHEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) < 1
                THEN ROUND(-LN(2.0)
                           / LN(CAST(n * sxy - sx * sy AS DOUBLE)
                                / CAST(n * sxx - sx * sx AS DOUBLE)), 4)
           END AS halflife_minutes
    FROM moms WHERE n > 10 ORDER BY sym
"""
)

register_sql(
    "x425_mean_reversion_halflife",
    spark_sql=_X425.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X425.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x426: Engle–Granger pairs cointegration -------------------------------------

_X426 = (
    "WITH " + _LP_SERIES + """,
    aligned AS (
      SELECT a.sym AS sa, b.sym AS sb, a.mkey,
             a.lp_fp AS ya, b.lp_fp AS xb
      FROM lp a JOIN lp b ON a.mkey = b.mkey AND a.sym < b.sym
    ),
    hedge AS (
      SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(xb AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(ya AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(xb AS DECIMAL(18,0)) * xb) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(xb AS DECIMAL(18,0)) * ya) AS DECIMAL(38,0))
               AS sxy
      FROM aligned GROUP BY sa, sb
    ),
    hedgeok AS (
      SELECT * FROM hedge WHERE n > 10 AND n * sxx - sx * sx > 0
    ),
    resid AS (
      -- residual of the hedge regression, re-quantized to 1e9 ints
      SELECT a.sa, a.sb, a.mkey,
             CAST(FLOOR(a.ya
                        - (CAST(h.sy AS DOUBLE)
                           - (CAST(h.n * h.sxy - h.sx * h.sy AS DOUBLE)
                              / CAST(h.n * h.sxx - h.sx * h.sx AS DOUBLE))
                             * CAST(h.sx AS DOUBLE)) / h.n
                        - (CAST(h.n * h.sxy - h.sx * h.sy AS DOUBLE)
                           / CAST(h.n * h.sxx - h.sx * h.sx AS DOUBLE))
                          * a.xb) AS BIGINT) AS e_fp
      FROM aligned a JOIN hedgeok h ON a.sa = h.sa AND a.sb = h.sb
    ),
    lagged AS (
      SELECT sa, sb,
             LAG(e_fp) OVER (PARTITION BY sa, sb ORDER BY mkey) AS x,
             e_fp AS p
      FROM resid
    ),
    dfp AS (
      SELECT sa, sb, x, p - x AS y FROM lagged WHERE x IS NOT NULL
    ),
    moms AS (
      SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(y AS DECIMAL(18,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM dfp GROUP BY sa, sb
    ),
    fit1 AS (
      SELECT sa, sb, n, sx, sy, sxy, syy,
             CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS gamma
      FROM moms WHERE n > 10 AND n * sxx - sx * sx > 0
    ),
    fit2 AS (
      SELECT sa, sb, n, dxx, gamma,
             (CAST(syy AS DOUBLE)
              - ((CAST(sy AS DOUBLE) - gamma * CAST(sx AS DOUBLE)) / n)
                * CAST(sy AS DOUBLE)
              - gamma * CAST(sxy AS DOUBLE)) / (n - 2) AS s2
      FROM fit1
    ),
    fit AS (
      SELECT sa, sb, n,
             CASE WHEN s2 > 0
                  THEN gamma / SQRT(s2 * n / dxx) END AS t_stat
      FROM fit2
    ),
    hb AS (
      SELECT h.sa, h.sb,
             ROUND(CAST(h.n * h.sxy - h.sx * h.sy AS DOUBLE)
                   / CAST(h.n * h.sxx - h.sx * h.sx AS DOUBLE), 6) AS beta
      FROM hedgeok h
    )
    SELECT CAST(f.sa AS BIGINT) AS sym_a, CAST(f.sb AS BIGINT) AS sym_b,
           f.n, hb.beta,
           ROUND(f.t_stat, 4) AS eg_adf_t,
           CASE WHEN f.t_stat < -3.34 THEN 1 ELSE 0 END AS cointegrated_5pct
    FROM fit f JOIN hb ON f.sa = hb.sa AND f.sb = hb.sb
    ORDER BY sym_a, sym_b
"""
)

register_sql(
    "x426_pairs_cointegration",
    spark_sql=_X426.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X426.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)
