"""Wave 120 (x433–x435): tail-risk estimation & cumulative indicators.

x433 — Hill tail-index estimator per symbol: over the k=50 largest
absolute minute returns, α̂ = k / Σ ln(x_(i)/x_(k+1)).  Order statistics
come from a per-symbol rank window (value-at-rank is tie-permutation
invariant); each log term is one IEEE expression over the 1e9-quantized
return ints, re-quantized to 1e9 before the 50-row sum.  Complements
x361 (discrete power-law MLE on counts) and x399 (CVaR level) with the
shape of the tail itself.

x434 — Sortino and Calmar ratios per symbol from daily log returns:
downside deviation uses exact integer squares of min(r,0); the max
drawdown runs over the cumulative-sum integers with a running-max
window (30 daily rows per symbol — the window is bounded, not a
tick-scale sort).  The risk-adjusted-performance pair to x182 (raw max
drawdown) and x399 (expected shortfall).

x435 — on-balance volume and accumulation/distribution line: per-minute
OHLC aggregates feed sign(Δclose)·vol (OBV, pure integers) and the
money-flow multiplier ((C−L)−(H−C))/(H−L)·vol (ADL, 1e6-quantized per
minute), both accumulated per day then cumulated across days — the
cumsum runs over |days| rows per symbol, not |ticks|.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_TICKS = """
    ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey,
             {epoch} {intdiv} 86400 AS dkey, ts, event_id,
             CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    )
"""

# -- x433: Hill tail index ---------------------------------------------------------

_X433 = (
    "WITH " + _TICKS + """,
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
             ABS(CAST(FLOOR(LN(CAST(px AS DOUBLE)
                               / CAST(LAG(px) OVER (PARTITION BY sym
                                                    ORDER BY mkey)
                                      AS DOUBLE)) * 1e9) AS BIGINT)) AS x_fp
      FROM lastpx
    ),
    ranked AS (
      SELECT sym, x_fp,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY x_fp DESC) AS rn
      FROM rets WHERE x_fp IS NOT NULL AND x_fp > 0
    ),
    kth AS (
      SELECT sym, x_fp AS xk_fp FROM ranked WHERE rn = 51
    ),
    terms AS (
      SELECT r.sym,
             CAST(FLOOR(LN(CAST(r.x_fp AS DOUBLE) / k.xk_fp) * 1e9)
                  AS BIGINT) AS lnterm_fp
      FROM ranked r JOIN kth k ON r.sym = k.sym
      WHERE r.rn <= 50
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS k,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (CAST(SUM(lnterm_fp) AS DOUBLE) / 1e9), 4)
             AS hill_alpha
    FROM terms GROUP BY sym HAVING SUM(lnterm_fp) > 0 ORDER BY sym
"""
)

register_sql(
    "x433_hill_tail_index",
    spark_sql=_X433.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X433.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x434: Sortino & Calmar --------------------------------------------------------

_X434 = (
    "WITH " + _TICKS + """,
    daily AS (
      SELECT sym, dkey, px, is_first, is_last FROM (
        SELECT sym, dkey, px,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                            ORDER BY ts DESC, event_id DESC)
                         = 1
                    THEN 1 ELSE 0 END AS is_last
        FROM ticks
      ) t WHERE is_first = 1 OR is_last = 1
    ),
    oc AS (
      SELECT sym, dkey,
             CAST(FLOOR(LN(CAST(MAX(CASE WHEN is_last = 1 THEN px END)
                                AS DOUBLE)
                           / CAST(MAX(CASE WHEN is_first = 1 THEN px END)
                                  AS DOUBLE)) * 1e9) AS BIGINT) AS r_fp
      FROM daily GROUP BY sym, dkey
    ),
    cum AS (
      SELECT sym, dkey, r_fp,
             SUM(r_fp) OVER (PARTITION BY sym ORDER BY dkey) AS c_fp
      FROM oc
    ),
    dd AS (
      SELECT sym, r_fp,
             MAX(c_fp) OVER (PARTITION BY sym ORDER BY dkey) - c_fp AS dd_fp
      FROM cum
    ),
    agg AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(r_fp) AS BIGINT) AS sr,
             CAST(SUM(CASE WHEN r_fp < 0
                           THEN CAST(r_fp AS DECIMAL(18,0)) * r_fp
                           ELSE 0 END) AS DECIMAL(38,0)) AS sdown2,
             CAST(MAX(dd_fp) AS BIGINT) AS maxdd_fp
      FROM dd GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n_days,
           ROUND(CAST(sr AS DOUBLE) / n_days / 1e9, 9) AS mean_daily_ret,
           ROUND(CAST(maxdd_fp AS DOUBLE) / 1e9, 9) AS max_drawdown,
           CASE WHEN sdown2 > 0 THEN
             ROUND((CAST(sr AS DOUBLE) / n_days)
                   / SQRT(CAST(sdown2 AS DOUBLE) / n_days), 6)
           END AS sortino,
           CASE WHEN maxdd_fp > 0 THEN
             ROUND(CAST(sr AS DOUBLE) / maxdd_fp, 6)
           END AS calmar
    FROM agg ORDER BY sym
"""
)

register_sql(
    "x434_sortino_calmar",
    spark_sql=_X434.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X434.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x435: OBV / ADL ---------------------------------------------------------------

_X435 = (
    "WITH " + _TICKS + """,
    bars AS (
      SELECT sym, dkey, mkey,
             CAST(MAX(px) AS DECIMAL(18,6)) AS hi,
             CAST(MIN(px) AS DECIMAL(18,6)) AS lo,
             CAST(SUM(vol_fp) AS BIGINT) AS vol,
             CAST(MAX(CASE WHEN rn = 1 THEN px END) AS DECIMAL(18,6)) AS cl
      FROM (
        SELECT sym, dkey, mkey, px, vol_fp,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t GROUP BY sym, dkey, mkey
    ),
    flows AS (
      SELECT sym, dkey,
             CASE WHEN cl > LAG(cl) OVER w THEN vol
                  WHEN cl < LAG(cl) OVER w THEN -vol
                  ELSE 0 END AS obv_term,
             CASE WHEN hi > lo THEN
               CAST(FLOOR(CAST((cl - lo) - (hi - cl) AS DOUBLE)
                          / CAST(hi - lo AS DOUBLE) * vol) AS BIGINT)
             ELSE 0 END AS adl_term
      FROM bars
      WINDOW w AS (PARTITION BY sym ORDER BY mkey)
    ),
    per_day AS (
      SELECT sym, dkey,
             CAST(SUM(obv_term) AS BIGINT) AS obv_day,
             CAST(SUM(adl_term) AS BIGINT) AS adl_day
      FROM flows GROUP BY sym, dkey
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(dkey AS BIGINT) AS day_key,
           ROUND(CAST(SUM(obv_day)
                      OVER (PARTITION BY sym ORDER BY dkey) AS DOUBLE)
                 / 1e6, 6) AS obv,
           ROUND(CAST(SUM(adl_day)
                      OVER (PARTITION BY sym ORDER BY dkey) AS DOUBLE)
                 / 1e6, 6) AS adl
    FROM per_day ORDER BY sym, day_key
"""
)

register_sql(
    "x435_obv_adl",
    spark_sql=_X435.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X435.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "ohlcv"),
)
