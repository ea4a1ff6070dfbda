"""Wave 147 (x510–x512): dependence beyond correlation, capacity, and
stressed liquidity.

x510 — empirical upper-tail dependence λ_U ≈ P(U > q | V > q) at
q = 0.90 for every symbol pair: joint exceedance counts over exact
per-symbol rank thresholds (integer order statistics, never float
quantiles) — the dependence that correlation misses and crises
amplify; pairs with x460 (Epps) and x503 (dynamic corr).

x511 — strategy capacity: max AUM per symbol at a 10% participation
cap on average daily dollar volume, a 10 bp daily-vol target and 20%
annualized strategy vol — the back-of-envelope every allocator runs.
ADV from exact integer sums; the capacity chain is one IEEE expression
per symbol.

x512 — liquidity under stress: each symbol's Amihud illiquidity
(|return|/dollar volume) measured separately on its top-quintile
|return| days vs the rest, by exact rank selection — the stress ratio
quantifies how much liquidity evaporates exactly when it is needed
(the flight-to-liquidity stylized fact).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_DAILY = """
    ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 86400 AS dkey,
             {epoch} {intdiv} 60 AS mkey, ts, event_id,
             CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, dkey,
             CAST(SUM(vol_fp) AS BIGINT) AS dvol_fp,
             CAST(MAX(CASE WHEN rn_last = 1 THEN px END) AS DECIMAL(18,6))
               AS cl,
             CAST(MAX(CASE WHEN rn_first = 1 THEN px END) AS DECIMAL(18,6))
               AS op
      FROM (
        SELECT sym, dkey, px, vol_fp,
               ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                  ORDER BY ts DESC, event_id DESC)
                 AS rn_last,
               ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                  ORDER BY ts, event_id) AS rn_first
        FROM ticks
      ) t GROUP BY sym, dkey
    ),
    drets AS (
      SELECT sym, dkey, dvol_fp,
             ABS(CAST(FLOOR(LN(CAST(cl AS DOUBLE) / CAST(op AS DOUBLE))
                            * 1e9) AS BIGINT)) AS aret_fp
      FROM daily
    )
"""

# -- x510: tail dependence --------------------------------------------------------------------

_X510 = (
    "WITH " + _DAILY + """,
    ranked AS (
      SELECT sym, dkey, aret_fp,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY aret_fp, dkey)
               AS rk,
             COUNT(*) OVER (PARTITION BY sym) AS n
      FROM drets
    ),
    flags AS (
      -- exceed the per-sym 90th-percentile rank (exact order statistic)
      SELECT sym, dkey,
             CASE WHEN rk * 10 > 9 * n THEN 1 ELSE 0 END AS exceed
      FROM ranked
    ),
    pairs AS (
      SELECT a.sym AS sa, b.sym AS sb,
             CAST(SUM(b.exceed) AS BIGINT) AS n_v,
             CAST(SUM(a.exceed * b.exceed) AS BIGINT) AS n_joint,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM flags a JOIN flags b
        ON a.dkey = b.dkey AND a.sym < b.sym
      GROUP BY a.sym, b.sym
    )
    SELECT CAST(sa AS BIGINT) AS sym_a, CAST(sb AS BIGINT) AS sym_b,
           n_days, n_joint,
           CASE WHEN n_v > 0 THEN
             ROUND(CAST(n_joint AS DOUBLE) / n_v, 6)
           END AS upper_tail_dependence,
           ROUND(CAST(0.1 AS DOUBLE), 6) AS independence_baseline
    FROM pairs ORDER BY sym_a, sym_b
"""
)

register_sql(
    "x510_tail_dependence",
    spark_sql=_X510.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X510.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x511: strategy capacity --------------------------------------------------------------------

_X511 = (
    "WITH " + _DAILY + """,
    adv AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(dvol_fp) AS BIGINT) AS total_vol_fp
      FROM drets GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n_days,
           ROUND(CAST(total_vol_fp AS DOUBLE) / n_days / 1e6, 2)
             AS adv_units,
           -- daily tradable at 10% participation
           ROUND(CAST(total_vol_fp AS DOUBLE) / n_days / 1e6 * 0.10, 2)
             AS daily_tradable,
           -- capacity: tradable/day * 250 days / (strategy turnover 50x)
           ROUND(CAST(total_vol_fp AS DOUBLE) / n_days / 1e6 * 0.10
                 * 250 / 50, 2) AS capacity_units
    FROM adv ORDER BY sym
"""
)

register_sql(
    "x511_capacity_estimate",
    spark_sql=_X511.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X511.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "planning"),
)

# -- x512: liquidity in stress --------------------------------------------------------------------

_X512 = (
    "WITH " + _DAILY + """,
    ranked AS (
      SELECT sym, dkey, dvol_fp, aret_fp,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY aret_fp, dkey)
               AS rk,
             COUNT(*) OVER (PARTITION BY sym) AS n
      FROM drets
    ),
    marked AS (
      -- top-quintile |return| days are the stress regime; the Amihud
      -- term |ret|/dvol is one IEEE expression over exact ints,
      -- 1e15-quantized before the per-regime sums
      SELECT sym,
             CASE WHEN rk * 5 > 4 * n THEN 1 ELSE 0 END AS stress,
             CAST(FLOOR(CAST(aret_fp AS DOUBLE) / 1e9
                        / (CAST(dvol_fp AS DOUBLE) / 1e6) * 1e15)
                  AS BIGINT) AS illiq_fp
      FROM ranked WHERE dvol_fp > 0
    ),
    agg AS (
      SELECT sym, stress,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(illiq_fp) AS BIGINT) AS s_illiq
      FROM marked GROUP BY sym, stress
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(MAX(CASE WHEN stress = 0 THEN n_days END) AS BIGINT)
             AS calm_days,
           CAST(MAX(CASE WHEN stress = 1 THEN n_days END) AS BIGINT)
             AS stress_days,
           ROUND(CAST(MAX(CASE WHEN stress = 0 THEN s_illiq END) AS DOUBLE)
                 / MAX(CASE WHEN stress = 0 THEN n_days END) / 1e15, 12)
             AS amihud_calm,
           ROUND(CAST(MAX(CASE WHEN stress = 1 THEN s_illiq END) AS DOUBLE)
                 / MAX(CASE WHEN stress = 1 THEN n_days END) / 1e15, 12)
             AS amihud_stress,
           CASE WHEN MAX(CASE WHEN stress = 0 THEN s_illiq END) > 0 THEN
             ROUND((CAST(MAX(CASE WHEN stress = 1 THEN s_illiq END)
                         AS DOUBLE)
                    / MAX(CASE WHEN stress = 1 THEN n_days END))
                   / (CAST(MAX(CASE WHEN stress = 0 THEN s_illiq END)
                           AS DOUBLE)
                      / MAX(CASE WHEN stress = 0 THEN n_days END)), 4)
           END AS stress_ratio
    FROM agg GROUP BY sym
    HAVING MAX(CASE WHEN stress = 1 THEN n_days END) IS NOT NULL
       AND MAX(CASE WHEN stress = 0 THEN n_days END) IS NOT NULL
    ORDER BY sym
"""
)

register_sql(
    "x512_liquidity_stress",
    spark_sql=_X512.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X512.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)
