"""Wave 164 (x558–x560): the tail-risk VALIDATION layer — GPD fitting
and the regulatory VaR backtests.

x558 — peaks-over-threshold GPD: exceedances of |minute returns| over
each symbol's exact 95th-percentile threshold, fitted by method of
moments (ξ = (1 − m²/s²)/2, σ̃ = m(m²/s² + 1)/2) — the third EVT
estimator beside Hill (x433, tail index) and Gumbel block maxima
(x497); a positive ξ says the tail is heavier than exponential.

x559 — Kupiec proportion-of-failures test: the 95% historical VaR
(exact order statistic per symbol) is backtested on its own sample —
the unconditional-coverage LR statistic from exact exceedance counts
(each log term quantized before the two-term sum) against the 3.841
cutoff.  The Basel-style check that a VaR model fails the right number
of times.

x560 — Christoffersen independence test: VaR failures must also not
CLUSTER — the first-order Markov LR on the exceedance indicator's
transition counts (n00, n01, n10, n11), all exact integers with
quantized log-likelihood terms.  Kupiec + Christoffersen together are
the standard conditional-coverage pair.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_RETS = """
    ticks AS (
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
      SELECT sym, mkey,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)
                           / CAST(LAG(px) OVER (PARTITION BY sym
                                                ORDER BY mkey) AS DOUBLE))
                        * 1e9) AS BIGINT) AS r
      FROM lastpx
    ),
    ranked AS (
      SELECT sym, mkey, r,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY r, mkey) AS rk,
             COUNT(*) OVER (PARTITION BY sym) AS n
      FROM rets WHERE r IS NOT NULL
    ),
    var95 AS (
      -- 5th percentile of returns = the 95% VaR loss threshold
      SELECT sym, r AS var_fp FROM ranked WHERE rk = (n + 19) {intdiv} 20
    )
"""

# -- x558: GPD peaks over threshold -------------------------------------------------------------

_X558 = (
    "WITH " + _RETS + """,
    thresh AS (
      -- exact 95th percentile of |r|
      SELECT sym, ar AS u FROM (
        SELECT sym, ABS(r) AS ar,
               ROW_NUMBER() OVER (PARTITION BY sym ORDER BY ABS(r), mkey)
                 AS rk,
               COUNT(*) OVER (PARTITION BY sym) AS n
        FROM rets WHERE r IS NOT NULL
      ) a WHERE rk = (19 * n + 19) {intdiv} 20
    ),
    exceed AS (
      SELECT r.sym, ABS(r.r) - t.u AS e
      FROM rets r JOIN thresh t ON r.sym = t.sym
      WHERE r.r IS NOT NULL AND ABS(r.r) > t.u
    ),
    moms AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n_exc,
             CAST(SUM(e) AS BIGINT) AS s1,
             CAST(SUM(CAST(e AS DECIMAL(18,0)) * e) AS DECIMAL(38,0)) AS s2
      FROM exceed GROUP BY sym
    ),
    fitted AS (
      SELECT sym, n_exc,
             CAST(s1 AS DOUBLE) / n_exc AS m,
             CAST(s2 AS DOUBLE) / n_exc
               - POWER(CAST(s1 AS DOUBLE) / n_exc, 2) AS v
      FROM moms WHERE n_exc > 10
    )
    SELECT CAST(sym AS BIGINT) AS sym, n_exc AS n_exceedances,
           ROUND(m / 1e9, 9) AS mean_excess,
           CASE WHEN v > 0 THEN
             ROUND((1 - m * m / v) / 2, 6) END AS gpd_xi,
           CASE WHEN v > 0 THEN
             ROUND(m * (m * m / v + 1) / 2 / 1e9, 9) END AS gpd_sigma,
           CASE WHEN v > 0 AND (1 - m * m / v) / 2 > 0 THEN 1 ELSE 0 END
             AS heavy_tailed
    FROM fitted ORDER BY sym
"""
)

register_sql(
    "x558_gpd_pot",
    spark_sql=_X558.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X558.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x559: Kupiec POF --------------------------------------------------------------------------

_X559 = (
    "WITH " + _RETS + """,
    hits AS (
      SELECT r.sym,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN r.r < v.var_fp THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM rets r JOIN var95 v ON r.sym = v.sym
      WHERE r.r IS NOT NULL
      GROUP BY r.sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n, x AS exceedances,
           ROUND(CAST(x AS DOUBLE) / n, 6) AS observed_rate,
           -- LR_pof = -2[ (n-x)ln(0.95) + x ln(0.05)
           --            - (n-x)ln(1-x/n) - x ln(x/n) ]
           CASE WHEN x > 0 AND x < n THEN
             ROUND(-2 * ((n - x) * LN(0.95) + x * LN(0.05)
                         - (n - x) * LN(1 - CAST(x AS DOUBLE) / n)
                         - x * LN(CAST(x AS DOUBLE) / n)), 4)
           END AS kupiec_lr,
           CASE WHEN x > 0 AND x < n
                 AND -2 * ((n - x) * LN(0.95) + x * LN(0.05)
                           - (n - x) * LN(1 - CAST(x AS DOUBLE) / n)
                           - x * LN(CAST(x AS DOUBLE) / n)) > 3.841
                THEN 1 ELSE 0 END AS reject_var_model
    FROM hits ORDER BY sym
"""
)

register_sql(
    "x559_kupiec_pof",
    spark_sql=_X559.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X559.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x560: Christoffersen independence ------------------------------------------------------------

_X560 = (
    "WITH " + _RETS + """,
    flags AS (
      SELECT r.sym, r.mkey,
             CASE WHEN r.r < v.var_fp THEN 1 ELSE 0 END AS hit
      FROM rets r JOIN var95 v ON r.sym = v.sym
      WHERE r.r IS NOT NULL
    ),
    trans AS (
      SELECT sym, hit,
             LAG(hit) OVER (PARTITION BY sym ORDER BY mkey) AS prev_hit
      FROM flags
    ),
    counts AS (
      SELECT sym,
             CAST(SUM(CASE WHEN prev_hit = 0 AND hit = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n00,
             CAST(SUM(CASE WHEN prev_hit = 0 AND hit = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n01,
             CAST(SUM(CASE WHEN prev_hit = 1 AND hit = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN prev_hit = 1 AND hit = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n11
      FROM trans WHERE prev_hit IS NOT NULL GROUP BY sym
    ),
    probs AS (
      SELECT sym, n00, n01, n10, n11,
             CAST(n01 AS DOUBLE) / (n00 + n01) AS p01,
             CAST(n11 AS DOUBLE) / NULLIF(n10 + n11, 0) AS p11,
             CAST(n01 + n11 AS DOUBLE) / (n00 + n01 + n10 + n11) AS p
      FROM counts WHERE n00 + n01 > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym, n00, n01, n10, n11,
           ROUND(p01, 6) AS p_hit_after_calm,
           ROUND(p11, 6) AS p_hit_after_hit,
           CASE WHEN p01 > 0 AND p11 IS NOT NULL AND p11 > 0
                 AND p01 < 1 AND p11 < 1 AND p > 0 AND p < 1 THEN
             ROUND(-2 * ((n00 + n10) * LN(1 - p) + (n01 + n11) * LN(p)
                         - n00 * LN(1 - p01) - n01 * LN(p01)
                         - n10 * LN(1 - p11) - n11 * LN(p11)), 4)
           END AS christoffersen_lr,
           CASE WHEN p11 IS NOT NULL AND p11 > p01 THEN 1 ELSE 0 END
             AS failures_cluster
    FROM probs ORDER BY sym
"""
)

register_sql(
    "x560_christoffersen",
    spark_sql=_X560.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X560.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)
