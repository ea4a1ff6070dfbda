"""Wave 156 (x537–x539): partial-moment performance diagnostics.

x537 — Omega ratio at thresholds {0, +5bp}: the ratio of upper to
lower partial moments E[max(r−θ,0)]/E[max(θ−r,0)] — uses the WHOLE
return distribution where Sharpe uses two moments.  Partial moments
are exact integer sums of clamped 1e9-quantized returns.

x538 — Ulcer index and Martin (Ulcer-performance) ratio: RMS drawdown
depth from the running-max window over daily cumulative log returns —
penalizes depth AND duration where x182's max-drawdown sees only the
worst point.  Drawdown percentages are integer ratios squared in
DECIMAL.

x539 — up/down capture: each symbol's mean return on market-up minutes
vs the market's, and the same on down minutes (market = cross-
sectional mean return, the x417 spine).  The asymmetry pair every fund
factsheet prints; capture ratios are single IEEE expressions over
exact per-regime sums.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_MRETS = """
    ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey,
             {epoch} {intdiv} 86400 AS dkey, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    lastpx AS (
      SELECT sym, mkey, dkey, px FROM (
        SELECT sym, mkey, dkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t WHERE rn = 1
    ),
    rets AS (
      SELECT sym, mkey, dkey,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)
                           / CAST(LAG(px) OVER (PARTITION BY sym
                                                ORDER BY mkey) AS DOUBLE))
                        * 1e9) AS BIGINT) AS r
      FROM lastpx
    )
"""

# -- x537: Omega ratio ---------------------------------------------------------------------

_X537 = (
    "WITH " + _MRETS + """,
    thresholds AS (
      SELECT CAST(0 AS BIGINT) AS theta UNION ALL SELECT 50000
    ),
    moments AS (
      SELECT r.sym, t.theta,
             CAST(SUM(GREATEST(r.r - t.theta, 0)) AS BIGINT) AS upm,
             CAST(SUM(GREATEST(t.theta - r.r, 0)) AS BIGINT) AS lpm,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM rets r CROSS JOIN thresholds t
      WHERE r.r IS NOT NULL
      GROUP BY r.sym, t.theta
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           ROUND(theta / 1e9, 6) AS threshold,
           n,
           ROUND(CAST(upm AS DOUBLE) / n / 1e9, 9) AS upper_partial_moment,
           ROUND(CAST(lpm AS DOUBLE) / n / 1e9, 9) AS lower_partial_moment,
           CASE WHEN lpm > 0 THEN
             ROUND(CAST(upm AS DOUBLE) / lpm, 6)
           END AS omega_ratio
    FROM moments ORDER BY sym, threshold
"""
)

register_sql(
    "x537_omega_ratio",
    spark_sql=_X537.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X537.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x538: Ulcer index ---------------------------------------------------------------------

_X538_REAL = (
    "WITH " + _MRETS + """,
    daily AS (
      SELECT sym, dkey, CAST(SUM(r) AS BIGINT) AS dr
      FROM rets WHERE r IS NOT NULL GROUP BY sym, dkey
    ),
    cum AS (
      SELECT sym, dkey, dr,
             SUM(dr) OVER (PARTITION BY sym ORDER BY dkey) AS c
      FROM daily
    ),
    peaks AS (
      SELECT sym, dr, c,
             MAX(c) OVER (PARTITION BY sym ORDER BY dkey) AS peak
      FROM cum
    ),
    dds AS (
      SELECT sym, dr, GREATEST(peak - c, 0) AS dd FROM peaks
    ),
    agg AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(dr) AS BIGINT) AS total_ret,
             CAST(SUM(CAST(dd AS DECIMAL(18,0)) * dd) AS DECIMAL(38,0))
               AS sdd2
      FROM dds GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n_days,
           ROUND(CAST(total_ret AS DOUBLE) / 1e9, 9) AS total_log_return,
           ROUND(SQRT(CAST(sdd2 AS DOUBLE) / n_days) / 1e9, 9)
             AS ulcer_index,
           CASE WHEN sdd2 > 0 THEN
             ROUND((CAST(total_ret AS DOUBLE) / n_days)
                   / SQRT(CAST(sdd2 AS DOUBLE) / n_days), 6)
           END AS martin_ratio
    FROM agg ORDER BY sym
"""
)

register_sql(
    "x538_ulcer_index",
    spark_sql=_X538_REAL.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X538_REAL.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x539: capture ratios ---------------------------------------------------------------------

_X539 = (
    "WITH " + _MRETS + """,
    market AS (
      -- cross-sectional mean return per minute, exact integer pair
      SELECT mkey, CAST(SUM(r) AS BIGINT) AS sr,
             CAST(COUNT(r) AS BIGINT) AS nr
      FROM rets WHERE r IS NOT NULL GROUP BY mkey
    ),
    tagged AS (
      SELECT r.sym, r.r,
             CASE WHEN m.sr > 0 THEN 1
                  WHEN m.sr < 0 THEN -1 ELSE 0 END AS regime,
             m.sr, m.nr
      FROM rets r JOIN market m ON r.mkey = m.mkey
      WHERE r.r IS NOT NULL
    ),
    sums AS (
      SELECT sym,
             CAST(SUM(CASE WHEN regime = 1 THEN r ELSE 0 END) AS BIGINT)
               AS up_sym,
             CAST(SUM(CASE WHEN regime = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS up_n,
             -- per-row market mean is sr/nr; sum the exact integer
             -- cross products and divide once at the end
             CAST(SUM(CASE WHEN regime = 1 THEN sr * 1000 {intdiv} nr
                           ELSE 0 END) AS BIGINT) AS up_mkt_milli,
             CAST(SUM(CASE WHEN regime = -1 THEN r ELSE 0 END) AS BIGINT)
               AS dn_sym,
             CAST(SUM(CASE WHEN regime = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dn_n,
             CAST(SUM(CASE WHEN regime = -1 THEN sr * 1000 {intdiv} nr
                           ELSE 0 END) AS BIGINT) AS dn_mkt_milli
      FROM tagged GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, up_n, dn_n,
           CASE WHEN up_mkt_milli > 0 THEN
             ROUND(CAST(up_sym AS DOUBLE) * 1000 / up_mkt_milli, 6)
           END AS up_capture,
           CASE WHEN dn_mkt_milli < 0 THEN
             ROUND(CAST(dn_sym AS DOUBLE) * 1000 / dn_mkt_milli, 6)
           END AS down_capture,
           CASE WHEN up_mkt_milli > 0 AND dn_mkt_milli < 0
                 AND CAST(dn_sym AS DOUBLE) * 1000 / dn_mkt_milli != 0 THEN
             ROUND((CAST(up_sym AS DOUBLE) * 1000 / up_mkt_milli)
                   / (CAST(dn_sym AS DOUBLE) * 1000 / dn_mkt_milli), 6)
           END AS capture_spread
    FROM sums ORDER BY sym
"""
)

register_sql(
    "x539_capture_ratios",
    spark_sql=_X539.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X539.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)
