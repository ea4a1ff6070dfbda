"""Wave 98 (x378–x380): HAC errors, overnight decomposition, staleness.

x378 — Newey–West (HAC) standard error of the mean tick return with
Bartlett-kernel lags 1–2: autocorrelated series (x327 measures exactly
that) make the naive s/√n standard error a lie; the HAC correction
σ²_NW = γ₀ + 2·(2/3)γ₁ + 2·(1/3)γ₂ is the standard repair.  All three
autocovariance moment sets ride ONE per-sym sort (the x327 lag
columns); sums are DECIMAL-exact; the assembled variance is per-row
IEEE on scalars.  Each γ_k demeans both factors over the COMMON lag-k
sample (rows where r_k is non-null — which implies r non-null, since
the lag chain nests): per-lag means sa_k/m_k and sb_k/m_k, the
textbook estimator, not the full-sample-mean approximation.  Reports
naive vs HAC se side by side — the ratio IS the autocorrelation
penalty.

x379 — overnight/intraday variance decomposition: each day's return
splits into close→open (gap risk, when hedging is impossible) and
open→close (tradable); their variance shares answer "how much of my
risk can I even manage intraday?".  Day opens/closes are min_by/max_by
selections (the OHLCV discipline); per-day returns are quantized to
1e9 before the cross-day moment sums (x321).

x380 — price-staleness profile: share of zero-change ticks and the
longest FLAT run per symbol — the illiquidity/stale-feed screen that
x375's SIGNED streaks deliberately exclude (flat ticks break signed
runs there; here they ARE the object).  Same gaps-and-islands key,
applied to the is-flat indicator; one sort, exact integers.  A feed
that goes minutes without a price change is either illiquid or broken,
and G1/heartbeat only catch the second case.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_TICKS = """
    ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    )
"""

# -- x378: Newey-West standard error -------------------------------------------

_X378_FMT = """
    WITH {ticks},
    d AS (
      SELECT sym,
             px - LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r,
             LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id)
               - LAG(px, 2) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r1,
             LAG(px, 2) OVER (PARTITION BY sym ORDER BY ts, event_id)
               - LAG(px, 3) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r2
      FROM ticks
    ),
    m AS (
      SELECT sym,
             CAST(COUNT(r) AS DOUBLE) AS n,
             CAST(CAST(SUM(r) AS DECIMAL(38,6)) AS DOUBLE) AS s,
             CAST(CAST(SUM(r * r) AS DECIMAL(38,12)) AS DOUBLE) AS q,
             CAST(COUNT(r1) AS DOUBLE) AS m1,
             CAST(CAST(SUM(r * r1) AS DECIMAL(38,12)) AS DOUBLE) AS c1,
             CAST(CAST(SUM(CASE WHEN r1 IS NOT NULL THEN r END)
                  AS DECIMAL(38,6)) AS DOUBLE) AS sa1,
             CAST(CAST(SUM(r1) AS DECIMAL(38,6)) AS DOUBLE) AS sb1,
             CAST(COUNT(r2) AS DOUBLE) AS m2,
             CAST(CAST(SUM(r * r2) AS DECIMAL(38,12)) AS DOUBLE) AS c2,
             CAST(CAST(SUM(CASE WHEN r2 IS NOT NULL THEN r END)
                  AS DECIMAL(38,6)) AS DOUBLE) AS sa2,
             CAST(CAST(SUM(r2) AS DECIMAL(38,6)) AS DOUBLE) AS sb2
      FROM d GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(n AS BIGINT) AS n_rets,
           ROUND(SQRT((q / n - (s / n) * (s / n)) / n), 8) AS se_naive,
           ROUND(SQRT(GREATEST(
             (q / n - (s / n) * (s / n))
             + 2 * (CAST(2 AS DOUBLE) / 3) * (c1 / m1 - (sa1 / m1) * (sb1 / m1))
             + 2 * (CAST(1 AS DOUBLE) / 3) * (c2 / m2 - (sa2 / m2) * (sb2 / m2)),
             0) / n), 8)
             AS se_hac,
           ROUND(((q / n - (s / n) * (s / n))
                  + 2 * (CAST(2 AS DOUBLE) / 3)
                      * (c1 / m1 - (sa1 / m1) * (sb1 / m1))
                  + 2 * (CAST(1 AS DOUBLE) / 3)
                      * (c2 / m2 - (sa2 / m2) * (sb2 / m2)))
                 / (q / n - (s / n) * (s / n)), 4) AS variance_ratio
    FROM m ORDER BY sym
"""

register_sql(
    "x378_newey_west_se",
    spark_sql=_X378_FMT.format(ticks=_TICKS),
    duckdb_sql=_X378_FMT.format(ticks=_TICKS),
    tags=("finance", "stats"),
)

# -- x379: overnight vs intraday variance --------------------------------------

_X379_FMT = """
    WITH {ticks},
    daily AS (
      SELECT sym, CAST(ts AS DATE) AS d,
             {open_px} AS open_px,
             {close_px} AS close_px
      FROM ticks GROUP BY sym, CAST(ts AS DATE)
    ),
    rets AS (
      SELECT sym, d,
             CAST(FLOOR((CAST(open_px AS DOUBLE)
                         / CAST(LAG(close_px) OVER (PARTITION BY sym ORDER BY d)
                                AS DOUBLE) - 1) * 1e9) AS BIGINT) AS on_fp,
             CAST(FLOOR((CAST(close_px AS DOUBLE) / CAST(open_px AS DOUBLE) - 1)
                        * 1e9) AS BIGINT) AS id_fp
      FROM daily
    ),
    m AS (
      SELECT sym,
             CAST(COUNT(on_fp) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(on_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS s_on,
             CAST(CAST(SUM(CAST(on_fp AS DECIMAL(18,0)) * on_fp)
                  AS DECIMAL(38,0)) AS DOUBLE) AS q_on,
             CAST(CAST(SUM(CASE WHEN on_fp IS NOT NULL
                                THEN CAST(id_fp AS DECIMAL(18,0)) END)
                  AS DECIMAL(38,0)) AS DOUBLE) AS s_id,
             CAST(CAST(SUM(CASE WHEN on_fp IS NOT NULL
                                THEN CAST(id_fp AS DECIMAL(18,0)) * id_fp END)
                  AS DECIMAL(38,0)) AS DOUBLE) AS q_id
      FROM rets GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(n AS BIGINT) AS n_days,
           ROUND((q_on / n - (s_on / n) * (s_on / n)) / 1e18, 12) AS var_overnight,
           ROUND((q_id / n - (s_id / n) * (s_id / n)) / 1e18, 12) AS var_intraday,
           ROUND((q_on / n - (s_on / n) * (s_on / n))
                 / ((q_on / n - (s_on / n) * (s_on / n))
                    + (q_id / n - (s_id / n) * (s_id / n))), 4)
             AS overnight_share
    FROM m ORDER BY sym
"""

register_sql(
    "x379_overnight_intraday",
    spark_sql=_X379_FMT.format(
        ticks=_TICKS,
        open_px="CAST(min_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
    ),
    duckdb_sql=_X379_FMT.format(
        ticks=_TICKS,
        open_px="CAST(first(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
    ),
    tags=("finance", "stats"),
)

# -- x380: flat-run staleness profile ------------------------------------------

_X380_FMT = """
    WITH {ticks},
    flagged AS (
      SELECT sym, ts, event_id,
             CASE WHEN px = LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS is_flat
      FROM ticks
    ),
    keyed AS (
      SELECT sym, is_flat,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY sym, is_flat
                                    ORDER BY ts, event_id) AS grp
      FROM flagged
    ),
    islands AS (
      SELECT sym, is_flat, grp, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM keyed GROUP BY sym, is_flat, grp
    )
    SELECT CAST(f.sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(f.is_flat) AS BIGINT) AS n_flat,
           ROUND(CAST(SUM(f.is_flat) AS DOUBLE) / COUNT(*), 6) AS flat_share,
           CAST(MAX(i.longest_flat) AS BIGINT) AS longest_flat_run
    FROM flagged f
    JOIN (
      SELECT sym, MAX(CASE WHEN is_flat = 1 THEN run_len ELSE 0 END)
               AS longest_flat
      FROM islands GROUP BY sym
    ) i ON f.sym = i.sym
    GROUP BY f.sym ORDER BY f.sym
"""

register_sql(
    "x380_flat_run_staleness",
    spark_sql=_X380_FMT.format(ticks=_TICKS),
    duckdb_sql=_X380_FMT.format(ticks=_TICKS),
    tags=("quality", "finance"),
)
