"""Wave 81 (x327–x329): time-series memory diagnostics on the tick stream.

Three standard answers to "does this series remember its past?", each
expressed so one per-sym sort feeds every window pass and all cross-row
accumulation is DECIMAL/integer-exact (the x322 moment discipline):

x327 — autocorrelation of trade-to-trade price changes at lags 1–3,
via the expanded estimator acf_k = (Sxy − x̄(Sx+Sy) + m·x̄²) / Σ(r−r̄)²
so every multi-row sum is a DECIMAL aggregate and the ratio itself is a
handful of per-row IEEE ops.  The three lag columns come from the SAME
window sort; the 3-rows-per-sym output is a stack over the aggregate
row, not three scans.  (Roll's model [x322] predicts acf₁ < 0 from
bid-ask bounce — the two keys cross-check each other.)

x328 — the Lo–MacKinlay variance ratio VR(q)=Var(r_q)/(q·Var(r_1))
with overlapping q=4 aggregation: a random walk measures VR ≈ 1, mean
reversion < 1, momentum > 1.  Both variances come from the same sorted
pass (LAG(px,1) and LAG(px,4)).

x329 — rescaled-range (Hurst) analysis over non-overlapping 64-tick
windows: Z_t = cumsum(p) − t·mean within the window, R = max Z − min Z,
S = population std, and H ≈ ln(R/S)/ln(n) at this single scale (a
one-scale estimate, not the multi-scale regression — stated, not
hidden).  Per-window R/S is quantized to 1e6 fixed-point BEFORE the
per-sym mean (the x321 pattern) so the cross-window sum is exact.
max/min over per-row doubles are selections, not sums — engine-safe.
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

# -- x327: autocorrelation at lags 1..3 ----------------------------------------
# Per lag k over the m = n-k overlap pairs: num = Sxy - mean*(Sx+Sy) +
# m*mean^2 with mean from the FULL diff series; den = Ssq - n*mean^2.
# This is the standard large-n ACF estimator (denominator over all n).

_X327_FMT = """
    WITH {ticks},
    d AS (
      SELECT sym,
             px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r,
             LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id)
               - LAG(px, 2) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r1,
             LAG(px, 2) OVER (PARTITION BY sym ORDER BY ts, event_id)
               - LAG(px, 3) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r2,
             LAG(px, 3) OVER (PARTITION BY sym ORDER BY ts, event_id)
               - LAG(px, 4) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r3
      FROM ticks
    ),
    agg AS (
      SELECT sym,
             CAST(COUNT(r) AS DOUBLE) AS n,
             CAST(CAST(SUM(r) AS DECIMAL(38,6)) AS DOUBLE) AS s1,
             CAST(CAST(SUM(r * r) AS DECIMAL(38,12)) AS DOUBLE) AS ssq,
             CAST(COUNT(r1) AS DOUBLE) AS m1,
             CAST(CAST(SUM(r * r1) AS DECIMAL(38,12)) AS DOUBLE) AS sxy1,
             CAST(CAST(SUM(CASE WHEN r1 IS NOT NULL THEN r END)
                  AS DECIMAL(38,6)) AS DOUBLE) AS sx1,
             CAST(CAST(SUM(r1) AS DECIMAL(38,6)) AS DOUBLE) AS sy1,
             CAST(COUNT(r2) AS DOUBLE) AS m2,
             CAST(CAST(SUM(r * r2) AS DECIMAL(38,12)) AS DOUBLE) AS sxy2,
             CAST(CAST(SUM(CASE WHEN r2 IS NOT NULL THEN r END)
                  AS DECIMAL(38,6)) AS DOUBLE) AS sx2,
             CAST(CAST(SUM(r2) AS DECIMAL(38,6)) AS DOUBLE) AS sy2,
             CAST(COUNT(r3) AS DOUBLE) AS m3,
             CAST(CAST(SUM(r * r3) AS DECIMAL(38,12)) AS DOUBLE) AS sxy3,
             CAST(CAST(SUM(CASE WHEN r3 IS NOT NULL THEN r END)
                  AS DECIMAL(38,6)) AS DOUBLE) AS sx3,
             CAST(CAST(SUM(r3) AS DECIMAL(38,6)) AS DOUBLE) AS sy3
      FROM d GROUP BY sym
    ),
    lags AS (
      SELECT sym, lag_k, m, sxy, sx, sy, n, s1, ssq FROM (
        SELECT sym, n, s1, ssq,
               {stack}
        FROM agg
      ) s {unnest_close}
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(lag_k AS BIGINT) AS lag_k,
           CAST(m AS BIGINT) AS n_pairs,
           ROUND((sxy - (s1 / n) * (sx + sy) + m * (s1 / n) * (s1 / n))
                 / (ssq - n * (s1 / n) * (s1 / n)), 6) + 0.0E0 AS acf
    FROM lags ORDER BY sym, lag_k
"""

register_sql(
    "x327_acf",
    spark_sql=_X327_FMT.format(
        ticks=_TICKS,
        stack="stack(3, 1, m1, sxy1, sx1, sy1, 2, m2, sxy2, sx2, sy2,"
        " 3, m3, sxy3, sx3, sy3) AS (lag_k, m, sxy, sx, sy)",
        unnest_close="",
    ),
    duckdb_sql=_X327_FMT.format(
        ticks=_TICKS,
        stack="unnest([{'lag_k': 1, 'm': m1, 'sxy': sxy1, 'sx': sx1, 'sy': sy1},"
        " {'lag_k': 2, 'm': m2, 'sxy': sxy2, 'sx': sx2, 'sy': sy2},"
        " {'lag_k': 3, 'm': m3, 'sxy': sxy3, 'sx': sx3, 'sy': sy3}],"
        " recursive := true)",
        unnest_close="",
    ),
    tags=("finance", "window"),
)

# -- x328: Lo-MacKinlay variance ratio (q = 4, overlapping) --------------------

_X328_FMT = """
    WITH {ticks},
    d AS (
      SELECT sym,
             px - LAG(px, 1) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r1,
             px - LAG(px, 4) OVER (PARTITION BY sym ORDER BY ts, event_id) AS r4
      FROM ticks
    ),
    agg AS (
      SELECT sym,
             CAST(COUNT(r1) AS DOUBLE) AS n1,
             CAST(CAST(SUM(r1) AS DECIMAL(38,6)) AS DOUBLE) AS s1,
             CAST(CAST(SUM(r1 * r1) AS DECIMAL(38,12)) AS DOUBLE) AS sq1,
             CAST(COUNT(r4) AS DOUBLE) AS n4,
             CAST(CAST(SUM(r4) AS DECIMAL(38,6)) AS DOUBLE) AS s4,
             CAST(CAST(SUM(r4 * r4) AS DECIMAL(38,12)) AS DOUBLE) AS sq4
      FROM d GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(n1 AS BIGINT) AS n_1period,
           CAST(n4 AS BIGINT) AS n_4period,
           ROUND(((sq4 - s4 * s4 / n4) / n4) / (4 * ((sq1 - s1 * s1 / n1) / n1)), 6)
             AS variance_ratio
    FROM agg ORDER BY sym
"""

register_sql(
    "x328_variance_ratio",
    spark_sql=_X328_FMT.format(ticks=_TICKS),
    duckdb_sql=_X328_FMT.format(ticks=_TICKS),
    tags=("finance", "window"),
)

# -- x329: rescaled-range Hurst at one scale (64-tick windows) -----------------

_X329_FMT = """
    WITH {ticks},
    seq AS (
      SELECT sym, px,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY ts, event_id) - 1 AS rn
      FROM ticks
    ),
    win AS (
      SELECT sym, px, rn, CAST(FLOOR(rn / 64) AS BIGINT) AS wid,
             rn % 64 + 1 AS t
      FROM seq
    ),
    full_windows AS (
      SELECT sym, wid FROM win GROUP BY sym, wid HAVING COUNT(*) = 64
    ),
    stats AS (
      SELECT w.sym, w.wid, w.t,
             CAST(SUM(w.px) OVER (PARTITION BY w.sym, w.wid ORDER BY w.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(28,6)) AS cum_px,
             CAST(SUM(w.px) OVER (PARTITION BY w.sym, w.wid)
               AS DECIMAL(28,6)) AS sum_px,
             CAST(SUM(w.px * w.px) OVER (PARTITION BY w.sym, w.wid)
               AS DECIMAL(38,12)) AS sum_sq
      FROM win w JOIN full_windows f ON w.sym = f.sym AND w.wid = f.wid
    ),
    z AS (
      SELECT sym, wid,
             CAST(cum_px AS DOUBLE) - t * (CAST(sum_px AS DOUBLE) / 64) AS z_t,
             CAST(sum_px AS DOUBLE) / 64 AS mean_px,
             CAST(sum_sq AS DOUBLE) AS ssq
      FROM stats
    ),
    rs AS (
      SELECT sym, wid,
             CAST(FLOOR((MAX(z_t) - MIN(z_t))
                        / SQRT(MAX(ssq) / 64 - MAX(mean_px) * MAX(mean_px))
                        * 1e6) AS BIGINT) AS rs_fp
      FROM z GROUP BY sym, wid
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           ROUND(CAST(CAST(SUM(CAST(rs_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(*) / 1e6, 4) AS avg_rs,
           ROUND(LN(CAST(CAST(SUM(CAST(rs_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                         AS DOUBLE) / COUNT(*) / 1e6) / LN(64), 4) AS hurst_1scale
    FROM rs GROUP BY sym ORDER BY sym
"""

register_sql(
    "x329_hurst_rs",
    spark_sql=_X329_FMT.format(ticks=_TICKS),
    duckdb_sql=_X329_FMT.format(ticks=_TICKS),
    tags=("finance", "window"),
)
