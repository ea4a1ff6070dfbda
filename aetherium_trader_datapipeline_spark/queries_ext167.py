"""Wave 167 (x567–x569): three high-frequency econometrics estimators
that close gaps next to Epps (x460), bipower (x386), and the forecast
scoreboard (x359/x431/x475).

x567 — Hayashi–Yoshida covariance: the estimator that fixes the Epps
bias x460 measured.  Instead of aligning two asynchronous tick series
to a grid (which shrinks covariance as the grid tightens), HY sums
ΔX_i·ΔY_j over every OVERLAPPING pair of inter-tick intervals — no
interpolation, no grid.  The overlap pair-join is made scale-safe the
x239 way: each interval is exploded to the minute buckets it spans and
pairs meet through a minute-bucket equi-join (never a BNLJ over
|ticks|²); DISTINCT collapses multi-minute double-hits.  Price deltas
are integer micro-units, the pair product sum is DECIMAL(38,0)-exact,
and the HY correlation divides by the interval-wise realized
volatilities.

x568 — Lee–Mykland jump detection: per symbol, each tick return is
tested against the LOCAL bipower volatility of the preceding K=20
ticks (Σ|r_j||r_{j−1}| over a ROWS window, π/2-scaled) — the
statistic L_i = r_i/σ̂_i flags jumps that a global-volatility
threshold (x342's MAD screen) would miss in volatile regimes.  Counts
and the max |L| are exact (integer rolling sums; one IEEE expression
per row, 1e6-quantized before the MAX).

x569 — Diebold–Mariano forecast comparison: naive (last close) vs
3-day moving average, squared-error losses in integer micro-units per
day.  The loss-differential series gets the DM statistic with a
lag-1 Newey–West variance whose autocovariance demeans BOTH factors
over the common lag sample (the x378 ADVICE repair, applied here from
the start) — all moment sums DECIMAL(38,0)-exact, one IEEE assembly.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x567: Hayashi–Yoshida asynchronous covariance -------------------------------

_X567_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(FLOOR((100 + (value - FLOOR(value)) * 10) * 1000000)
                  AS BIGINT) AS pu,
             {epoch_us} AS t_us
      FROM events WHERE value IS NOT NULL AND user_id % 10 IN (0, 1)
    ),
    iv AS (
      SELECT sym, t_us AS e_us,
             LAG(t_us) OVER (PARTITION BY sym ORDER BY ts, event_id)
               AS s_us,
             pu - LAG(pu) OVER (PARTITION BY sym ORDER BY ts, event_id)
               AS dp,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY ts, event_id)
               AS rid
      FROM ticks
    ),
    spans AS (
      SELECT sym, rid, s_us, e_us, dp,
             s_us {intdiv} 60000000 AS m0,
             e_us {intdiv} 60000000 AS m1
      FROM iv WHERE s_us IS NOT NULL
    ),
    stabs AS (
      SELECT sym, rid, s_us, e_us, dp, m
      FROM spans {stab}
    ),
    pairs AS (
      SELECT DISTINCT x.rid AS xid, y.rid AS yid, x.dp AS dx, y.dp AS dy
      FROM stabs x JOIN stabs y
        ON x.m = y.m AND x.sym = 0 AND y.sym = 1
       AND x.s_us < y.e_us AND y.s_us < x.e_us
    ),
    hy AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(CAST(dx * dy AS DECIMAL(38,0))) AS cov_u2
      FROM pairs
    ),
    rv AS (
      -- one SCALAR conditional aggregation instead of the r6 per-sym
      -- GROUP BY + two filtered cross joins: the scalar form's BNLJ
      -- build side is HashAggregate(keys=[]) — provably one row at any
      -- scale — where the keyed form's bound (≤2 rows, sym in 0/1 by
      -- the ticks filter) was true but not machine-checkable
      -- (VERDICT r6 ask #1).
      SELECT
        CAST(SUM(CASE WHEN sym = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_x,
        CAST(SUM(CASE WHEN sym = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_y,
        SUM(CASE WHEN sym = 0
                 THEN CAST(dp * dp AS DECIMAL(38,0)) END) AS rvx_u2,
        SUM(CASE WHEN sym = 1
                 THEN CAST(dp * dp AS DECIMAL(38,0)) END) AS rvy_u2
      FROM spans
    )
    SELECT h.n_pairs,
           r.n_x, r.n_y,
           ROUND(CAST(h.cov_u2 AS DOUBLE) / 1e12, 6) AS hy_cov,
           ROUND(CAST(r.rvx_u2 AS DOUBLE) / 1e12, 6) AS rv_x,
           ROUND(CAST(r.rvy_u2 AS DOUBLE) / 1e12, 6) AS rv_y,
           ROUND(CAST(h.cov_u2 AS DOUBLE)
                 / SQRT(CAST(r.rvx_u2 AS DOUBLE)
                        * CAST(r.rvy_u2 AS DOUBLE)), 6) AS hy_corr
    FROM hy h CROSS JOIN rv r
"""

_STAB_SPARK = "LATERAL VIEW explode(sequence(m0, m1)) t AS m"
_STAB_DUCK = ", LATERAL unnest(generate_series(m0, m1)) AS t(m)"

register_sql(
    "x567_hayashi_yoshida",
    spark_sql=_X567_FMT.format(
        epoch_us="unix_micros(ts)", intdiv="DIV", stab=_STAB_SPARK
    ),
    duckdb_sql=_X567_FMT.format(
        epoch_us="epoch_us(ts)", intdiv="//", stab=_STAB_DUCK
    ),
    tags=("finance", "microstructure"),
)

# -- x568: Lee–Mykland local-volatility jump flags -------------------------------

_X568_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(FLOOR((100 + (value - FLOOR(value)) * 10) * 1000000)
                  AS BIGINT) AS pu,
             {epoch_us} {intdiv} 86400000000 AS d
      FROM events WHERE value IS NOT NULL
    ),
    nxt AS (
      -- each day's successor PRESENT day per sym (a |syms| x |days|
      -- frame), so the overlap carry below survives calendar gaps
      SELECT sym, d,
             LEAD(d) OVER (PARTITION BY sym ORDER BY d) AS d_next
      FROM (SELECT DISTINCT sym, d FROM ticks)
    ),
    tagged AS (
      -- r7 rewrite (VERDICT r6 watch item: parallelism was |syms| — 10
      -- single-threaded sorts of the whole stream, 25.1 s at the 100x
      -- replica). The three stacked per-sym windows need at most 21
      -- preceding rows (LAG for r, LAG for bpterm, 19-PRECEDING bipower
      -- sum), so chunk by (sym, day) and CARRY each day's trailing 22
      -- rows into the sym's next present day: every row then sees its
      -- exact global context inside a (sym, day)-wide partition
      -- (exact when each (sym, day) holds >= 22 ticks — true at every
      -- fixture SF; a sparser day truncates the lookback to that day's
      -- carry, and the bv_n >= 10 support gate below already handles
      -- thin windows), and carried helper copies are dropped before
      -- aggregation.
      SELECT sym, d, ts, event_id, pu,
             ROW_NUMBER() OVER (PARTITION BY sym, d
                                ORDER BY ts DESC, event_id DESC) AS rdesc
      FROM ticks
    ),
    ext AS (
      SELECT sym, d AS grp, ts, event_id, pu, 0 AS carried FROM tagged
      UNION ALL
      SELECT t.sym, x.d_next AS grp, t.ts, t.event_id, t.pu, 1 AS carried
      FROM tagged t JOIN nxt x ON t.sym = x.sym AND t.d = x.d
      WHERE t.rdesc <= 22 AND x.d_next IS NOT NULL
    ),
    rets AS (
      SELECT sym, grp, ts, event_id, carried,
             pu - LAG(pu) OVER (PARTITION BY sym, grp
                                ORDER BY ts, event_id) AS r
      FROM ext
    ),
    bp AS (
      SELECT sym, grp, r, carried,
             ABS(r) * ABS(LAG(r) OVER (PARTITION BY sym, grp
                                       ORDER BY ts, event_id)) AS bpterm,
             ts, event_id
      FROM rets WHERE r IS NOT NULL
    ),
    localvol AS (
      -- trailing K=20 bipower sum, excluding the tested return itself
      SELECT sym, r, carried,
             SUM(bpterm) OVER (
               PARTITION BY sym, grp ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS bv_sum,
             COUNT(bpterm) OVER (
               PARTITION BY sym, grp ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING) AS bv_n
      FROM bp
    ),
    stats AS (
      SELECT sym, r, bv_sum, bv_n,
             CASE WHEN bv_n >= 10 AND bv_sum > 0 THEN
               CAST(FLOOR(ABS(
                 CAST(r AS DOUBLE)
                 / SQRT(1.57079632679 * CAST(bv_sum AS DOUBLE) / bv_n)
               ) * 1e6) AS BIGINT)
             END AS l_abs_fp
      FROM localvol WHERE carried = 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(COUNT(l_abs_fp) AS BIGINT) AS n_tested,
           CAST(SUM(CASE WHEN l_abs_fp > 4000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_jumps,
           ROUND(MAX(l_abs_fp) / 1e6, 6) AS max_abs_l,
           CASE WHEN COUNT(l_abs_fp) > 0 THEN
             ROUND(CAST(SUM(CASE WHEN l_abs_fp > 4000000 THEN 1 ELSE 0 END)
                        AS DOUBLE)
                   / COUNT(l_abs_fp), 6)
           END AS jump_share
    FROM stats GROUP BY sym ORDER BY sym
"""

register_sql(
    "x568_lee_mykland_jumps",
    spark_sql=_X568_FMT.format(epoch_us="unix_micros(ts)", intdiv="DIV"),
    duckdb_sql=_X568_FMT.format(epoch_us="epoch_us(ts)", intdiv="//"),
    tags=("finance", "microstructure"),
)

# -- x569: Diebold–Mariano with lag-1 HAC (per-lag demeaned) ---------------------

_X569_FMT = """
    WITH closes AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d,
             {close_pu} AS cu
      FROM (SELECT user_id, ts, event_id,
                   CAST(FLOOR((100 + (value - FLOOR(value)) * 10)
                              * 1000000) AS BIGINT) AS pu
            FROM events WHERE value IS NOT NULL) t
      GROUP BY user_id % 10, CAST(ts AS DATE)
    ),
    fc AS (
      SELECT sym, d, cu,
             LAG(cu) OVER (PARTITION BY sym ORDER BY d) AS f_naive,
             CAST((LAG(cu) OVER (PARTITION BY sym ORDER BY d)
                   + LAG(cu, 2) OVER (PARTITION BY sym ORDER BY d)
                   + LAG(cu, 3) OVER (PARTITION BY sym ORDER BY d))
                  {intdiv} 3 AS BIGINT) AS f_ma3
      FROM closes
    ),
    losses AS (
      SELECT sym, d,
             (cu - f_naive) * (cu - f_naive) AS la,
             (cu - f_ma3) * (cu - f_ma3) AS lb
      FROM fc WHERE f_ma3 IS NOT NULL
    ),
    diffs AS (
      SELECT sym, la, lb, la - lb AS dt,
             LAG(la - lb) OVER (PARTITION BY sym ORDER BY d) AS dt1
      FROM losses
    ),
    moments AS (
      SELECT sym,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(dt AS DECIMAL(38,0))) AS s1,
             SUM(CAST(dt AS DECIMAL(38,6)) * dt) AS s2,
             SUM(CAST(la AS DECIMAL(38,0))) AS sla,
             SUM(CAST(lb AS DECIMAL(38,0))) AS slb,
             -- lag-1 cross sums restricted to the common sample
             CAST(COUNT(dt1) AS BIGINT) AS m,
             SUM(CASE WHEN dt1 IS NOT NULL
                      THEN CAST(dt AS DECIMAL(38,6)) * dt1 END) AS p1,
             SUM(CASE WHEN dt1 IS NOT NULL
                      THEN CAST(dt AS DECIMAL(38,0)) END) AS a1,
             SUM(CAST(dt1 AS DECIMAL(38,0))) AS a2
      FROM diffs GROUP BY sym
    ),
    stat AS (
      SELECT sym, n,
             CAST(s1 AS DOUBLE) / n AS dbar,
             -- gamma0 with the full-sample mean
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
               AS g0,
             -- gamma1 with PER-LAG means over the m-row common sample
             (CAST(p1 AS DOUBLE)
              - CAST(a1 AS DOUBLE) * CAST(a2 AS DOUBLE) / m) / m AS g1,
             CAST(sla AS DOUBLE) / n / 1e12 AS mean_loss_naive,
             CAST(slb AS DOUBLE) / n / 1e12 AS mean_loss_ma3
      FROM moments WHERE n >= 10
    )
    SELECT CAST(sym AS BIGINT) AS sym, n AS n_days,
           ROUND(mean_loss_naive, 6) AS mean_loss_naive,
           ROUND(mean_loss_ma3, 6) AS mean_loss_ma3,
           CASE WHEN g0 + 2 * g1 > 0 THEN
             ROUND(dbar / SQRT((g0 + 2 * g1) / n), 6)
           END AS dm_stat,
           CASE WHEN g0 + 2 * g1 > 0
                 AND ABS(dbar / SQRT((g0 + 2 * g1) / n)) > 1.96
                THEN CASE WHEN dbar > 0 THEN 'ma3' ELSE 'naive' END
                ELSE 'tie' END AS winner_5pct
    FROM stat ORDER BY sym
"""

register_sql(
    "x569_diebold_mariano",
    spark_sql=_X569_FMT.format(
        close_pu="max_by(pu, struct(ts, event_id))", intdiv="DIV"
    ),
    duckdb_sql=_X569_FMT.format(
        close_pu="last(pu ORDER BY ts, event_id)", intdiv="//"
    ),
    tags=("finance", "forecast"),
)
