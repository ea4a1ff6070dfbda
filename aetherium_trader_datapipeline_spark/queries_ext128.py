"""Wave 128 (x456–x458): stratified causal effects, price-impact decay,
and leakage-safe backtest splits.

x456 — stratified ATT: the treatment effect with exact stratification
on (event_type, 6-hour block) — 20 strata, treated/control from the
x415 hash-bit arm.  Per-stratum mean differences are 1e9-quantized
single IEEE expressions weighted by exact treated counts, so the
weighted ATT is an integer ratio; the UNSTRATIFIED naive difference sits
alongside to show the confounding the strata remove.  Completes the
causal family: CUPED (x415), DiD (x264), event study (x417).

x457 — price-impact propagator decay: the response of future returns to
signed volume at lags 1..5 minutes (Bouchaud's propagator, measured as
per-lag OLS slopes).  ONE windowed pass computes all five LEADs; one
aggregate per symbol carries the five (n, Σr, Σqr) moment triplets; the
5-row output is fanned out by a literal lag dim with CASE selection —
the x419 lesson (a 5-branch UNION ALL would recompute the window 5×).

x458 — purged walk-forward splits (López de Prado): five expanding
train/test day splits with a 1-day label horizon purge + 1-day embargo
between train end and test start.  Emits per-fold day spans and exact
row counts — the split audit a leakage-safe financial backtest records
before any model sees the data.  Complements x318 (group k-fold) and
x302 (split leakage audit).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x456: stratified ATT -----------------------------------------------------------------

_X456 = """
    WITH obs AS (
      SELECT event_type,
             {hour} {intdiv} 6 AS hblock,
             (((user_id * 2654435761) {intdiv} 1024) % 2) AS treated,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    strata AS (
      SELECT event_type, hblock,
             CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(SUM(CASE WHEN treated = 1 THEN CAST(y AS DECIMAL(18,0))
                           ELSE 0 END) AS DECIMAL(38,0)) AS s_t,
             CAST(SUM(CASE WHEN treated = 0 THEN CAST(y AS DECIMAL(18,0))
                           ELSE 0 END) AS DECIMAL(38,0)) AS s_c
      FROM obs GROUP BY event_type, hblock
    ),
    diffs AS (
      SELECT event_type, hblock, n_t, n_c,
             CAST(FLOOR((CAST(s_t AS DOUBLE) / n_t
                         - CAST(s_c AS DOUBLE) / n_c) / 1e6 * 1e9)
                  AS BIGINT) AS diff_fp
      FROM strata WHERE n_t > 0 AND n_c > 0
    ),
    global_means AS (
      SELECT CAST(SUM(s_t) AS DOUBLE) / SUM(n_t) AS m_t,
             CAST(SUM(s_c) AS DOUBLE) / SUM(n_c) AS m_c
      FROM strata
    )
    SELECT d.event_type, CAST(d.hblock AS BIGINT) AS hour_block,
           d.n_t AS n_treated, d.n_c AS n_control,
           ROUND(d.diff_fp / 1e9, 6) AS stratum_diff,
           ROUND(CAST(SUM(d.n_t * d.diff_fp) OVER () AS DOUBLE)
                 / SUM(d.n_t) OVER () / 1e9, 6) AS stratified_att,
           ROUND((g.m_t - g.m_c) / 1e6, 6) AS naive_diff
    FROM diffs d CROSS JOIN global_means g
    ORDER BY d.event_type, hour_block
"""

register_sql(
    "x456_stratified_att",
    spark_sql=_X456.format(intdiv="DIV", hour="hour(ts)"),
    duckdb_sql=_X456.format(
        intdiv="//", hour="CAST(EXTRACT(hour FROM ts) AS BIGINT)"
    ),
    tags=("experiment", "stats"),
)

# -- x457: propagator decay ----------------------------------------------------------------

_X457 = """
    WITH ticks AS (
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
    flows AS (
      -- signed volume (tick rule) and the five future returns in ONE
      -- window pass over the bar series
      SELECT sym,
             CASE WHEN cl > LAG(cl) OVER w THEN vol
                  WHEN cl < LAG(cl) OVER w THEN -vol
                  ELSE 0 END AS q,
             CAST(FLOOR(LN(CAST(LEAD(cl, 1) OVER w AS DOUBLE)
                           / CAST(cl AS DOUBLE)) * 1e9) AS BIGINT) AS r1,
             CAST(FLOOR(LN(CAST(LEAD(cl, 2) OVER w AS DOUBLE)
                           / CAST(LEAD(cl, 1) OVER w AS DOUBLE)) * 1e9)
                  AS BIGINT) AS r2,
             CAST(FLOOR(LN(CAST(LEAD(cl, 3) OVER w AS DOUBLE)
                           / CAST(LEAD(cl, 2) OVER w AS DOUBLE)) * 1e9)
                  AS BIGINT) AS r3,
             CAST(FLOOR(LN(CAST(LEAD(cl, 4) OVER w AS DOUBLE)
                           / CAST(LEAD(cl, 3) OVER w AS DOUBLE)) * 1e9)
                  AS BIGINT) AS r4,
             CAST(FLOOR(LN(CAST(LEAD(cl, 5) OVER w AS DOUBLE)
                           / CAST(LEAD(cl, 4) OVER w AS DOUBLE)) * 1e9)
                  AS BIGINT) AS r5
      FROM bars
      WINDOW w AS (PARTITION BY sym ORDER BY mkey)
    ),
    moms AS (
      SELECT sym,
             CAST(SUM(CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(SUM(CASE WHEN r3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n3,
             CAST(SUM(CASE WHEN r4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n4,
             CAST(SUM(CASE WHEN r5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n5,
             CAST(SUM(CASE WHEN r1 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS sq1,
             CAST(SUM(CASE WHEN r2 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS sq2,
             CAST(SUM(CASE WHEN r3 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS sq3,
             CAST(SUM(CASE WHEN r4 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS sq4,
             CAST(SUM(CASE WHEN r5 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) ELSE 0 END)
                  AS DECIMAL(38,0)) AS sq5,
             CAST(SUM(CASE WHEN r1 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) * q ELSE 0 END)
                  AS DECIMAL(38,0)) AS sqq1,
             CAST(SUM(CASE WHEN r2 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) * q ELSE 0 END)
                  AS DECIMAL(38,0)) AS sqq2,
             CAST(SUM(CASE WHEN r3 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) * q ELSE 0 END)
                  AS DECIMAL(38,0)) AS sqq3,
             CAST(SUM(CASE WHEN r4 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) * q ELSE 0 END)
                  AS DECIMAL(38,0)) AS sqq4,
             CAST(SUM(CASE WHEN r5 IS NOT NULL
                           THEN CAST(q AS DECIMAL(18,0)) * q ELSE 0 END)
                  AS DECIMAL(38,0)) AS sqq5,
             CAST(SUM(CAST(COALESCE(r1, 0) AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS sr1,
             CAST(SUM(CAST(COALESCE(r2, 0) AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS sr2,
             CAST(SUM(CAST(COALESCE(r3, 0) AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS sr3,
             CAST(SUM(CAST(COALESCE(r4, 0) AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS sr4,
             CAST(SUM(CAST(COALESCE(r5, 0) AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS sr5,
             CAST(SUM(CAST(q AS DECIMAL(18,0)) * COALESCE(r1, 0))
                  AS DECIMAL(38,0)) AS sqr1,
             CAST(SUM(CAST(q AS DECIMAL(18,0)) * COALESCE(r2, 0))
                  AS DECIMAL(38,0)) AS sqr2,
             CAST(SUM(CAST(q AS DECIMAL(18,0)) * COALESCE(r3, 0))
                  AS DECIMAL(38,0)) AS sqr3,
             CAST(SUM(CAST(q AS DECIMAL(18,0)) * COALESCE(r4, 0))
                  AS DECIMAL(38,0)) AS sqr4,
             CAST(SUM(CAST(q AS DECIMAL(18,0)) * COALESCE(r5, 0))
                  AS DECIMAL(38,0)) AS sqr5
      FROM flows WHERE q IS NOT NULL GROUP BY sym
    ),
    lags AS (
      SELECT 1 AS lag UNION ALL SELECT 2 UNION ALL SELECT 3
      UNION ALL SELECT 4 UNION ALL SELECT 5
    ),
    fanned AS (
      SELECT m.sym, l.lag,
             CASE l.lag WHEN 1 THEN m.n1 WHEN 2 THEN m.n2 WHEN 3 THEN m.n3
                        WHEN 4 THEN m.n4 ELSE m.n5 END AS n,
             CASE l.lag WHEN 1 THEN m.sq1 WHEN 2 THEN m.sq2
                        WHEN 3 THEN m.sq3 WHEN 4 THEN m.sq4
                        ELSE m.sq5 END AS sq,
             CASE l.lag WHEN 1 THEN m.sqq1 WHEN 2 THEN m.sqq2
                        WHEN 3 THEN m.sqq3 WHEN 4 THEN m.sqq4
                        ELSE m.sqq5 END AS sqq,
             CASE l.lag WHEN 1 THEN m.sr1 WHEN 2 THEN m.sr2
                        WHEN 3 THEN m.sr3 WHEN 4 THEN m.sr4
                        ELSE m.sr5 END AS sr,
             CASE l.lag WHEN 1 THEN m.sqr1 WHEN 2 THEN m.sqr2
                        WHEN 3 THEN m.sqr3 WHEN 4 THEN m.sqr4
                        ELSE m.sqr5 END AS sqr
      FROM moms m CROSS JOIN lags l
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(lag AS BIGINT) AS lag_minutes,
           n,
           CASE WHEN n * sqq - sq * sq > 0 THEN
             ROUND(CAST(n * sqr - sq * sr AS DOUBLE)
                   / CAST(n * sqq - sq * sq AS DOUBLE) * 1e6, 9)
           END AS impact_slope_ppm
    FROM fanned WHERE n > 10 ORDER BY sym, lag_minutes
"""

register_sql(
    "x457_propagator_decay",
    spark_sql=_X457.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X457.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x458: purged walk-forward -----------------------------------------------------------

_X458 = """
    WITH per_day AS (
      -- collapse to (day, count) FIRST: the fold dim then crosses 30
      -- rows, not the event table, and the min-day anchor is a scalar
      -- agg instead of a global single-partition window
      SELECT {epoch} {intdiv} 86400 AS dkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY {epoch} {intdiv} 86400
    ),
    mind AS (SELECT MIN(dkey) AS d0 FROM per_day),
    days AS (
      SELECT p.dkey - m.d0 AS rel_day, p.cnt
      FROM per_day p CROSS JOIN mind m
    ),
    folds AS (
      SELECT 1 AS fold UNION ALL SELECT 2 UNION ALL SELECT 3
      UNION ALL SELECT 4 UNION ALL SELECT 5
    ),
    bounds AS (
      -- test block f covers days [18+2(f-1), 18+2f-1]; a 1-day label
      -- horizon plus a 1-day embargo purge train days > test_start - 3
      SELECT fold,
             18 + 2 * (fold - 1) AS test_start,
             18 + 2 * fold - 1 AS test_end,
             18 + 2 * (fold - 1) - 3 AS train_end
      FROM folds
    ),
    counted AS (
      SELECT b.fold, b.test_start, b.test_end, b.train_end,
             CAST(SUM(CASE WHEN d.rel_day <= b.train_end
                           THEN d.cnt ELSE 0 END) AS BIGINT) AS train_rows,
             CAST(SUM(CASE WHEN d.rel_day BETWEEN b.test_start AND b.test_end
                           THEN d.cnt ELSE 0 END) AS BIGINT) AS test_rows,
             CAST(SUM(CASE WHEN d.rel_day > b.train_end
                            AND d.rel_day < b.test_start
                           THEN d.cnt ELSE 0 END) AS BIGINT) AS purged_rows
      FROM bounds b CROSS JOIN days d
      GROUP BY b.fold, b.test_start, b.test_end, b.train_end
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(train_end + 1 AS BIGINT) AS train_days,
           CAST(test_start AS BIGINT) AS test_start_day,
           CAST(test_end AS BIGINT) AS test_end_day,
           train_rows, test_rows, purged_rows
    FROM counted ORDER BY fold
"""

register_sql(
    "x458_purged_walkforward",
    spark_sql=_X458.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X458.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "eval"),
)
