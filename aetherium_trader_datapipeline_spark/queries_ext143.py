"""Wave 143 (x497–x500): extreme values, layout sortedness, checkpoint
scheduling, and the closing portfolio closed form.

x497 — Gumbel fit on block maxima: per symbol, hourly-block maxima of
|returns| fitted by the method of moments (β = s√6/π, μ = m̄ − γβ with
Euler's γ) plus the implied 99th-percentile return — the EVT
block-maxima complement to x433's Hill tail index (threshold
exceedances).  Moments DECIMAL-exact over quantized block maxima.

x498 — sortedness profile: for each (table, column) pair that matters
to layout (events.ts in arrival order, lineitem keys in file order),
the adjacent-inversion share and monotone-run count — the statistic
that predicts x419's RLE payoff and whether a sort before write is
worth it.  One window pass per table, integer counts.

x499 — Young–Daly checkpoint interval: τ* = √(2·M·C) for MTBF
estimates derived from the observed error-event rate and checkpoint
costs {30, 120, 600} s; overhead percentage at the optimum alongside.
The streaming-job scheduling math for the reference's J1/H1
supervision loop.

x500 — minimum-variance two-asset portfolio for every symbol pair:
w* = (σ₂² − σ₁₂)/(σ₁² + σ₂² − 2σ₁₂) in closed form from the pair's
DECIMAL-exact return moments, with the variance reduction vs the
better single asset — the degenerate-but-exact case of Markowitz that
closes the allocation family (x364 VaR, x464 risk parity).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_RETS = """
    ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey,
             {epoch} {intdiv} 3600 AS hkey, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    lastpx AS (
      SELECT sym, mkey, hkey, px FROM (
        SELECT sym, mkey, hkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t WHERE rn = 1
    ),
    rets AS (
      SELECT sym, mkey, hkey,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)
                           / CAST(LAG(px) OVER (PARTITION BY sym
                                                ORDER BY mkey) AS DOUBLE))
                        * 1e9) AS BIGINT) AS r
      FROM lastpx
    )
"""

# -- x497: Gumbel block maxima -------------------------------------------------------------

_X497 = (
    "WITH " + _RETS + """,
    blocks AS (
      SELECT sym, hkey, CAST(MAX(ABS(r)) AS BIGINT) AS block_max
      FROM rets WHERE r IS NOT NULL GROUP BY sym, hkey
    ),
    moms AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(block_max AS DECIMAL(18,0))) AS DECIMAL(38,0))
               AS s1,
             CAST(SUM(CAST(block_max AS DECIMAL(18,0)) * block_max)
                  AS DECIMAL(38,0)) AS s2
      FROM blocks GROUP BY sym
    ),
    fitted AS (
      -- beta = s*sqrt(6)/pi ; mu = mean - 0.5772*beta (method of moments)
      SELECT sym, n,
             CAST(s1 AS DOUBLE) / n AS m1,
             SQRT(GREATEST(0.0, CAST(s2 AS DOUBLE) / n
                  - POWER(CAST(s1 AS DOUBLE) / n, 2)))
               * SQRT(6.0) / PI() AS beta
      FROM moms WHERE n > 10
    )
    SELECT CAST(sym AS BIGINT) AS sym, n AS n_blocks,
           ROUND(m1 / 1e9, 9) AS mean_block_max,
           ROUND(beta / 1e9, 9) AS gumbel_beta,
           ROUND((m1 - 0.5772156649 * beta) / 1e9, 9) AS gumbel_mu,
           -- 99th percentile: mu - beta*ln(-ln(0.99))
           ROUND((m1 - 0.5772156649 * beta
                  - beta * LN(-LN(0.99))) / 1e9, 9) AS p99_block_max
    FROM fitted ORDER BY sym
"""
)

register_sql(
    "x497_gumbel_block_maxima",
    spark_sql=_X497.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X497.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x498: sortedness profile -----------------------------------------------------------------

_X498 = """
    WITH ev_within AS (
      -- the x404 chunked-window pattern: adjacent comparisons inside
      -- event_id blocks run in parallel partitions (a global ORDER BY
      -- window would sort the whole table in ONE task); block
      -- boundaries are handed off through a |blocks|-row frame
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                           THEN 1 ELSE 0 END) AS BIGINT) AS inv_within
      FROM (
        SELECT ts, LAG(ts) OVER (PARTITION BY event_id {intdiv} 10000
                                 ORDER BY event_id) AS prev_ts
        FROM events
      ) s
    ),
    ev_blk AS (
      SELECT event_id {intdiv} 10000 AS blk,
             event_id {intdiv} 10000 {intdiv} 8192 AS ck2,
             {minby}(ts, event_id) AS first_ts,
             {maxby}(ts, event_id) AS last_ts
      FROM events GROUP BY event_id {intdiv} 10000
    ),
    ev_bin AS (
      -- TWO-LEVEL boundary handoff (r11): the flat block grid is
      -- |rows|/10^4 — linear through one task.  Level 1 compares
      -- adjacent blocks PARTITIONED by a super-block of 8192 blocks;
      -- level 2's global band sees only the |rows|/10^4/8192
      -- super-block grid.
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN prev_last IS NOT NULL
                            AND first_ts < prev_last
                           THEN 1 ELSE 0 END) AS BIGINT) AS inv_in
      FROM (
        SELECT first_ts,
               LAG(last_ts) OVER (PARTITION BY ck2 ORDER BY blk)
                 AS prev_last
        FROM ev_blk
      ) s
    ),
    ev_bx AS (
      SELECT COALESCE(CAST(SUM(CASE WHEN prev_l IS NOT NULL AND f < prev_l
                                    THEN 1 ELSE 0 END) AS BIGINT), 0)
               AS inv_x
      FROM (
        SELECT f, LAG(l) OVER (ORDER BY ck2) AS prev_l
        FROM (SELECT ck2, {minby}(first_ts, blk) AS f,
                     {maxby}(last_ts, blk) AS l
              FROM ev_blk GROUP BY ck2) k
      ) s
    ),
    ev_bounds AS (
      SELECT CAST(i.inv_in + x.inv_x AS BIGINT) AS inv_bound, i.n_blocks
      FROM ev_bin i CROSS JOIN ev_bx x
    ),
    li_within AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN prev_pk IS NOT NULL AND l_partkey < prev_pk
                           THEN 1 ELSE 0 END) AS BIGINT) AS inv_within
      FROM (
        SELECT l_partkey,
               -- (orderkey, linenumber) is NOT unique in the fixture;
               -- l_partkey breaks remaining ties (equal-partkey ties
               -- cannot change an inversion count)
               LAG(l_partkey) OVER (PARTITION BY l_orderkey {intdiv} 1000
                                    ORDER BY l_orderkey, l_linenumber,
                                             l_partkey)
                 AS prev_pk
        FROM lineitem
      ) s
    ),
    li_blk AS (
      SELECT l_orderkey {intdiv} 1000 AS blk,
             l_orderkey {intdiv} 1000 {intdiv} 8192 AS ck2,
             {minby}(l_partkey,
                     (l_orderkey * 100 + l_linenumber) * 10000000
                     + l_partkey) AS first_pk,
             {maxby}(l_partkey,
                     (l_orderkey * 100 + l_linenumber) * 10000000
                     + l_partkey) AS last_pk
      FROM lineitem GROUP BY l_orderkey {intdiv} 1000
    ),
    li_bin AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN prev_last IS NOT NULL
                            AND first_pk < prev_last
                           THEN 1 ELSE 0 END) AS BIGINT) AS inv_in
      FROM (
        SELECT first_pk,
               LAG(last_pk) OVER (PARTITION BY ck2 ORDER BY blk)
                 AS prev_last
        FROM li_blk
      ) s
    ),
    li_bx AS (
      SELECT COALESCE(CAST(SUM(CASE WHEN prev_l IS NOT NULL AND f < prev_l
                                    THEN 1 ELSE 0 END) AS BIGINT), 0)
               AS inv_x
      FROM (
        SELECT f, LAG(l) OVER (ORDER BY ck2) AS prev_l
        FROM (SELECT ck2, {minby}(first_pk, blk) AS f,
                     {maxby}(last_pk, blk) AS l
              FROM li_blk GROUP BY ck2) k
      ) s
    ),
    li_bounds AS (
      SELECT CAST(i.inv_in + x.inv_x AS BIGINT) AS inv_bound, i.n_blocks
      FROM li_bin i CROSS JOIN li_bx x
    )
    SELECT 'events_ts_by_arrival' AS layout, w.n AS n_rows,
           CAST(w.inv_within + b.inv_bound AS BIGINT) AS inversions,
           CAST(w.inv_within + b.inv_bound + 1 AS BIGINT) AS monotone_runs,
           ROUND(CAST(w.inv_within + b.inv_bound AS DOUBLE) / (w.n - 1), 6)
             AS adjacent_inversion_share
    FROM ev_within w CROSS JOIN ev_bounds b
    UNION ALL
    SELECT 'lineitem_partkey_by_file_order', w.n,
           CAST(w.inv_within + b.inv_bound AS BIGINT),
           CAST(w.inv_within + b.inv_bound + 1 AS BIGINT),
           ROUND(CAST(w.inv_within + b.inv_bound AS DOUBLE) / (w.n - 1), 6)
    FROM li_within w CROSS JOIN li_bounds b
    ORDER BY layout
"""

register_sql(
    "x498_sortedness_profile",
    spark_sql=_X498.format(intdiv="DIV", minby="min_by", maxby="max_by"),
    duckdb_sql=_X498.format(intdiv="//", minby="arg_min", maxby="arg_max"),
    tags=("storage", "profiling"),
)

# -- x499: Young-Daly checkpoint interval --------------------------------------------------------

_X499 = """
    WITH failures AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_errors,
             CAST(MAX({epoch}) - MIN({epoch}) AS BIGINT) AS span_s
      FROM events WHERE event_type = 'error'
    ),
    costs AS (
      SELECT CAST(30 AS BIGINT) AS c UNION ALL SELECT 120
      UNION ALL SELECT 600
    )
    SELECT c.c AS checkpoint_cost_s,
           f.n_errors,
           CAST(f.span_s {intdiv} f.n_errors AS BIGINT) AS mtbf_s,
           -- tau* = sqrt(2*M*C) (Young/Daly first-order optimum)
           CAST(FLOOR(SQRT(2.0 * (f.span_s {intdiv} f.n_errors) * c.c))
                AS BIGINT) AS optimal_interval_s,
           -- overhead at the optimum ~ sqrt(2C/M)
           ROUND(SQRT(2.0 * c.c / (f.span_s {intdiv} f.n_errors)), 6)
             AS overhead_share
    FROM failures f CROSS JOIN costs c
    ORDER BY checkpoint_cost_s
"""

register_sql(
    "x499_checkpoint_interval",
    spark_sql=_X499.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X499.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("planning", "streaming"),
)

# -- x500: minimum-variance pair ------------------------------------------------------------------

_X500 = (
    "WITH " + _RETS + """,
    aligned AS (
      SELECT a.sym AS sa, b.sym AS sb, a.r AS ra, b.r AS rb
      FROM rets a JOIN rets b
        ON a.mkey = b.mkey AND a.sym < b.sym
      WHERE a.r IS NOT NULL AND b.r IS NOT NULL
    ),
    moms AS (
      SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ra AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(rb AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(CAST(ra AS DECIMAL(18,0)) * ra) AS DECIMAL(38,0))
               AS s11,
             CAST(SUM(CAST(rb AS DECIMAL(18,0)) * rb) AS DECIMAL(38,0))
               AS s22,
             CAST(SUM(CAST(ra AS DECIMAL(18,0)) * rb) AS DECIMAL(38,0))
               AS s12
      FROM aligned GROUP BY sa, sb
    ),
    cov AS (
      SELECT sa, sb, n,
             CAST(n * s11 - s1 * s1 AS DOUBLE) / n / n AS v1,
             CAST(n * s22 - s2 * s2 AS DOUBLE) / n / n AS v2,
             CAST(n * s12 - s1 * s2 AS DOUBLE) / n / n AS c12
      FROM moms WHERE n > 30
    )
    SELECT CAST(sa AS BIGINT) AS sym_a, CAST(sb AS BIGINT) AS sym_b, n,
           CASE WHEN v1 + v2 - 2 * c12 > 0 THEN
             ROUND((v2 - c12) / (v1 + v2 - 2 * c12), 6)
           END AS weight_on_a,
           CASE WHEN v1 + v2 - 2 * c12 > 0 THEN
             ROUND((v1 * v2 - c12 * c12) / (v1 + v2 - 2 * c12) / 1e18, 12)
           END AS min_portfolio_var,
           CASE WHEN v1 + v2 - 2 * c12 > 0 THEN
             ROUND(1 - ((v1 * v2 - c12 * c12) / (v1 + v2 - 2 * c12))
                       / LEAST(v1, v2), 6)
           END AS var_reduction_vs_best_single
    FROM cov ORDER BY sym_a, sym_b
"""
)

register_sql(
    "x500_min_variance_pair",
    spark_sql=_X500.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X500.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "planning"),
)
