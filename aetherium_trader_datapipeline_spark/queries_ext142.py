"""Wave 142 (x494–x496): auction, inventory, and AUC inference.

x494 — reserve-price sweep: each (sym, minute) is an auction whose
bids are the events' |value| prices; second-price revenue at reserve r
is max(second_bid, r) when the top bid clears r, else 0.  Five
candidate reserves are swept over the once-collapsed top-2-per-auction
frame (never the raw bid stream), all in integer micro-units — the
empirical Myerson search a marketplace actually runs.

x495 — newsvendor stocking: with underage cost 3 and overage cost 1
the critical fractile is 0.75; the optimal stock is the exact
0.75-order-statistic of daily purchase demand per symbol, and the
realized expected cost at that stock (and at mean-demand stock, the
naive policy) is measured from the same history — the cost gap is the
newsvendor lesson.  Pure integer order statistics and cost sums.

x496 — DeLong standard error for AUC: the x221 classifier surface gets
its inference: per-positive V10 (share of negatives scored below) and
per-negative V01 come straight from rank windows as exact integer
counts; Var(AUC) = S10/(m(m−1)·n²·scale) + ... — the DeLong structural
components are integer sums, the final SE one IEEE expression.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x494: reserve-price sweep ------------------------------------------------------------

_X494 = """
    WITH bids AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey,
             CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS bid
      FROM events WHERE value IS NOT NULL
    ),
    top2 AS (
      SELECT sym, mkey,
             MAX(CASE WHEN rk = 1 THEN bid END) AS b1,
             MAX(CASE WHEN rk = 2 THEN bid END) AS b2
      FROM (
        SELECT sym, mkey, bid,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY bid DESC) AS rk
        FROM bids
      ) r WHERE rk <= 2
      GROUP BY sym, mkey
    ),
    reserves AS (
      SELECT CAST(1000000 AS BIGINT) AS r UNION ALL SELECT 2000000
      UNION ALL SELECT 4000000 UNION ALL SELECT 6000000
      UNION ALL SELECT 8000000
    ),
    swept AS (
      SELECT rv.r,
             CAST(COUNT(*) AS BIGINT) AS n_auctions,
             CAST(SUM(CASE WHEN t.b1 >= rv.r THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cleared,
             CAST(SUM(CASE WHEN t.b1 >= rv.r
                           THEN GREATEST(COALESCE(t.b2, 0), rv.r)
                           ELSE 0 END) AS BIGINT) AS revenue_fp
      FROM top2 t CROSS JOIN reserves rv
      GROUP BY rv.r
    )
    SELECT ROUND(CAST(r AS DOUBLE) / 1e6, 2) AS reserve,
           n_auctions, n_cleared,
           ROUND(CAST(revenue_fp AS DOUBLE) / 1e6, 2) AS total_revenue,
           CASE WHEN revenue_fp = MAX(revenue_fp) OVER () THEN 1 ELSE 0 END
             AS is_optimal
    FROM swept ORDER BY reserve
"""

register_sql(
    "x494_reserve_price_sweep",
    spark_sql=_X494.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X494.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("marketplace", "planning"),
)

# -- x495: newsvendor ------------------------------------------------------------------------

_X495 = """
    WITH demand AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 86400 AS dkey,
             CAST(COUNT(*) AS BIGINT) AS d
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id % 10, {epoch} {intdiv} 86400
    ),
    ranked AS (
      SELECT sym, d,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY d, dkey) AS rk,
             COUNT(*) OVER (PARTITION BY sym) AS n,
             CAST(SUM(d) OVER (PARTITION BY sym) AS BIGINT) AS sd
      FROM demand
    ),
    stock AS (
      -- critical fractile cf/(cf+co) = 3/(3+1) = 0.75 -> exact order stat
      SELECT sym, d AS q_opt, n, sd
      FROM ranked WHERE rk = (3 * n + 3) {intdiv} 4
    ),
    costs AS (
      SELECT r.sym, s.q_opt, s.n,
             CAST(s.sd {intdiv} s.n AS BIGINT) AS q_naive,
             -- cost at optimal stock: 3*underage + 1*overage
             CAST(SUM(3 * GREATEST(r.d - s.q_opt, 0)
                      + GREATEST(s.q_opt - r.d, 0)) AS BIGINT) AS cost_opt,
             CAST(SUM(3 * GREATEST(r.d - s.sd {intdiv} s.n, 0)
                      + GREATEST(s.sd {intdiv} s.n - r.d, 0)) AS BIGINT)
               AS cost_naive
      FROM ranked r JOIN stock s ON r.sym = s.sym
      GROUP BY r.sym, s.q_opt, s.n, s.sd
    )
    SELECT CAST(sym AS BIGINT) AS sym, n AS n_days,
           q_opt AS stock_critical_fractile,
           q_naive AS stock_mean_demand,
           cost_opt, cost_naive,
           ROUND(CAST(cost_naive - cost_opt AS DOUBLE)
                 / GREATEST(cost_naive, 1), 6) AS cost_saving_share
    FROM costs ORDER BY sym
"""

register_sql(
    "x495_newsvendor",
    spark_sql=_X495.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X495.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("planning", "stats"),
)

# -- x496: DeLong AUC variance -----------------------------------------------------------------

_X496 = """
    WITH scored AS (
      -- score = fractional value; label = purchase
      SELECT CAST(FLOOR((value - FLOOR(value)) * 1e6) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    grouped AS (
      -- collapse to per-score cells so the tie arithmetic is exact
      SELECT s,
             CAST(SUM(y) AS BIGINT) AS pos_here,
             CAST(SUM(1 - y) AS BIGINT) AS neg_here
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s, pos_here, neg_here,
             SUM(neg_here) OVER (ORDER BY s) - neg_here AS neg_below,
             SUM(pos_here) OVER (ORDER BY s) - pos_here AS pos_below,
             SUM(pos_here) OVER () AS m,
             SUM(neg_here) OVER () AS n
      FROM grouped
    ),
    comps AS (
      -- doubled structural components: 2*V10 per positive at this score
      -- = 2*neg_below + neg_here (ties count half); symmetric for V01
      SELECT m, n,
             pos_here, neg_here, pos_below,
             2 * neg_below + neg_here AS v10_x2
      FROM cum
    ),
    moms AS (
      SELECT CAST(MAX(m) AS BIGINT) AS m, CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(pos_here * v10_x2) AS BIGINT) AS s10,
             CAST(SUM(CAST(pos_here AS DECIMAL(18,0)) * v10_x2 * v10_x2)
                  AS DECIMAL(38,0)) AS s10_sq,
             CAST(SUM(neg_here * ((2 * (m - pos_below - pos_here))
                                  + pos_here)) AS BIGINT) AS s01,
             CAST(SUM(CAST(neg_here AS DECIMAL(18,0))
                      * ((2 * (m - pos_below - pos_here)) + pos_here)
                      * ((2 * (m - pos_below - pos_here)) + pos_here))
                  AS DECIMAL(38,0)) AS s01_sq
      FROM comps
    )
    SELECT m AS n_pos, n AS n_neg,
           ROUND(CAST(s10 AS DOUBLE) / (2.0 * m * n), 6) AS auc,
           ROUND(SQRT(GREATEST(0.0,
             (CAST(s10_sq AS DOUBLE) / m / (4.0 * n * n)
              - POWER(CAST(s10 AS DOUBLE) / (2.0 * m * n), 2)) / (m - 1)
             + (CAST(s01_sq AS DOUBLE) / n / (4.0 * m * m)
                - POWER(CAST(s01 AS DOUBLE) / (2.0 * m * n), 2)) / (n - 1)
           )), 9) AS delong_se
    FROM moms
"""

register_sql(
    "x496_auc_delong",
    spark_sql=_X496,
    duckdb_sql=_X496,
    tags=("eval", "stats"),
)
