"""Wave 119 (x430–x432): attribution game theory, quantile-forecast
scoring, and the second rank-correlation.

x430 — Shapley-value channel attribution: for the all-or-nothing
conversion game (a coalition converts iff the user converted), the
Shapley value collapses to 1/|S_u| per channel present in the user's
pre-purchase channel set S_u.  With ≤4 channels, contributions are
exact twelfths (LCM of 1..4), so the per-channel totals are integer
counts of 1/12 units — no float credit splitting.  Completes the
attribution family: last-touch (x209), linear (x243), DiD lift (x264).

x431 — pinball (quantile) loss: per symbol, the q∈{0.1,0.5,0.9} order
statistics of even-day minute returns forecast the odd-day returns.
The selected quantile is a value at a global rank (tie-permutation
invariant), and with decile q's the loss (y−f)·q / (f−y)·(1−q) is an
exact integer in tenths of a 1e9-quantized return.  The eval-side
complement of x359's MASE.

x432 — Kendall τ-b between daily dollar volume and daily |return| per
symbol: concordant/discordant/tie counts are exact integers from a
within-symbol day-pair self-join (30 days → 435 pairs per symbol —
bounded, never |ticks|²); τ-b with tie corrections is one IEEE
expression.  Pairs with x421's Spearman ρ (same relation, different
estimator).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x430: Shapley attribution ----------------------------------------------------

_X430 = """
    WITH first_purchase AS (
      SELECT user_id, MIN(ts) AS pts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    channel_sets AS (
      SELECT e.user_id, e.event_type AS channel
      FROM events e JOIN first_purchase p ON e.user_id = p.user_id
      WHERE e.ts < p.pts AND e.event_type != 'purchase'
      GROUP BY e.user_id, e.event_type
    ),
    sized AS (
      SELECT user_id, channel,
             COUNT(*) OVER (PARTITION BY user_id) AS set_size
      FROM channel_sets
    ),
    credit AS (
      -- 12 {intdiv} set_size is exact for set_size in 1..4
      SELECT channel,
             CAST(COUNT(*) AS BIGINT) AS users_present,
             CAST(SUM(12 {intdiv} set_size) AS BIGINT) AS shapley_12
      FROM sized GROUP BY channel
    )
    SELECT channel, users_present,
           shapley_12,
           ROUND(CAST(shapley_12 AS DOUBLE) / 12, 6) AS shapley_conversions,
           ROUND(CAST(shapley_12 AS DOUBLE) / SUM(shapley_12) OVER (), 6)
             AS credit_share
    FROM credit ORDER BY channel
"""

register_sql(
    "x430_shapley_attribution",
    spark_sql=_X430.format(intdiv="DIV"),
    duckdb_sql=_X430.format(intdiv="//"),
    tags=("attribution", "events"),
)

# -- x431: pinball loss ------------------------------------------------------------

_X431 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey,
             ({epoch} {intdiv} 86400) % 2 AS is_test, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    lastpx AS (
      SELECT sym, mkey, is_test, px FROM (
        SELECT sym, mkey, is_test, px,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t WHERE rn = 1
    ),
    rets AS (
      SELECT sym, is_test,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)
                           / CAST(LAG(px) OVER (PARTITION BY sym
                                                ORDER BY mkey) AS DOUBLE))
                        * 1e9) AS BIGINT) AS r_fp
      FROM lastpx
    ),
    train AS (
      SELECT sym, r_fp,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY r_fp) AS rn,
             COUNT(*) OVER (PARTITION BY sym) AS n
      FROM rets WHERE r_fp IS NOT NULL AND is_test = 0
    ),
    qdim AS (SELECT 1 AS qn UNION ALL SELECT 5 UNION ALL SELECT 9),
    forecasts AS (
      SELECT t.sym, q.qn, t.r_fp AS f_fp
      FROM train t JOIN qdim q
        ON t.rn = (q.qn * t.n + 9) {intdiv} 10
    ),
    losses AS (
      SELECT f.sym, f.qn,
             CASE WHEN r.r_fp >= f.f_fp
                  THEN (r.r_fp - f.f_fp) * f.qn
                  ELSE (f.f_fp - r.r_fp) * (10 - f.qn) END AS loss_fp
      FROM rets r JOIN forecasts f ON r.sym = f.sym
      WHERE r.r_fp IS NOT NULL AND r.is_test = 1
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(qn AS BIGINT) AS q_decile,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(CAST(SUM(loss_fp) AS DOUBLE) / COUNT(*) / 10 / 1e9, 9)
             AS mean_pinball_loss
    FROM losses GROUP BY sym, qn ORDER BY sym, q_decile
"""

register_sql(
    "x431_pinball_loss",
    spark_sql=_X431.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X431.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("eval", "finance"),
)

# -- x432: Kendall tau-b -----------------------------------------------------------

_X432 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 86400 AS dkey, ts, event_id,
             CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, dkey,
             CAST(SUM(vol_fp) AS BIGINT) AS x,
             CAST(ABS(MAX(px) - MIN(px)) AS DECIMAL(18,6)) AS y
      FROM ticks GROUP BY sym, dkey
    ),
    pairs AS (
      SELECT a.sym,
             CASE WHEN (a.x - b.x) * (CASE WHEN a.y > b.y THEN 1
                                           WHEN a.y < b.y THEN -1
                                           ELSE 0 END) > 0
                  THEN 1 ELSE 0 END AS c,
             CASE WHEN (a.x - b.x) * (CASE WHEN a.y > b.y THEN 1
                                           WHEN a.y < b.y THEN -1
                                           ELSE 0 END) < 0
                  THEN 1 ELSE 0 END AS d,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b
        ON a.sym = b.sym AND a.dkey < b.dkey
    ),
    counts AS (
      SELECT sym,
             CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(c) AS BIGINT) AS nc,
             CAST(SUM(d) AS BIGINT) AS nd,
             CAST(SUM(tx) AS BIGINT) AS n1,
             CAST(SUM(ty) AS BIGINT) AS n2
      FROM pairs GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n0, nc AS concordant, nd AS discordant,
           CASE WHEN n0 > n1 AND n0 > n2 THEN
             ROUND(CAST(nc - nd AS DOUBLE)
                   / SQRT(CAST(n0 - n1 AS DOUBLE) * (n0 - n2)), 6)
           END AS kendall_tau_b
    FROM counts ORDER BY sym
"""

register_sql(
    "x432_kendall_tau",
    spark_sql=_X432.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X432.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("stats", "finance"),
)
