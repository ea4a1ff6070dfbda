"""Wave 91 (x357–x359): weighted median, A/B proportions, MASE.

x357 — exact WEIGHTED median (and p90) of order totalprice per
priority, weighted by quantity-proportional lineitem weights: the
smallest value whose cumulative weight reaches half the total.  Plain
medians answer "the typical ORDER"; weighted medians answer "the
typical DOLLAR/UNIT" — the distinction that matters whenever rows are
not the unit of interest.  One sort per group with a running weight
sum; the selection is the first row crossing the threshold
(deterministic tiebreak on value), all weights exact integers.

x358 — the two-proportion z-test on a deterministically hash-split
experiment (event_id parity → arms A/B; outcome = value > 0): lift,
pooled standard error, z — the primitive behind every experimentation
dashboard.  Counts exact; z is a handful of per-row IEEE ops on four
scalars.  The null split here SHOULD read |z| < 2 — the calibration
run an experimenter does before trusting the pipeline with a real
treatment (x320's convention: ship the instrument with its zero
reading).

x359 — MASE (mean absolute scaled error, Hyndman & Koehler): the
scale-free forecast metric that compares a model against the naive
one-step forecast ON THE SAME SERIES.  Here the "model" is the
seasonal-naive weekly forecast (close of 7 days ago) scaled by the
in-sample naive-1 MAE — MASE < 1 beats naive.  Both error families
ride ONE per-sym daily sort (two LAGs); per-day absolute errors are
quantized to integer micro-units before the cross-day means (the x321
discipline).  Completes the eval family: classification (x221/x223),
ranking (x313), regression (x319), calibration (x311) — and now
forecasting.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x357: weighted median / p90 -----------------------------------------------

_X357 = """
    WITH weighted AS (
      SELECT o.o_orderpriority AS prio,
             CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS v,
             CAST(SUM(CAST(ROUND(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderpriority, o.o_orderkey, o.o_totalprice
    ),
    cum AS (
      SELECT prio, v, w,
             SUM(w) OVER (PARTITION BY prio ORDER BY v, w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY prio) AS tw
      FROM weighted
    )
    SELECT prio,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN cw * 2 >= tw THEN v END) AS BIGINT)
             AS weighted_median_cents,
           CAST(MIN(CASE WHEN cw * 10 >= tw * 9 THEN v END) AS BIGINT)
             AS weighted_p90_cents
    FROM cum GROUP BY prio ORDER BY prio
"""

register_sql(
    "x357_weighted_median",
    spark_sql=_X357,
    duckdb_sql=_X357,
    tags=("stats", "window"),
)

# -- x358: two-proportion z-test -----------------------------------------------

_X358 = """
    WITH arms AS (
      -- outcome = fractional part above 0.5 (~50% base rate). value > 0
      -- was degenerate here (always true => pooled variance 0 => the z
      -- denominator divides by zero under ANSI mode).
      SELECT CASE WHEN event_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN value - FLOOR(value) > 0.5 THEN 1 ELSE 0 END AS conv
      FROM events WHERE value IS NOT NULL
    ),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS c_b
      FROM arms
    )
    SELECT n_a, c_a, n_b, c_b,
           ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS p_a,
           ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS p_b,
           ROUND(CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a, 6)
             AS abs_lift,
           ROUND((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                 / SQRT((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)),
                 4) AS z_score
    FROM agg
"""

register_sql(
    "x358_ab_proportions",
    spark_sql=_X358,
    duckdb_sql=_X358,
    tags=("stats", "audit"),
)

# -- x359: MASE for the seasonal-naive weekly forecast -------------------------

_X359_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, d, {close_px} AS close_px
      FROM ticks GROUP BY sym, d
    ),
    lagged AS (
      SELECT sym, d, close_px,
             LAG(close_px, 1) OVER (PARTITION BY sym ORDER BY d) AS prev1,
             LAG(close_px, 7) OVER (PARTITION BY sym ORDER BY d) AS prev7
      FROM daily
    ),
    errs AS (
      SELECT sym,
             CASE WHEN prev7 IS NOT NULL THEN
               CAST(FLOOR(ABS(CAST(close_px AS DOUBLE) - CAST(prev7 AS DOUBLE))
                          * 1e6) AS BIGINT) END AS e7_micro,
             CASE WHEN prev1 IS NOT NULL THEN
               CAST(FLOOR(ABS(CAST(close_px AS DOUBLE) - CAST(prev1 AS DOUBLE))
                          * 1e6) AS BIGINT) END AS e1_micro
      FROM lagged
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(e7_micro) AS BIGINT) AS n_forecasts,
           ROUND(CAST(CAST(SUM(CAST(e7_micro AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(e7_micro) / 1e6, 6) AS mae_weekly,
           ROUND(CAST(CAST(SUM(CAST(e1_micro AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(e1_micro) / 1e6, 6) AS mae_naive1,
           ROUND((CAST(CAST(SUM(CAST(e7_micro AS DECIMAL(18,0))) AS DECIMAL(38,0))
                       AS DOUBLE) / COUNT(e7_micro))
                 / (CAST(CAST(SUM(CAST(e1_micro AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS DOUBLE) / COUNT(e1_micro)), 4) AS mase
    FROM errs GROUP BY sym ORDER BY sym
"""

register_sql(
    "x359_mase_forecast",
    spark_sql=_X359_FMT.format(
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))"
    ),
    duckdb_sql=_X359_FMT.format(
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))"
    ),
    tags=("finance", "stats"),
)
