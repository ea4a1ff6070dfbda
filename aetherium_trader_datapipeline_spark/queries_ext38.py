"""Thirty-eighth extension wave — monitoring statistics and experiment
analytics:

x216 weighted median   exact per-group weighted (lower) median via the
                       cumulative-weight crossing, all integer
x217 cusum             two-sided integer CUSUM changepoint alarms per
                       instrument (operators/timeseries.cusum_flags) —
                       recursive-CTE oracle replays the identical int64
                       fold with the same hi-before-lo alarm precedence
x218 ab test           two-proportion z-test (variant = user parity;
                       conversion = any purchase) — integer counts, one
                       closed-form double, floored micro-units
x219 km table          Kaplan-Meier risk table of time-to-first-purchase
                       (censoring at last observed event) — all integers;
                       the estimator is derivable without float products
x220 benford           first-significant-digit distribution vs Benford
                       expectation with floored-micro chi-square terms

Scale shapes: all are one or two hash exchanges on their natural keys;
x217 is the sequential-fold shape (key count parallelizes); x219 reduces
to |distinct days| rows before its window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x216: weighted median ---------------------------------------------------
# Weight = 1 + event_id % 3 (the x213 qty synthesis). Lower weighted
# median: smallest value whose cumulative weight doubles to >= total.

_X216_BODY = """
    WITH v AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(1 + event_id % 3 AS BIGINT) AS w
      FROM events
    ),
    g AS (
      SELECT event_type, cents, SUM(w) AS w
      FROM v GROUP BY event_type, cents
    ),
    c AS (
      SELECT event_type, cents, w,
             SUM(w) OVER (PARTITION BY event_type ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY event_type) AS tw
      FROM g
    )
    SELECT event_type, MIN(cents) AS wmedian_cents
    FROM c WHERE 2 * cw >= tw
    GROUP BY event_type ORDER BY event_type
"""

register_sql(
    "x216_weighted_median",
    spark_sql=_X216_BODY,
    duckdb_sql=_X216_BODY,
    tags=("stats", "window"),
)

# -- x217: integer CUSUM changepoint alarms ---------------------------------

_CUSUM_K = 2000  # slack, cents
_CUSUM_H = 4000  # alarm threshold, cents

_X217_ORACLE = f"""
    WITH RECURSIVE src AS (
      SELECT user_id, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS x,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    rec AS (
      SELECT user_id, event_id, rn, x AS target,
             CAST(0 AS BIGINT) AS s_hi, CAST(0 AS BIGINT) AS s_lo,
             CAST(NULL AS VARCHAR) AS direction
      FROM src WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, r.target,
             CASE WHEN GREATEST(0, r.s_hi + (s.x - r.target - {_CUSUM_K})) > {_CUSUM_H}
                  THEN 0 ELSE GREATEST(0, r.s_hi + (s.x - r.target - {_CUSUM_K})) END,
             CASE WHEN GREATEST(0, r.s_hi + (s.x - r.target - {_CUSUM_K})) > {_CUSUM_H}
                  THEN GREATEST(0, r.s_lo + (r.target - s.x - {_CUSUM_K}))
                  WHEN GREATEST(0, r.s_lo + (r.target - s.x - {_CUSUM_K})) > {_CUSUM_H}
                  THEN 0 ELSE GREATEST(0, r.s_lo + (r.target - s.x - {_CUSUM_K})) END,
             CASE WHEN GREATEST(0, r.s_hi + (s.x - r.target - {_CUSUM_K})) > {_CUSUM_H} THEN 'hi'
                  WHEN GREATEST(0, r.s_lo + (r.target - s.x - {_CUSUM_K})) > {_CUSUM_H} THEN 'lo'
                  END
      FROM src s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, direction
    FROM rec WHERE direction IS NOT NULL
    ORDER BY user_id, event_id LIMIT 500
"""


@register(
    "x217_cusum",
    oracle=_X217_ORACLE,
    tags=("monitoring", "pandas", "stateful"),
)
def x217_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alarm rows from the integer CUSUM fold (first value = target)."""
    from aetherium_trader_datapipeline_spark.operators.timeseries import cusum_flags

    t = load_tables(spark, sf_dir)
    src = t["events"].select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    out = cusum_flags(
        src,
        ["user_id"],
        ["ts", "event_id"],
        "cents",
        out_cols=["user_id", "event_id"],
        k=_CUSUM_K,
        h=_CUSUM_H,
    )
    return out.orderBy("user_id", "event_id").limit(500)


# -- x218: two-proportion z-test --------------------------------------------
# Explicit parenthesization keeps the double op order identical on both
# engines; counts are exact; one row out.

_X218_BODY = """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS c
      FROM u GROUP BY variant
    ),
    w AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
             MAX(CASE WHEN variant = 0 THEN c END) AS c0,
             MAX(CASE WHEN variant = 1 THEN n END) AS n1,
             MAX(CASE WHEN variant = 1 THEN c END) AS c1
      FROM v
    )
    SELECT n0, c0, n1, c1,
           CAST(FLOOR(1e6 * (((CAST(c0 AS DOUBLE) / n0) - (CAST(c1 AS DOUBLE) / n1))
                 / NULLIF(SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - (CAST(c0 + c1 AS DOUBLE) / (n0 + n1)))
                        * ((1.0 / n0) + (1.0 / n1))), 0.0))) AS BIGINT) AS z_micro
    FROM w
"""

register_sql(
    "x218_ab_test",
    spark_sql=_X218_BODY,
    duckdb_sql=_X218_BODY,
    tags=("stats", "experiment"),
)

# -- x219: Kaplan-Meier risk table ------------------------------------------
# Event = first purchase (days since the user's first event); censor =
# last observed event for never-purchasers. The risk table (t, n_risk,
# n_event, n_censor) is all integers; n_risk at t is total minus everyone
# who exited strictly before t.

_X219_FMT = """
    WITH spanu AS (
      SELECT user_id,
             MIN(ts) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             MAX(ts) AS tl
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT user_id,
             CASE WHEN tp IS NOT NULL THEN {d_tp} ELSE {d_tl} END AS t,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM spanu
    ),
    byt AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS n_event,
             CAST(SUM(1 - ev) AS BIGINT) AS n_censor
      FROM obs GROUP BY t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs)
    SELECT b.t,
           CAST(tot.n - COALESCE(SUM(b.n_event + b.n_censor) OVER (
                 ORDER BY b.t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS n_risk,
           b.n_event, b.n_censor
    FROM byt b CROSS JOIN tot
    ORDER BY b.t
"""

register_sql(
    "x219_km_table",
    spark_sql=_X219_FMT.format(
        d_tp="CAST(DATEDIFF(CAST(tp AS DATE), CAST(t0 AS DATE)) AS BIGINT)",
        d_tl="CAST(DATEDIFF(CAST(tl AS DATE), CAST(t0 AS DATE)) AS BIGINT)",
    ),
    duckdb_sql=_X219_FMT.format(
        d_tp="CAST(datediff('day', CAST(t0 AS DATE), CAST(tp AS DATE)) AS BIGINT)",
        d_tl="CAST(datediff('day', CAST(t0 AS DATE), CAST(tl AS DATE)) AS BIGINT)",
    ),
    tags=("stats", "survival"),
)

# -- x220: Benford first-digit audit ----------------------------------------
# First significant digit of the cents value (value > 0); expected share
# log10(1 + 1/d). Chi-square contribution per digit in floored micro.

_X220_BODY = """
    WITH v AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value > 0
    ),
    d AS (
      SELECT CAST(SUBSTRING(CAST(cents AS STRING), 1, 1) AS BIGINT) AS digit
      FROM v WHERE cents > 0
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           CAST(FLOOR(1e6 * LOG10(1.0 + (1.0 / c.digit))) AS BIGINT) AS expected_micro,
           CAST(FLOOR(1e6 * (((CAST(c.n AS DOUBLE) / t.total)
                              - LOG10(1.0 + (1.0 / c.digit)))
                             * ((CAST(c.n AS DOUBLE) / t.total)
                                - LOG10(1.0 + (1.0 / c.digit)))
                             / LOG10(1.0 + (1.0 / c.digit)))) AS BIGINT) AS chi2_term_micro
    FROM c CROSS JOIN t
    ORDER BY c.digit
"""

_X220_DUCK = _X220_BODY.replace("CAST(cents AS STRING)", "CAST(cents AS VARCHAR)")

register_sql(
    "x220_benford",
    spark_sql=_X220_BODY,
    duckdb_sql=_X220_DUCK,
    tags=("quality", "stats"),
)
