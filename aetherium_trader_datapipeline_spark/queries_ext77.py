"""Wave 77 (x316–x317): price impact and the payoff of volume bars.

x316 is Kyle's lambda — the canonical price-impact coefficient: per
(symbol, minute) aggregate the signed order flow (x315's tick-rule signs
× volume) and the price change, then per symbol regress Δp on signed
flow with exact-DECIMAL normal equations (x101's convention).  λ is what
an execution-cost model calibrates per instrument.

x317 is the statistical argument FOR x314's volume bars (López de Prado
ch. 2): per-bar returns under volume sampling are closer to IID Gaussian
than under time sampling.  Both bar families are built in one query,
returns quantized to integer fixed-point (floor((close/open − 1)·10⁶) —
engine-identical), and per bar-type the moment sums Σr, Σr², Σr⁴
accumulate in wide DECIMAL (exact), yielding variance and excess
kurtosis deterministically.  The expected reading: |kurtosis_volume| <
|kurtosis_time|.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_TICKS = """
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
"""

# -- x316: Kyle's lambda ------------------------------------------------------

_X316_FMT = """
    WITH ticks AS ({ticks}),
    signed AS (
      SELECT sym, ts, event_id, vol, px,
             {last_nonzero} AS s
      FROM (
        SELECT sym, ts, event_id, vol, px,
               CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE NULL END AS s0
        FROM (
          SELECT sym, ts, event_id, vol, px,
                 px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) AS d
          FROM ticks
        ) dd
      ) rs
    ),
    minutes AS (
      SELECT sym, date_trunc('minute', ts) AS m,
             CAST(SUM(COALESCE(s, 0) * vol) AS DECIMAL(28,6)) AS sflow,
             CAST({last_px} - {first_px} AS DECIMAL(18,6)) AS dpx
      FROM signed GROUP BY sym, date_trunc('minute', ts)
    ),
    sums AS (
      SELECT sym,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(sflow) AS DECIMAL(38,6)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(dpx) AS DECIMAL(38,6)) AS DOUBLE) AS sy,
             CAST(CAST(SUM(sflow * sflow) AS DECIMAL(38,12)) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(sflow * dpx) AS DECIMAL(38,12)) AS DOUBLE) AS sxy
      FROM minutes GROUP BY sym
    )
    SELECT sym, CAST(n AS BIGINT) AS n_minutes,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000, 4)
             AS lambda_e6,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM sums ORDER BY sym
"""

_LAST_NONZERO_SPARK = (
    "last_value(s0, true) OVER (PARTITION BY sym ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_LAST_NONZERO_DUCK = (
    "last_value(s0 IGNORE NULLS) OVER (PARTITION BY sym ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)

register_sql(
    "x316_kyle_lambda",
    spark_sql=_X316_FMT.format(
        ticks=_TICKS,
        last_nonzero=_LAST_NONZERO_SPARK,
        first_px="min_by(px, struct(ts, event_id))",
        last_px="max_by(px, struct(ts, event_id))",
    ),
    duckdb_sql=_X316_FMT.format(
        ticks=_TICKS,
        last_nonzero=_LAST_NONZERO_DUCK,
        first_px="first(px ORDER BY ts, event_id)",
        last_px="last(px ORDER BY ts, event_id)",
    ),
    tags=("finance", "stats"),
)

# -- x317: time bars vs volume bars, return moments ---------------------------

_X317_FMT = """
    WITH ticks AS ({ticks}),
    vcum AS (
      SELECT sym, ts, event_id, px,
             COALESCE(SUM(vol) OVER (
               PARTITION BY sym ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), CAST(0 AS DECIMAL(18,6))) AS pvol
      FROM ticks
    ),
    tagged AS (
      SELECT 'time' AS bar_type, sym,
             CAST(date_trunc('hour', ts) AS VARCHAR) AS bar_id,
             ts, event_id, px
      FROM ticks
      UNION ALL
      SELECT 'volume' AS bar_type, sym,
             CAST(CAST(FLOOR(pvol / 500) AS BIGINT) AS VARCHAR) AS bar_id,
             ts, event_id, px
      FROM vcum
    ),
    bars AS (
      SELECT bar_type, sym, bar_id,
             {first_px} AS open_px, {last_px} AS close_px
      FROM tagged GROUP BY bar_type, sym, bar_id
    ),
    rets AS (
      SELECT bar_type,
             CAST(FLOOR((CAST(close_px AS DOUBLE) / CAST(open_px AS DOUBLE) - 1)
                        * 1000000) AS BIGINT) AS r
      FROM bars WHERE CAST(open_px AS DOUBLE) > 0
    ),
    mom AS (
      SELECT bar_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(r AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS DOUBLE)
               AS s1,
             CAST(CAST(SUM(CAST(r AS DECIMAL(18,0)) * r) AS DECIMAL(38,0))
                  AS DOUBLE) AS s2,
             CAST(CAST(SUM(CAST(r AS DECIMAL(10,0)) * CAST(r AS DECIMAL(10,0))
                           * CAST(r AS DECIMAL(10,0)) * r) AS DECIMAL(38,0))
                  AS DOUBLE) AS s4
      FROM rets GROUP BY bar_type
    )
    SELECT bar_type, CAST(n AS BIGINT) AS n_bars,
           ROUND(s1 / n, 2) AS mean_r_e6,
           ROUND(s2 / n - (s1 / n) * (s1 / n), 2) AS var_r_e12,
           ROUND(n * s4 / (s2 * s2) - 3, 4) AS excess_kurtosis
    FROM mom ORDER BY bar_type
"""

register_sql(
    "x317_bar_return_moments",
    spark_sql=_X317_FMT.format(
        ticks=_TICKS,
        first_px="min_by(px, struct(ts, event_id))",
        last_px="max_by(px, struct(ts, event_id))",
    ).replace("AS VARCHAR", "AS STRING"),
    duckdb_sql=_X317_FMT.format(
        ticks=_TICKS,
        first_px="first(px ORDER BY ts, event_id)",
        last_px="last(px ORDER BY ts, event_id)",
    ),
    tags=("finance", "ohlcv", "stats"),
)
