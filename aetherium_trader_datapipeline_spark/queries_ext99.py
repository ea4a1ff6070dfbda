"""Wave 99 (x381): VWAP slippage — the transaction-cost-analysis benchmark.

Every execution desk's first report: how far did trades print from the
interval VWAP?  Per (sym, minute): VWAP = Σ(px·vol)/Σ(vol) in DECIMAL
(exact), then each trade's signed deviation from its own minute's VWAP
in integer micro-units, rolled up per symbol as mean absolute slippage
and the share of trades printing above VWAP.  Complements x79 (TWAP —
the time benchmark) with the volume benchmark actually used for broker
scorecards; all cross-row sums integer-exact (x321 discipline).

Plan shape (r6): the per-minute VWAP rides an unbounded window frame
(SUM OVER (PARTITION BY sym, m)) instead of a groupBy + join-back —
one (sym, m) shuffle feeds both the VWAP and the deviation, fusing the
agg and the re-attach into a single exchange.  Measured hash-identical
to the join form and 1.4× faster at 100× (2.35 s vs 3.34 s warm
medians; sf0.1 ~equal); both rows recorded in SCALE.md.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_X381_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {minute_of} AS m, ts, event_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL AND ABS(value) > 0
    ),
    devs AS (
      SELECT sym,
             CAST(FLOOR((CAST(px AS DOUBLE)
                         - CAST(CAST(SUM(px * vol) OVER w AS DECIMAL(38,12))
                                AS DOUBLE)
                           / CAST(CAST(SUM(vol) OVER w AS DECIMAL(28,6))
                                  AS DOUBLE))
                        * 1e6) AS BIGINT) AS dev_micro
      FROM ticks
      WINDOW w AS (PARTITION BY sym, m)
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           ROUND(CAST(CAST(SUM(CAST(ABS(dev_micro) AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS DOUBLE) / COUNT(*) / 1e6, 6)
             AS mean_abs_slippage,
           ROUND(CAST(SUM(CASE WHEN dev_micro > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS share_above_vwap
    FROM devs GROUP BY sym ORDER BY sym
"""

register_sql(
    "x381_vwap_slippage",
    headline=True,
    spark_sql=_X381_FMT.format(minute_of="date_trunc('minute', ts)"),
    duckdb_sql=_X381_FMT.format(minute_of="CAST(date_trunc('minute', ts) AS TIMESTAMP)"),
    tags=("finance", "ohlcv"),
)
