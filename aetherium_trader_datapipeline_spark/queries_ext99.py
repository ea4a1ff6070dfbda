"""Wave 99 (x381): VWAP slippage — the transaction-cost-analysis benchmark.

Every execution desk's first report: how far did trades print from the
interval VWAP?  Per (sym, minute): VWAP = Σ(px·vol)/Σ(vol) in DECIMAL
(exact), then each trade's signed deviation from its own minute's VWAP
in integer micro-units, rolled up per symbol as mean absolute slippage
and the share of trades printing above VWAP.  Complements x79 (TWAP —
the time benchmark) with the volume benchmark actually used for broker
scorecards; one groupBy for the VWAP frame, one join back, one rollup,
all cross-row sums integer-exact (x321 discipline).
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
    vwap AS (
      SELECT sym, m,
             CAST(SUM(px * vol) AS DECIMAL(38,12)) AS pv,
             CAST(SUM(vol) AS DECIMAL(28,6)) AS v
      FROM ticks GROUP BY sym, m
    ),
    devs AS (
      SELECT t.sym,
             CAST(FLOOR((CAST(t.px AS DOUBLE)
                         - CAST(w.pv AS DOUBLE) / CAST(w.v AS DOUBLE))
                        * 1e6) AS BIGINT) AS dev_micro
      FROM ticks t JOIN vwap w ON t.sym = w.sym AND t.m = w.m
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
    spark_sql=_X381_FMT.format(minute_of="date_trunc('minute', ts)"),
    duckdb_sql=_X381_FMT.format(minute_of="CAST(date_trunc('minute', ts) AS TIMESTAMP)"),
    tags=("finance", "ohlcv"),
)
