"""Wave 76 (x314–x315): information-driven bars + tick-rule classification.

Back to the reference's market-data domain (docs/…系統設計文件.md K-bar
workload).  x314 cuts VOLUME bars — the information-driven sampling of
López de Prado's "Advances in Financial ML": instead of q32's fixed time
buckets, a new bar opens whenever cumulative traded volume crosses the
threshold, so bars arrive faster when the market is active and sampling
tracks information flow.  Bar id = floor(exclusive-prefix-volume / V) —
a running-sum window per key (DECIMAL-exact), then the same
min_by/max_by OHLCV aggregation as the time-bar operator.

x315 is the Lee–Ready tick rule: classify each trade as buyer- or
seller-initiated from the sign of the price change, carrying the last
NONZERO sign forward across zero-change trades (the zero-tick rule) —
an IGNORE NULLS last_value window, x71's pattern.  Reports per-key
buy/sell/unclassified counts and signed flow.

Both run on the events stream read as ticks (key = user_id % 10,
price/volume from value): one shuffle per key, window passes over one
sort — the q32/x153 plan shape.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x314: volume bars --------------------------------------------------------
# exclusive prefix volume via SUM OVER (... ROWS BETWEEN UNBOUNDED
# PRECEDING AND 1 PRECEDING); DECIMAL keeps the running sum exact so the
# bar boundaries are engine-identical.

_X314_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    cum AS (
      SELECT sym, ts, event_id, vol, px,
             COALESCE(SUM(vol) OVER (
               PARTITION BY sym ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), CAST(0 AS DECIMAL(18,6))) AS pvol
      FROM ticks
    ),
    barred AS (
      SELECT sym, ts, event_id, vol, px,
             CAST(FLOOR(pvol / 500) AS BIGINT) AS bar_id
      FROM cum
    ),
    bars AS (
      SELECT sym, bar_id,
             CAST(COUNT(*) AS BIGINT) AS n_ticks,
             CAST(SUM(vol) AS DECIMAL(18,6)) AS bar_vol,
             {open_px} AS open_px,
             CAST(MAX(px) AS DECIMAL(18,6)) AS high_px,
             CAST(MIN(px) AS DECIMAL(18,6)) AS low_px,
             {close_px} AS close_px
      FROM barred GROUP BY sym, bar_id
    )
    SELECT sym, bar_id, n_ticks,
           CAST(bar_vol AS DOUBLE) AS bar_vol,
           CAST(open_px AS DOUBLE) AS open_px, CAST(high_px AS DOUBLE) AS high_px,
           CAST(low_px AS DOUBLE) AS low_px, CAST(close_px AS DOUBLE) AS close_px
    FROM bars ORDER BY sym, bar_id LIMIT 300
"""

register_sql(
    "x314_volume_bars",
    spark_sql=_X314_FMT.format(
        open_px="CAST(min_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
    ),
    duckdb_sql=_X314_FMT.format(
        open_px="CAST(first(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
    ),
    tags=("ohlcv", "finance"),
)

# -- x315: Lee–Ready tick rule ------------------------------------------------

_X315_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    diffs AS (
      SELECT sym, ts, event_id, px,
             px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) AS d
      FROM ticks
    ),
    raw_sign AS (
      SELECT sym, ts, event_id,
             CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE NULL END AS s0,
             d IS NULL AS is_first
      FROM diffs
    ),
    carried AS (
      SELECT sym, ts, event_id, is_first,
             {last_nonzero} AS s
      FROM raw_sign
    )
    SELECT sym,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_buy,
           CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sell,
           CAST(SUM(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unclassified,
           CAST(SUM(COALESCE(s, 0)) AS BIGINT) AS signed_flow
    FROM carried GROUP BY sym ORDER BY sym
"""

register_sql(
    "x315_tick_rule",
    spark_sql=_X315_FMT.format(
        last_nonzero=(
            "last_value(s0, true) OVER ("
            "PARTITION BY sym ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    ),
    duckdb_sql=_X315_FMT.format(
        last_nonzero=(
            "last_value(s0 IGNORE NULLS) OVER ("
            "PARTITION BY sym ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    ),
    tags=("finance", "window"),
)
