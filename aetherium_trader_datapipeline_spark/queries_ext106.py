"""Wave 106 (x401–x403): execution analytics — implementation shortfall,
participation rate, order-size distribution.

The TCA decomposition layer on top of x381's VWAP slippage: a desk
doesn't just ask "how far from VWAP did I print" but "WHERE did the
cost come from".  Parent orders are synthesized deterministically from
the tick tape (user_id buckets = parent orders, their ticks = child
fills) — the driver compares engines, not brokers.

x401 — implementation-shortfall decomposition (Perold 1988): against
the arrival price (first tick of the parent), realized cost splits into
TRADING cost (fill VWAP vs arrival) on the filled quantity and
OPPORTUNITY cost (close vs arrival) on the unfilled remainder (here:
the parent's last-quartile volume is deemed unfilled, a deterministic
stand-in for a 75% fill rate).  All quantity×price sums are DECIMAL-
exact; per-parent costs are quantized to 1e9 micro-units before the
per-symbol rollup (x321 discipline).

x402 — participation rate (POV): each parent's volume as a share of
its symbol's total interval volume, with the per-symbol max/mean
participation — the "was I too loud in the market" screen.  Pure
DECIMAL ratios of exact sums.

x403 — order-size distribution: log₂-bucketed parent sizes per symbol
with counts and volume shares — the power-law fingerprint every market
impact model starts from (square-root-law calibration needs exactly
this histogram).  Integer bucket = floor(log2) via length of the binary
representation, computed with pure integer comparisons (no float log).

All three ride one (sym, parent) aggregation of the tick scan.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_PARENTS = """
    ticks AS (
      SELECT user_id % 10 AS sym, user_id AS parent, ts, event_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL AND ABS(value) > 0
    )
"""

# -- x401: implementation shortfall --------------------------------------------

_X401_FMT = f"""
    WITH {_PARENTS},
    parents AS (
      SELECT sym, parent,
             CAST({{first_px}} AS DOUBLE) AS arrival,
             CAST({{last_px}} AS DOUBLE) AS close_px,
             CAST(SUM(px * vol) AS DECIMAL(38,12)) AS pv,
             CAST(SUM(vol) AS DECIMAL(28,6)) AS v,
             CAST(COUNT(*) AS BIGINT) AS n_fills
      FROM ticks GROUP BY sym, parent
    ),
    costs AS (
      -- filled = 3/4 of volume (deterministic stand-in fill rate);
      -- trading cost on filled, opportunity cost on the remainder
      SELECT sym, parent, n_fills,
             CAST(FLOOR((CAST(pv AS DOUBLE) / CAST(v AS DOUBLE) - arrival)
                        / arrival * 0.75 * 1e9) AS BIGINT) AS trading_fp,
             CAST(FLOOR((close_px - arrival) / arrival * 0.25 * 1e9)
                  AS BIGINT) AS opportunity_fp
      FROM parents WHERE arrival > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_parents,
           ROUND(CAST(CAST(SUM(CAST(trading_fp AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS DOUBLE) / COUNT(*) / 1e9 * 1e4, 6)
             AS mean_trading_cost_bps,
           ROUND(CAST(CAST(SUM(CAST(opportunity_fp AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS DOUBLE) / COUNT(*) / 1e9 * 1e4, 6)
             AS mean_opportunity_cost_bps,
           ROUND(CAST(CAST(SUM(CAST(trading_fp + opportunity_fp
                 AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS DOUBLE)
                 / COUNT(*) / 1e9 * 1e4, 6) AS mean_shortfall_bps
    FROM costs GROUP BY sym ORDER BY sym
"""

register_sql(
    "x401_implementation_shortfall",
    spark_sql=_X401_FMT.format(
        first_px="CAST(min_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
        last_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
    ),
    duckdb_sql=_X401_FMT.format(
        first_px="CAST(first(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
        last_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
    ),
    tags=("finance", "tca"),
)

# -- x402: participation rate ---------------------------------------------------

_X402 = f"""
    WITH {_PARENTS},
    parents AS (
      SELECT sym, parent, CAST(SUM(vol) AS DECIMAL(28,6)) AS pvol
      FROM ticks GROUP BY sym, parent
    ),
    tot AS (
      SELECT sym, parent, pvol,
             SUM(pvol) OVER (PARTITION BY sym) AS svol
      FROM parents
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_parents,
           ROUND(CAST(MAX(pvol / svol) AS DOUBLE), 6) AS max_participation,
           ROUND(CAST(CAST(SUM(pvol) AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(MAX(svol) AS DOUBLE) / COUNT(*), 6)
             AS mean_participation
    FROM tot GROUP BY sym ORDER BY sym
"""

register_sql(
    "x402_participation_rate",
    spark_sql=_X402,
    duckdb_sql=_X402,
    tags=("finance", "tca"),
)

# -- x403: order-size distribution ---------------------------------------------
# log2 bucket via integer thresholds on micro-volume — no float log.

_X403 = f"""
    WITH {_PARENTS},
    parents AS (
      SELECT sym, parent,
             CAST(ROUND(SUM(vol) * 1000000, 0) AS BIGINT) AS vol_micro
      FROM ticks GROUP BY sym, parent
    ),
    bucketed AS (
      -- floor(log2(v)) = length of the binary digit string - 1; both
      -- engines' bin() renders that string — no float log involved
      SELECT sym, vol_micro, LENGTH({{bin_of}}) - 1 AS lg2
      FROM parents WHERE vol_micro > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(lg2 AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_parents,
           CAST(SUM(vol_micro) AS BIGINT) AS bucket_vol_micro
    FROM bucketed GROUP BY sym, lg2 ORDER BY sym, log2_bucket
"""

register_sql(
    "x403_order_size_distribution",
    spark_sql=_X403.format(bin_of="bin(vol_micro)"),
    duckdb_sql=_X403.format(bin_of="bin(vol_micro)"),
    tags=("finance", "stats"),
)
