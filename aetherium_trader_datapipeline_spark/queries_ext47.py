"""Forty-seventh extension wave — snapshot diffing and fractional
attribution:

x242 snapshot diff     keyed diff of two table versions (the data-diff /
                       change-data-feed summary): added / removed /
                       changed / unchanged counts plus per-status value
                       deltas, via one full outer join
x243 linear attribution multi-touch credit: each pre-conversion touch of a
                       converting user earns floor(1e6 / n_touches)
                       micro-credits; channel totals are then exact
                       integer sums (no float credit accumulation)

Scale shapes: x242 is one full outer join on the key (the canonical diff
plan); x243 is two window-free aggregations keyed by user then channel.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x242: keyed snapshot diff ----------------------------------------------
# Versions are date-sliced order snapshots: A = orders before 1998; B =
# orders before 1999 with totalprice "restated" for 1997 orders (+1 for
# orderkeys divisible by 7) and a deterministic key deletion (pre-1996
# orderkeys ≡ 3 mod 11 dropped) — so all four diff statuses occur.

_X242_BODY = """
    WITH a AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders WHERE o_orderdate < DATE '1998-01-01'
    ),
    b AS (
      SELECT o_orderkey AS k,
             CAST(o_totalprice AS DECIMAL(18,2))
               + CASE WHEN o_orderkey % 7 = 0
                       AND o_orderdate >= DATE '1997-01-01'
                      THEN CAST(1.00 AS DECIMAL(18,2))
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END AS v
      FROM orders WHERE o_orderdate < DATE '1999-01-01'
        AND NOT (o_orderkey % 11 = 3 AND o_orderdate < DATE '1996-01-01')
    ),
    d AS (
      SELECT COALESCE(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.v <> b.v THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(b.v, CAST(0.00 AS DECIMAL(18,2)))
               - COALESCE(a.v, CAST(0.00 AS DECIMAL(18,2))) AS delta
      FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(delta) AS DOUBLE), 2) AS value_delta
    FROM d GROUP BY status ORDER BY status
"""

register_sql(
    "x242_snapshot_diff",
    spark_sql=_X242_BODY,
    duckdb_sql=_X242_BODY,
    tags=("warehouse", "diff", "join"),
)

# -- x243: linear multi-touch attribution -----------------------------------

_X243_BODY = """
    WITH conv AS (
      SELECT user_id, MIN(ts) AS conv_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
      SELECT e.user_id, e.event_type AS channel
      FROM events e JOIN conv c ON e.user_id = c.user_id
      WHERE e.ts < c.conv_ts
    ),
    per_user AS (
      SELECT user_id, channel, CAST(COUNT(*) AS BIGINT) AS n_ch,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id) AS BIGINT) AS n_touches
      FROM touches GROUP BY user_id, channel
    ),
    credit AS (
      SELECT channel,
             n_ch * CAST(FLOOR(1000000.0 / n_touches) AS BIGINT) AS micro
      FROM per_user
    )
    SELECT channel, CAST(SUM(micro) AS BIGINT) AS credit_micro,
           CAST(COUNT(*) AS BIGINT) AS n_user_channels
    FROM credit GROUP BY channel ORDER BY channel
"""

register_sql(
    "x243_linear_attribution",
    spark_sql=_X243_BODY,
    duckdb_sql=_X243_BODY,
    tags=("analytics", "attribution"),
)
