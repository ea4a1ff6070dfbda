"""Fifty-ninth extension wave — distribution shape metrics:

x270 lines histogram    distribution of lines-per-order (count histogram
                        + the exact mode) — basket-size shape
x271 repurchase interval exact median days between consecutive purchases
                        per user (LAG diffs + rank pick)
x272 price dispersion   per-part price coefficient of variation across
                        its line items (supplier/price dispersion)

Scale shapes: all reduce to small keyed aggregates; x271's window input
is the purchase stream only.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x270: lines-per-order histogram ----------------------------------------

_X270_BODY = """
    WITH per_order AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    hist AS (
      SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM per_order GROUP BY n_lines
    ),
    mx AS (SELECT MAX(n_orders) AS m FROM hist)
    SELECT h.n_lines, h.n_orders,
           CAST(CASE WHEN h.n_orders = mx.m THEN 1 ELSE 0 END AS INT) AS is_mode
    FROM hist h CROSS JOIN mx
    ORDER BY h.n_lines
"""

register_sql(
    "x270_lines_histogram",
    spark_sql=_X270_BODY,
    duckdb_sql=_X270_BODY,
    tags=("distribution", "agg"),
)

# -- x271: repurchase interval ----------------------------------------------

_X271_FMT = """
    WITH p AS (
      SELECT user_id, CAST(ts AS DATE) AS d, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             CAST({dd} AS BIGINT) AS gap_days,
             event_id
      FROM (
        SELECT user_id, d, event_id,
               LAG(d) OVER (PARTITION BY user_id ORDER BY d, event_id) AS prev_d
        FROM p
      ) t WHERE prev_d IS NOT NULL
    ),
    r AS (
      SELECT user_id, gap_days,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_days, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM gaps
    )
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.5 * n) AS BIGINT) THEN gap_days END)
                AS BIGINT) AS median_gap_days
    FROM r GROUP BY user_id ORDER BY user_id LIMIT 300
"""

register_sql(
    "x271_repurchase_interval",
    spark_sql=_X271_FMT.format(dd="DATEDIFF(d, prev_d)"),
    duckdb_sql=_X271_FMT.format(dd="datediff('day', prev_d, d)"),
    tags=("retention", "window"),
)

# -- x272: price dispersion per part ----------------------------------------

_X272_BODY = """
    WITH px AS (
      SELECT l_partkey AS pk,
             -- explicit half-up FLOOR quantization to 1e-4 units: the r6
             -- CAST(double AS DECIMAL(18,4)) hit engine-divergent rounding
             -- on .00005 boundaries at sf0.1 (r7 sweep), and Spark's
             -- DECIMAL(19,4) square exceeded precision 38 and silently
             -- rounded scale 8 -> 7 (allowPrecisionLoss)
             CAST(FLOOR(l_extendedprice / l_quantity * 1e4 + 0.5)
                  AS BIGINT) AS q
      FROM lineitem WHERE l_quantity > 0
    ),
    m AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS DOUBLE) / 1e4 AS sx,
             CAST(SUM(CAST(q AS DECIMAL(18,0)) * q) AS DOUBLE) / 1e8 AS sxx
      FROM px GROUP BY pk
    )
    SELECT pk, n,
           CAST(FLOOR(1e6 * (SQRT(GREATEST((sxx - (sx * sx) / n) / (n - 1), 0.0))
                             / (sx / n))) AS BIGINT) AS cv_micro
    FROM m WHERE n > 5
    ORDER BY cv_micro DESC, pk LIMIT 200
"""

register_sql(
    "x272_price_dispersion",
    spark_sql=_X272_BODY,
    duckdb_sql=_X272_BODY,
    tags=("distribution", "agg"),
)
