"""Fourth extension wave: time-series / market-analytics operators over the
events stream — the query side of the reference's tick domain (K-bar docs,
docs/…系統設計文件.md:69-72, generalized beyond OHLCV):

- EMA: a linear recurrence (not a plain window aggregate) — exact per-key
  left fold over the FULL history via a sorted-partition ``mapInPandas``
  pass (operators/timeseries.py), hash-matched against a DuckDB
  recursive-CTE oracle computing the same IEEE-double fold.
- Resample + forward fill: hourly spine per key (sequence/explode) LEFT
  JOIN hourly aggregates, gap-fill with LAST_VALUE IGNORE NULLS — the
  batch form of gap repair on a downsampled tick store.
- TWAP: weight-field (props.k) weighted average price with exact DECIMAL accumulation
  (double SUM order-dependence would break cross-engine hashing); the
  final quotient is emitted as floor'd micro-units — FLOOR of the same
  IEEE double is engine-identical, while ROUND of a quotient can tie-break
  differently (half-up on shortest-repr vs half-away on scaled double).
- TPC-H Q5 shape: the 6-way join benchmark classic — exercises Catalyst
  join reordering + broadcast selection across region/nation dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables


@register(
    "x77_ema",
    headline=True,
    # Exact EMA oracle: the same left fold, expressed as a recursive CTE
    # walking row_number order per user. IEEE-double op order is identical
    # to the Spark-side fold (0.2*x + 0.8*acc), so the hash matches exactly.
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_id, ROUND(value, 4) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    rec AS (
      SELECT user_id, event_id, rn, v AS ema FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.rn, 0.2 * o.v + 0.8 * r.ema
      FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
    SELECT event_id, ROUND(ema, 4) AS ema
    FROM rec ORDER BY event_id LIMIT 500
    """,
    tags=("timeseries", "window", "pandas"),
)
def x77_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key EMA over full history — one shuffle, no history arrays.

    Replaces the r2 truncated form (collect_list 50-row frame): see
    operators/timeseries.py for the plan-shape rationale.
    """
    from aetherium_trader_datapipeline_spark.operators.timeseries import ema

    t = load_tables(spark, sf_dir)
    src = t["events"].select(
        "user_id", "event_id", "ts", F.round("value", 4).alias("v")
    )
    out = ema(src, ["user_id"], ["ts", "event_id"], "v", out_cols=["event_id"])
    return (
        out.select("event_id", F.round("ema", 4).alias("ema"))
        .orderBy("event_id")
        .limit(500)
    )

register_sql(
    "x78_resample_ffill",
    spark_sql="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY user_id),
    spine AS (
      SELECT user_id, explode(sequence(h0, h1, interval 1 hour)) AS h FROM bounds),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(value), 4) AS v
      FROM events GROUP BY user_id, date_trunc('hour', ts))
    SELECT s.user_id, s.h,
           ROUND(LAST_VALUE(v) IGNORE NULLS OVER (PARTITION BY s.user_id ORDER BY s.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_ffill
    FROM spine s LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h
    ORDER BY s.user_id, s.h LIMIT 500
    """,
    duckdb_sql="""
    WITH bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1
      FROM events GROUP BY user_id),
    spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
    hourly AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(value), 4) AS v
      FROM events GROUP BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)))
    SELECT s.user_id, s.h,
           ROUND(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_ffill
    FROM spine s LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h
    ORDER BY s.user_id, s.h LIMIT 500
    """,
    tags=("timeseries", "gapfill"),
)

register_sql(
    "x79_twap",
    spark_sql="""
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
           CAST(FLOOR(1e6 * CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))
                          * CAST(get_json_object(props, '$.k') AS DECIMAL(18,0))) AS DOUBLE)
                 / NULLIF(CAST(SUM(CAST(get_json_object(props, '$.k') AS DECIMAL(18,0))) AS DOUBLE), 0.0)) AS BIGINT) AS twap_micro
    FROM events GROUP BY user_id, date_trunc('day', ts)
    ORDER BY user_id, d LIMIT 300
    """,
    duckdb_sql="""
    SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
           CAST(FLOOR(1e6 * CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))
                          * CAST(json_extract_string(props, '$.k') AS DECIMAL(18,0))) AS DOUBLE)
                 / NULLIF(CAST(SUM(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,0))) AS DOUBLE), 0.0)) AS BIGINT) AS twap_micro
    FROM events GROUP BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
    ORDER BY user_id, d LIMIT 300
    """,
    tags=("timeseries", "agg", "json"),
)

register_sql(
    "x80_tpch_q5",
    headline=True,
    spark_sql="""
    SELECT n_name,
           ROUND(CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    duckdb_sql="""
    SELECT n_name,
           ROUND(CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DECIMAL(38,2)) AS DOUBLE), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    tags=("join", "tpch"),
)
