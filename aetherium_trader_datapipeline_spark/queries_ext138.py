"""Wave 138 (x482–x484): join-order audit, exact audience overlap, and
intermittent-demand forecasting.

x482 — join-order enumeration audit for σ(customer) ⋈ orders ⋈
σ(lineitem): both left-deep orders are costed by the independence-
assumption estimator (the x301/x437 planner math) AND measured — the
true intermediate cardinalities are exact counts — so the table shows
whether the estimator picks the same order an oracle would.  This is
the CBO decision loop, closed with ground truth.

x483 — audience overlap matrix: exact pairwise Jaccard between the
user sets of each event type (distinct (user, type) collapse, then a
type-pair self-join on user — |types|²-bounded, never |events|²).
The exact ground truth for x229's HLL-intersection sketch.

x484 — Croston's method for intermittent demand: per symbol, daily
purchase counts are sparse; separate α=1/8 EMAs of the nonzero demand
SIZES and the inter-demand INTERVALS (both via the x77 ema fold —
exact binary-fraction smoothing) give forecast = z/p.  The DuckDB
oracle runs one recursive CTE carrying both EMA states, term-for-term
identical to the two Arrow folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x482: join-order audit ---------------------------------------------------------------

_X482 = """
    WITH sel AS (
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_c,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
         WHERE c_mktsegment = 'BUILDING') AS n_csel,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_o,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_l,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
         WHERE l_quantity < 10) AS n_lsel
    ),
    true_co AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment = 'BUILDING'
    ),
    true_ol AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_quantity < 10
    ),
    plans AS (
      SELECT 'A_csel_orders_first' AS plan,
             -- independence estimate: |O| * (selected customers share)
             CAST(s.n_o * s.n_csel {intdiv} s.n_c AS BIGINT)
               AS est_intermediate,
             t.n AS true_intermediate
      FROM sel s CROSS JOIN true_co t
      UNION ALL
      SELECT 'B_lsel_orders_first',
             CAST(s.n_lsel AS BIGINT),
             t.n
      FROM sel s CROSS JOIN true_ol t
    )
    SELECT plan, est_intermediate, true_intermediate,
           CASE WHEN true_intermediate > 0 THEN
             ROUND(ABS(CAST(est_intermediate AS DOUBLE) - true_intermediate)
                   / true_intermediate, 4) END AS est_rel_error,
           CASE WHEN est_intermediate
                     = MIN(est_intermediate) OVER () THEN 1 ELSE 0 END
             AS chosen_by_estimator,
           CASE WHEN true_intermediate
                     = MIN(true_intermediate) OVER () THEN 1 ELSE 0 END
             AS optimal_by_truth
    FROM plans ORDER BY plan
"""

register_sql(
    "x482_join_order_plan",
    spark_sql=_X482.format(intdiv="DIV"),
    duckdb_sql=_X482.format(intdiv="//"),
    tags=("planning", "profiling"),
)

# -- x483: exact audience overlap -----------------------------------------------------------

_X483 = """
    WITH audiences AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM audiences GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM audiences a JOIN audiences b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b,
           sa.n AS n_a, sb.n AS n_b, i.n_inter,
           ROUND(CAST(i.n_inter AS DOUBLE)
                 / (sa.n + sb.n - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.type_a = sa.event_type
    JOIN sizes sb ON i.type_b = sb.event_type
    ORDER BY type_a, type_b
"""

register_sql(
    "x483_audience_overlap",
    spark_sql=_X483,
    duckdb_sql=_X483,
    tags=("events", "eval"),
)

# -- x484: Croston intermittent demand --------------------------------------------------------

_X484_ORACLE = """
    WITH RECURSIVE daily AS (
      SELECT user_id % 10 AS sym,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS dkey,
             CAST(COUNT(*) AS BIGINT) AS demand
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id % 10, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400
    ),
    gapped AS (
      SELECT sym, dkey, demand,
             CAST(dkey - LAG(dkey) OVER (PARTITION BY sym ORDER BY dkey)
                  AS DOUBLE) AS gap
      FROM daily
    ),
    ordered AS (
      SELECT sym, dkey, CAST(demand AS DOUBLE) AS z, gap,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY dkey) AS rn
      FROM gapped WHERE gap IS NOT NULL
    ),
    rec AS (
      SELECT sym, rn, z AS ez, gap AS ep FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.sym, o.rn,
             0.125 * o.z + 0.875 * r.ez,
             0.125 * o.gap + 0.875 * r.ep
      FROM ordered o JOIN rec r ON o.sym = r.sym AND o.rn = r.rn + 1
    ),
    finals AS (
      SELECT sym, ez, ep,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY rn DESC) AS rk
      FROM rec
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(FLOOR(1e6 * ez) AS BIGINT) AS size_ema_micro,
           CAST(FLOOR(1e6 * ep) AS BIGINT) AS interval_ema_micro,
           CAST(FLOOR(1e6 * (ez / ep)) AS BIGINT) AS croston_rate_micro
    FROM finals WHERE rk = 1 ORDER BY sym
"""


@register("x484_croston", oracle=_X484_ORACLE, tags=("timeseries", "pandas"))
def x484_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method: two exact α=1/8 EMA folds (sizes, intervals)
    over nonzero purchase days per symbol (operators/timeseries.ema)."""
    from pyspark.sql.window import Window

    from aetherium_trader_datapipeline_spark.operators.timeseries import ema

    events = load_tables(spark, sf_dir)["events"]
    daily = (
        events.where("event_type = 'purchase'")
        .selectExpr("user_id % 10 AS sym", "unix_seconds(ts) DIV 86400 AS dkey")
        .groupBy("sym", "dkey")
        .agg(F.count(F.lit(1)).cast("double").alias("z"))
    )
    w = Window.partitionBy("sym").orderBy("dkey")
    gapped = daily.withColumn(
        "gap", (F.col("dkey") - F.lag("dkey").over(w)).cast("double")
    ).where("gap IS NOT NULL")
    ez = ema(gapped, ["sym"], ["dkey"], "z", out_cols=["sym", "dkey"],
             alpha=0.125, out_name="ez")
    ep = ema(gapped, ["sym"], ["dkey"], "gap", out_cols=["sym", "dkey"],
             alpha=0.125, out_name="ep")
    joined = ez.join(ep, ["sym", "dkey"])
    rk = F.row_number().over(
        Window.partitionBy("sym").orderBy(F.col("dkey").desc())
    )
    return (
        joined.withColumn("rk", rk)
        .where("rk = 1")
        .select(
            F.col("sym").cast("bigint").alias("sym"),
            F.floor(F.lit(1e6) * F.col("ez")).cast("bigint")
            .alias("size_ema_micro"),
            F.floor(F.lit(1e6) * F.col("ep")).cast("bigint")
            .alias("interval_ema_micro"),
            F.floor(F.lit(1e6) * (F.col("ez") / F.col("ep"))).cast("bigint")
            .alias("croston_rate_micro"),
        )
        .orderBy("sym")
    )
