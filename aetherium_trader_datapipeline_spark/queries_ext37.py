"""Thirty-seventh extension wave — trading accounting and ML feature prep:

x213 avg-cost PnL    average-cost position/realized-PnL accounting per
                     instrument — the trading-native three-state fold
                     (operators/timeseries.avg_cost_pnl), recursive-CTE
                     oracle replaying identical IEEE float ops
x214 target encode   leave-one-out smoothed mean target encoding of a
                     categorical (the classic ML-prep transform that
                     leaks without the LOO correction)
x215 feature lags    per-entity lag/rolling feature matrix in integer
                     cents — the feature-store build pass

Trade synthesis for x213 (events is tick-shaped; there is no order-flow
table): side = buy for click/view/signup else sell, qty = 1 + event_id%3,
price = 4-dp value (>0 only) — all engine-identical integer/rounding
derivations, declared identically in both dialects.

Scale shapes: x213 is one hash exchange + streaming fold, one output row
per key. x214 is two window passes over the category partitions plus a
scalar prior broadcast. x215 is one window pass keyed by entity, all
integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x213: average-cost PnL --------------------------------------------------

_X213_ORACLE = """
    WITH RECURSIVE trades AS (
      SELECT user_id,
             CASE WHEN event_type IN ('click','view','signup') THEN 1 ELSE -1 END AS side,
             CAST(1 + event_id % 3 AS BIGINT) AS q,
             ROUND(value, 4) AS p,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE value > 0),
    rec AS (
      SELECT user_id, rn,
             CASE WHEN side = 1 THEN q ELSE CAST(0 AS BIGINT) END AS pos,
             CASE WHEN side = 1 THEN q * p ELSE CAST(0.0 AS DOUBLE) END AS cost,
             CAST(0.0 AS DOUBLE) AS realized
      FROM trades WHERE rn = 1
      UNION ALL
      SELECT t.user_id, t.rn,
             CASE WHEN t.side = 1 THEN r.pos + t.q
                  WHEN r.pos > 0 THEN r.pos - LEAST(t.q, r.pos)
                  ELSE r.pos END,
             CASE WHEN t.side = 1 THEN r.cost + t.q * t.p
                  WHEN r.pos > 0 THEN r.cost - LEAST(t.q, r.pos) * (r.cost / r.pos)
                  ELSE r.cost END,
             CASE WHEN t.side = -1 AND r.pos > 0
                  THEN r.realized + LEAST(t.q, r.pos) * (t.p - r.cost / r.pos)
                  ELSE r.realized END
      FROM trades t JOIN rec r ON t.user_id = r.user_id AND t.rn = r.rn + 1),
    last AS (
      SELECT user_id, MAX(rn) AS n FROM trades GROUP BY user_id)
    SELECT r.user_id, l.n AS n_trades, r.pos,
           CAST(FLOOR(1e4 * r.cost) AS BIGINT) AS cost_bp,
           CAST(FLOOR(1e4 * r.realized) AS BIGINT) AS realized_bp
    FROM rec r JOIN last l ON r.user_id = l.user_id AND r.rn = l.n
    ORDER BY r.user_id
"""


@register(
    "x213_avg_cost_pnl",
    headline=True,
    oracle=_X213_ORACLE,
    tags=("finance", "pandas", "stateful"),
)
def x213_avg_cost_pnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: JVM array-fold form — same recurrence, no Python boundary
    # (guide §4.1); bit-equality vs the mapInPandas fold is pinned in
    # tests/test_operators.py::test_avg_cost_pnl_grouped_matches_fold.
    from aetherium_trader_datapipeline_spark.operators.timeseries import (
        avg_cost_pnl_grouped,
    )

    t = load_tables(spark, sf_dir)
    trades = (
        t["events"]
        .where(F.col("value") > 0)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type").isin("click", "view", "signup"), F.lit(1)
            )
            .otherwise(F.lit(-1))
            .alias("side"),
            (F.lit(1) + F.col("event_id") % 3).cast("bigint").alias("qty"),
            F.round("value", 4).alias("p"),
        )
    )
    out = avg_cost_pnl_grouped(trades, ["user_id"], ["ts", "event_id"])
    bp = lambda c: F.floor(F.lit(1e4) * F.col(c)).cast("bigint")  # noqa: E731
    return out.select(
        "user_id",
        "n_trades",
        "pos",
        bp("cost").alias("cost_bp"),
        bp("realized").alias("realized_bp"),
    ).orderBy("user_id")


# -- x214: leave-one-out target encoding ------------------------------------
# Encoding for row i of category c: (sum_y(c) - y_i + m*prior)/(n(c) - 1 + m)
# with smoothing m=20. Integer category sums, one global prior, floored
# micro-units. The LOO subtraction is what makes the transform usable for
# training (a row never sees its own label).

_X214_BODY = """
    WITH t AS (
      SELECT o_orderkey, o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    s AS (
      SELECT o_orderkey, cat, y,
             SUM(y) OVER (PARTITION BY cat) AS sy,
             COUNT(*) OVER (PARTITION BY cat) AS n
      FROM t
    ),
    g AS (SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS prior FROM t)
    SELECT o_orderkey, cat, y,
           CAST(FLOOR(1e6 * (((sy - y) + 20.0 * prior) / ((n - 1) + 20.0))) AS BIGINT)
             AS loo_enc_micro
    FROM s CROSS JOIN g
    ORDER BY o_orderkey LIMIT 300
"""

register_sql(
    "x214_target_encoding",
    spark_sql=_X214_BODY,
    duckdb_sql=_X214_BODY,
    tags=("ml", "window"),
)

# -- x215: lag/rolling feature matrix ---------------------------------------
# Integer cents end to end: lags, trailing-10 sum/count, day-of-week
# (shimmed to the same 0=Sunday convention in both engines).

_X215_FMT = """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT user_id, event_id, cents,
           LAG(cents, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag1,
           LAG(cents, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag3,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll10_sum,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll10_n,
           CAST({dow} AS BIGINT) AS dow
    FROM e
    ORDER BY user_id, event_id LIMIT 500
"""

register_sql(
    "x215_feature_lags",
    spark_sql=_X215_FMT.format(dow="dayofweek(ts) - 1"),
    duckdb_sql=_X215_FMT.format(dow="EXTRACT(dow FROM ts)"),
    tags=("ml", "window"),
)
