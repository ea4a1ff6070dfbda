"""Wave 137 (x481): additive Holt–Winters — the seasonal member of the
exact sequential-recurrence family.

x481 runs operators/timeseries.holt_winters_additive (level + trend +
24-slot seasonal ring, single-shuffle sorted-partition fold — the x77
EMA / x196 Holt lineage) over per-symbol hourly volume, against a
DuckDB recursive-CTE oracle that carries ALL 24 seasonal slots as
columns and mirrors the kernel's IEEE op order term for term (exact
binary-fraction smoothing constants, so no literal re-rounding).  Only
DuckDB runs the 720-step recursion — the Spark side is the Arrow fold,
which is the point: the recurrence that SQL can only express by
dragging a 24-column ring through 720 recursion steps is one O(state)
pass in the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

_M = 24


def _x481_oracle() -> str:
    s_cols = ", ".join(f"s{j}" for j in range(_M))
    zeros = ", ".join(f"CAST(0.0 AS DOUBLE) AS s{j}" for j in range(_M))
    s_old = (
        "CASE ((o.rn - 1) % 24) "
        + " ".join(f"WHEN {j} THEN r.s{j}" for j in range(_M))
        + " END"
    )
    # l_new is computed ONCE per level as a subquery column (z.lnew) and
    # referenced 26 times by name — the r8 rewrite of the original form
    # that textually expanded the l_new expression into every seasonal
    # CASE (24 copies), which made each recursion level's projection tree
    # enormous. Same operations in the same order on the same values →
    # IEEE-identical doubles; verified hash-equal at all three SFs.
    prev_cols = ", ".join(f"r.s{j} AS ps{j}" for j in range(_M))
    l_new = f"(0.5 * (o.v - {s_old}) + 0.5 * (r.l + r.t))"
    t_new = "(0.25 * (z.lnew - z.pl) + 0.75 * z.pt)"
    s_upd = ",\n             ".join(
        f"CASE WHEN z.rn > 24 AND (z.rn - 1) % 24 = {j} "
        f"THEN 0.25 * (z.v - z.lnew) + 0.75 * z.ps{j} "
        f"ELSE z.ps{j} END AS s{j}"
        for j in range(_M)
    )
    s_at_slot = (
        "CASE ((rn - 1) % 24) "
        + " ".join(f"WHEN {j} THEN s{j}" for j in range(_M))
        + " END"
    )
    s_at_next = (
        "CASE (rn % 24) "
        + " ".join(f"WHEN {j} THEN s{j}" for j in range(_M))
        + " END"
    )
    return f"""
    WITH RECURSIVE hourly AS (
      SELECT user_id % 10 AS sym,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hkey,
             CAST(SUM(CAST(FLOOR(ABS(value) * 1e6) AS BIGINT)) AS DOUBLE)
               / 1e6 AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id % 10, CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600
    ),
    ordered AS MATERIALIZED (
      -- MATERIALIZED is load-bearing (r8, the x522/x551 lesson): the
      -- recursive member rejoins `ordered` every level and DuckDB
      -- inlines unmaterialized CTEs, re-running the hourly groupBy +
      -- window per recursion step — 382 s at sf0.01 vs ~1 s materialized.
      -- rn <= 500: prefix cap, output-identical under the final
      -- ORDER BY sym, rn LIMIT 500 (see the Spark side's note).
      SELECT * FROM (
        SELECT sym, hkey, v,
               ROW_NUMBER() OVER (PARTITION BY sym ORDER BY hkey) AS rn
        FROM hourly
      ) t WHERE rn <= 500
    ),
    rec AS (
      SELECT sym, hkey, rn, v AS l, CAST(0.0 AS DOUBLE) AS t, {zeros}
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT z.sym, z.hkey, z.rn,
             CASE WHEN z.rn <= 24 THEN z.v ELSE z.lnew END,
             CASE WHEN z.rn <= 24 THEN CAST(0.0 AS DOUBLE)
                  ELSE {t_new} END,
             {s_upd}
      FROM (
        SELECT o.sym, o.hkey, o.rn, o.v, r.l AS pl, r.t AS pt,
               {prev_cols},
               {l_new} AS lnew
        FROM ordered o JOIN rec r ON o.sym = r.sym AND o.rn = r.rn + 1
      ) z
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(rn AS BIGINT) AS rn,
           CAST(FLOOR(1e4 * l) AS BIGINT) AS level_bp,
           CAST(FLOOR(1e4 * t) AS BIGINT) AS trend_bp,
           CAST(FLOOR(1e4 * ({s_at_slot})) AS BIGINT) AS seasonal_bp,
           CAST(FLOOR(1e4 * (l + t + ({s_at_next}))) AS BIGINT) AS fc_bp
    FROM rec ORDER BY sym, rn LIMIT 500
"""


@register(
    "x481_holt_winters",
    oracle=_x481_oracle(),
    tags=("timeseries", "pandas"),
)
def x481_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact additive Holt–Winters over per-symbol hourly volume — one
    shuffle, O(season) fold state (operators/timeseries)."""
    from aetherium_trader_datapipeline_spark.operators.timeseries import (
        holt_winters_additive,
    )

    events = load_tables(spark, sf_dir)["events"]
    hourly = (
        events.where("value IS NOT NULL")
        .selectExpr(
            "user_id % 10 AS sym",
            "unix_seconds(ts) DIV 3600 AS hkey",
            "CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp",
        )
        .groupBy("sym", "hkey")
        .agg((F.sum("vol_fp").cast("double") / F.lit(1e6)).alias("v"))
        # prefix cap (r8): the final ORDER BY sym, rn LIMIT 500 can never
        # emit a row with rn > 500 (its >500 same-sym predecessors would
        # fill the limit first), and the HW fold's state at step k depends
        # only on steps 1..k — so folding only the first 500 hours per sym
        # is OUTPUT-IDENTICAL while making both engines' cost
        # horizon-bound, not data-bound. The oracle applies the same cap.
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("sym").orderBy("hkey")),
        )
        .where(F.col("__rn") <= 500)
        .drop("__rn")
    )
    out = holt_winters_additive(
        hourly, ["sym"], ["hkey"], "v", out_cols=["sym", "hkey"]
    )
    w = F.floor
    rn = F.row_number().over(Window.partitionBy("sym").orderBy("hkey"))
    return (
        out.withColumn("rn", rn)
        .select(
            F.col("sym").cast("bigint").alias("sym"),
            F.col("rn").cast("bigint").alias("rn"),
            w(F.lit(1e4) * F.col("level")).cast("bigint").alias("level_bp"),
            w(F.lit(1e4) * F.col("trend")).cast("bigint").alias("trend_bp"),
            w(F.lit(1e4) * F.col("seasonal")).cast("bigint")
            .alias("seasonal_bp"),
            w(F.lit(1e4) * F.col("fc")).cast("bigint").alias("fc_bp"),
        )
        .orderBy("sym", "rn")
        .limit(500)
    )
