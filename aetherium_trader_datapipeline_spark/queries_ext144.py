"""Wave 144 (x501–x503): the state-space trio — Kalman, GARCH, EWMA
correlation — as exact sequential folds with recursive-CTE oracles.

All three ride the hourly per-symbol spine (720 rows per key, so the
DuckDB recursion stays bounded) and the x77/x196/x481 discipline: the
Arrow fold and the oracle recursion share the identical IEEE op order,
smoothing constants are exact binary fractions, and outputs are floored
to integer grids so the hash is bit-strict.

x501 — local-level Kalman filter (random walk + noise, q=1/4, r=1):
state (x̂, P); the steady-state gain emerges numerically in both
engines identically.  THE canonical state-space smoother.

x502 — GARCH(1,1) conditional variance (α=1/8, β=3/4, ω set so the
unconditional variance is the series' own measured variance — the
variance-targeting initialization practitioners use).

x503 — RiskMetrics EWMA correlation (λ=15/16) between symbol pairs 0-1,
2-3, 4-5: three aligned two-series folds; correlation at each step from
the three running moments.  The dynamic-correlation complement to
x363's static matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

_HOURLY_DUCK = """
    hourly AS (
      SELECT user_id % 10 AS sym,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hkey,
             CAST(SUM(CAST(FLOOR(ABS(value) * 1e6) AS BIGINT)) AS DOUBLE)
               / 1e6 AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id % 10, CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600
    ),
    ordered AS MATERIALIZED (
      -- MATERIALIZED is load-bearing (r8): x501/x502/x503's recursive
      -- members rejoin `ordered` every level; unmaterialized, DuckDB
      -- inlines and recomputes the hourly groupBy + window per step
      -- (5-10 s each at sf0.01, ~20 s at sf0.1; sub-second materialized).
      SELECT sym, hkey, v,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY hkey) AS rn
      FROM hourly
    )
"""


def _hourly_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir)["events"]
    return (
        events.where("value IS NOT NULL")
        .selectExpr(
            "user_id % 10 AS sym",
            "unix_seconds(ts) DIV 3600 AS hkey",
            "CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp",
        )
        .groupBy("sym", "hkey")
        .agg((F.sum("vol_fp").cast("double") / F.lit(1e6)).alias("v"))
    )


# -- x501: Kalman local level -----------------------------------------------------------

_X501_ORACLE = (
    "WITH RECURSIVE " + _HOURLY_DUCK + """,
    rec AS (
      SELECT sym, rn, v AS xh, CAST(1.0 AS DOUBLE) AS p
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.sym, o.rn,
             r.xh + ((r.p + 0.25) / ((r.p + 0.25) + 1.0)) * (o.v - r.xh),
             (1.0 - ((r.p + 0.25) / ((r.p + 0.25) + 1.0))) * (r.p + 0.25)
      FROM ordered o JOIN rec r ON o.sym = r.sym AND o.rn = r.rn + 1
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(rn AS BIGINT) AS rn,
           CAST(FLOOR(1e6 * xh) AS BIGINT) AS xhat_micro,
           CAST(FLOOR(1e9 * p) AS BIGINT) AS pvar_nano
    FROM rec ORDER BY sym, rn LIMIT 500
"""
)


@register("x501_kalman_local_level", oracle=_X501_ORACLE,
          tags=("timeseries", "pandas"))
def x501_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact local-level Kalman over hourly volume per symbol — one
    shuffle, two-scalar fold state (operators/timeseries)."""
    from aetherium_trader_datapipeline_spark.operators.timeseries import (
        kalman_local_level,
    )

    hourly = _hourly_spark(spark, sf_dir)
    out = kalman_local_level(
        hourly, ["sym"], ["hkey"], "v", out_cols=["sym", "hkey"],
        q=0.25, r=1.0,
    )
    rn = F.row_number().over(Window.partitionBy("sym").orderBy("hkey"))
    return (
        out.withColumn("rn", rn)
        .select(
            F.col("sym").cast("bigint").alias("sym"),
            F.col("rn").cast("bigint").alias("rn"),
            F.floor(F.lit(1e6) * F.col("xhat")).cast("bigint")
            .alias("xhat_micro"),
            F.floor(F.lit(1e9) * F.col("pvar")).cast("bigint")
            .alias("pvar_nano"),
        )
        .orderBy("sym", "rn")
        .limit(500)
    )


# -- x502: GARCH(1,1) ---------------------------------------------------------------------

# variance targeting: omega = (1 - alpha - beta) * var(v) per sym, with
# var from DECIMAL-exact moments so omega is the same double both sides.
_X502_ORACLE = (
    "WITH RECURSIVE " + _HOURLY_DUCK + """,
    vs AS (
      SELECT sym,
             (CAST(SUM(CAST(CAST(FLOOR(v * 1e6) AS BIGINT)
                            AS DECIMAL(18,0))
                       * CAST(FLOOR(v * 1e6) AS BIGINT)) AS DOUBLE)
              / COUNT(*) / 1e12
              - POWER(CAST(SUM(CAST(FLOOR(v * 1e6) AS BIGINT)) AS DOUBLE)
                      / COUNT(*) / 1e6, 2)) AS vvar
      FROM ordered GROUP BY sym
    ),
    rec AS (
      SELECT o.sym, o.rn, o.v,
             (1.0 - 0.125 - 0.75) * vs.vvar / (1.0 - 0.125 - 0.75) AS h,
             vs.vvar
      FROM ordered o JOIN vs ON o.sym = vs.sym WHERE o.rn = 1
      UNION ALL
      SELECT o.sym, o.rn, o.v,
             (1.0 - 0.125 - 0.75) * r.vvar
               + 0.125 * (r.v * r.v) + 0.75 * r.h,
             r.vvar
      FROM ordered o JOIN rec r ON o.sym = r.sym AND o.rn = r.rn + 1
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(rn AS BIGINT) AS rn,
           CAST(FLOOR(1e6 * h) AS BIGINT) AS hvar_micro
    FROM rec ORDER BY sym, rn LIMIT 500
"""
)


@register("x502_garch_variance", oracle=_X502_ORACLE,
          tags=("timeseries", "finance", "pandas"))
def x502_garch_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GARCH(1,1) conditional variance (variance-targeting ω) over
    hourly volume per symbol; ω is per-key (variance targeting), so the
    fold runs in one applyInPandas with the key's own ω."""
    hourly = _hourly_spark(spark, sf_dir)
    # per-sym variance from exact integer moments (same math as oracle)
    q = hourly.selectExpr(
        "sym", "hkey", "v", "CAST(FLOOR(v * 1e6) AS BIGINT) AS vfp"
    )
    vs = q.groupBy("sym").agg(
        (
            F.sum(F.col("vfp").cast("decimal(18,0)") * F.col("vfp"))
            .cast("double")
            / F.count(F.lit(1)) / F.lit(1e12)
            - F.pow(
                F.sum("vfp").cast("double") / F.count(F.lit(1)) / F.lit(1e6),
                F.lit(2),
            )
        ).alias("vvar")
    )
    # the operator takes a single omega; fold per sym by pre-scaling:
    # h-recursion is linear in omega, so run the fold on v and inject
    # omega per key by joining vvar and using the SAME recurrence shape
    # through a per-key omega column handled inside one applyInPandas —
    # simplest exact route: group-apply with the key's omega.
    import pandas as pd

    joined = q.join(vs, "sym")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hkey")
        vvar = float(pdf["vvar"].iloc[0])
        w = (1.0 - 0.125 - 0.75) * vvar
        h = w / (1.0 - 0.125 - 0.75)
        hs = []
        xprev = 0.0
        first = True
        for x in pdf["v"].tolist():
            if first:
                first = False
            else:
                h = w + 0.125 * (xprev * xprev) + 0.75 * h
            xprev = x
            hs.append(h)
        out = pdf[["sym", "hkey"]].copy()
        out["hvar"] = hs
        return out

    out = joined.groupBy("sym").applyInPandas(
        fold, "sym bigint, hkey bigint, hvar double"
    )
    rn = F.row_number().over(Window.partitionBy("sym").orderBy("hkey"))
    return (
        out.withColumn("rn", rn)
        .select(
            F.col("sym").cast("bigint").alias("sym"),
            F.col("rn").cast("bigint").alias("rn"),
            F.floor(F.lit(1e6) * F.col("hvar")).cast("bigint")
            .alias("hvar_micro"),
        )
        .orderBy("sym", "rn")
        .limit(500)
    )


# -- x503: EWMA correlation ------------------------------------------------------------------

_X503_ORACLE = (
    "WITH RECURSIVE " + _HOURLY_DUCK + """,
    pairs AS (
      SELECT a.hkey, a.sym AS sa, b.sym AS sb, a.v AS av, b.v AS bv
      FROM hourly a JOIN hourly b
        ON a.hkey = b.hkey AND b.sym = a.sym + 1
      WHERE a.sym IN (0, 2, 4)
    ),
    ordered2 AS MATERIALIZED (
      -- MATERIALIZED: x503's recursive member rejoins ordered2 (and
      -- through it the pairs self-join) every level — see the note on
      -- `ordered` above.
      SELECT sa, sb, hkey, av, bv,
             ROW_NUMBER() OVER (PARTITION BY sa ORDER BY hkey) AS rn
      FROM pairs
    ),
    rec AS (
      SELECT sa, sb, rn, av * av AS va, bv * bv AS vb, av * bv AS cab
      FROM ordered2 WHERE rn = 1
      UNION ALL
      SELECT o.sa, o.sb, o.rn,
             0.9375 * r.va + 0.0625 * (o.av * o.av),
             0.9375 * r.vb + 0.0625 * (o.bv * o.bv),
             0.9375 * r.cab + 0.0625 * (o.av * o.bv)
      FROM ordered2 o JOIN rec r ON o.sa = r.sa AND o.rn = r.rn + 1
    )
    SELECT CAST(sa AS BIGINT) AS sym_a, CAST(sb AS BIGINT) AS sym_b,
           CAST(rn AS BIGINT) AS rn,
           CAST(FLOOR(1e9 * CASE WHEN va > 0 AND vb > 0
                                 THEN cab / SQRT(va * vb)
                                 ELSE 0.0 END) AS BIGINT) AS corr_nano
    FROM rec ORDER BY sym_a, rn LIMIT 500
"""
)


@register("x503_ewma_correlation", oracle=_X503_ORACLE,
          tags=("timeseries", "finance", "pandas"))
def x503_ewma_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RiskMetrics EWMA correlation (λ=15/16) for symbol pairs (0,1),
    (2,3), (4,5) over aligned hourly volume
    (operators/timeseries.ewma_correlation)."""
    from aetherium_trader_datapipeline_spark.operators.timeseries import (
        ewma_correlation,
    )

    hourly = _hourly_spark(spark, sf_dir)
    a = hourly.where("sym IN (0, 2, 4)").selectExpr(
        "sym AS sa", "hkey", "v AS av"
    )
    b = hourly.selectExpr("sym AS sb", "hkey", "v AS bv")
    pairs = a.join(
        b, (F.col("sb") == F.col("sa") + 1) & (a["hkey"] == b["hkey"])
    ).select("sa", "sb", a["hkey"].alias("hkey"), "av", "bv")
    out = ewma_correlation(
        pairs, ["sa"], ["hkey"], "av", "bv", out_cols=["sa", "sb", "hkey"]
    )
    rn = F.row_number().over(Window.partitionBy("sa").orderBy("hkey"))
    return (
        out.withColumn("rn", rn)
        .select(
            F.col("sa").cast("bigint").alias("sym_a"),
            F.col("sb").cast("bigint").alias("sym_b"),
            F.col("rn").cast("bigint").alias("rn"),
            F.floor(F.lit(1e9) * F.col("ewma_corr")).cast("bigint")
            .alias("corr_nano"),
        )
        .orderBy("sym_a", "rn")
        .limit(500)
    )
