"""Thirty-second extension wave — statistical modeling over the tick-shaped
`events` table, extending the financial wave (ext27) with distributional
statistics and a two-variable recurrence:

x196 Holt linear smoothing  exact double-exponential (level+trend) per key —
                            the two-state generalization of x77's EMA fold
                            (operators/timeseries.py), recursive-CTE oracle
x197 two-sample KS test     exact Kolmogorov-Smirnov D between click/error
                            value distributions, tie-correct via group-by-
                            value ECDF steps
x198 Gini coefficient       inequality of per-user total value, exact
                            decimal rank-sum form

Hash-stability discipline as ext27: counts and rank products accumulate in
BIGINT/DECIMAL (order-free, exact); per-row double math (division, ABS) is
IEEE-identical across engines; final outputs ROUND(..., 6).

Scale shapes: x196 is one hash exchange + streaming fold (key count
parallelizes; see timeseries.py). x197 aggregates to |distinct rounded
values| rows before its window — the window input is the *support* of the
distribution, not the data. x198's rank-sum runs value-range-CHUNKED
(r11): within-chunk ranks are partitioned windows, global ranks come from
prefix offsets over the <=1000-row chunk grid, and SUM(rk*x) decomposes
exactly into within-chunk products plus offset*chunk-sum — the
range-partitioned sort + per-partition offset (zipWithIndex) shape,
expressed in SQL so the oracle pairs bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables


@register(
    "x196_holt_linear",
    headline=True,
    # Same fold expressed as a two-state recursive CTE. IEEE op order
    # mirrors timeseries.holt_linear exactly: 0.5*x + 0.5*(l+t), then
    # 0.25*(l_new-l) + 0.75*t.
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, event_id, ROUND(value, 4) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    rec AS (
      SELECT user_id, event_id, rn, v AS l, CAST(0.0 AS DOUBLE) AS t
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.event_id, o.rn,
             0.5 * o.v + 0.5 * (r.l + r.t),
             0.25 * ((0.5 * o.v + 0.5 * (r.l + r.t)) - r.l) + 0.75 * r.t
      FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
    SELECT event_id,
           CAST(FLOOR(1e4 * l) AS BIGINT) AS level_bp,
           CAST(FLOOR(1e4 * t) AS BIGINT) AS trend_bp,
           CAST(FLOOR(1e4 * (l + t)) AS BIGINT) AS fc_bp
    FROM rec ORDER BY event_id LIMIT 500
    """,
    tags=("timeseries", "window", "pandas"),
)
def x196_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Holt linear-trend smoothing — one shuffle, O(1) fold state."""
    from aetherium_trader_datapipeline_spark.operators.timeseries import holt_linear

    t = load_tables(spark, sf_dir)
    src = t["events"].select(
        "user_id", "event_id", "ts", F.round("value", 4).alias("v")
    )
    out = holt_linear(src, ["user_id"], ["ts", "event_id"], "v", out_cols=["event_id"])
    # Floored basis-point integers, not ROUND: the fold doubles are
    # bit-identical across engines, and FLOOR of an identical double is
    # engine-identical, while ROUND tie-breaks can differ (the x79_twap
    # lesson; ROUND here cost 2/500 rows a last-digit mismatch).
    bp = lambda c: F.floor(F.lit(1e4) * F.col(c)).cast("bigint")  # noqa: E731
    return (
        out.select(
            "event_id",
            bp("level").alias("level_bp"),
            bp("trend").alias("trend_bp"),
            bp("fc").alias("fc_bp"),
        )
        .orderBy("event_id")
        .limit(500)
    )


# -- x197: exact two-sample Kolmogorov-Smirnov ------------------------------
# ECDF steps are evaluated per DISTINCT rounded value (tie-correct: both
# samples' masses at a tied value land before the sup is taken), so the
# window input is the distribution's support, not the row stream. Counts
# are exact integers; D is a MAX over per-row double ratios (order-free).

_X197_BODY = """
    WITH s AS (
      SELECT ROUND(value, 2) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'error')
    ),
    tot AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(SUM(1 - is_a) AS BIGINT) AS nb
      FROM s
    ),
    byv AS (
      SELECT v, CAST(SUM(is_a) AS BIGINT) AS ca,
             CAST(SUM(1 - is_a) AS BIGINT) AS cb
      FROM s GROUP BY v
    ),
    cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM byv
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           ROUND(MAX(ABS(CAST(c.cum_a AS DOUBLE) / t.na
                         - CAST(c.cum_b AS DOUBLE) / t.nb)), 6) AS ks_d
    FROM cum c CROSS JOIN tot t
    GROUP BY t.na, t.nb
"""

register_sql(
    "x197_ks_test",
    spark_sql=_X197_BODY,
    duckdb_sql=_X197_BODY,
    tags=("stats", "window"),
)

# -- x198: Gini coefficient of per-user total value -------------------------
# Rank-sum identity G = 2*Σ(rk*x)/(n*Σx) - (n+1)/n over ascending-sorted
# totals; rk*x products accumulate in DECIMAL (exact), the closed form is
# four double ops on exact inputs. Tie-break rank by user_id: total order,
# deterministic. (Σ rk*x is rank-permutation-sensitive only across equal x,
# where permutations cannot change the sum — the tie-break is for engine
# determinism, not correctness.)

_X198_BODY = """
    WITH peru AS (
      SELECT user_id,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS x
      FROM events GROUP BY user_id
    ),
    bounds AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM peru),
    chunked AS (
      -- value-range chunking (the x498 boundary-handoff family): rank
      -- windows run PARTITIONED by a monotone-in-x chunk id (<=1000
      -- chunks), so no task ever sees more than its value band; the
      -- per-user relation never crosses one task the way the r10-era
      -- global ROW_NUMBER did (the x442 class).  Global rank rk =
      -- chunk count-offset + within-chunk rank, so SUM(rk*x) decomposes
      -- exactly: sum(r_in*x) + off*sum(x) per chunk, all DECIMAL-exact.
      SELECT p.user_id, p.x,
             CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST(FLOOR(CAST(p.x - b.lo AS DOUBLE) * 1000
                                        / CAST(b.hi - b.lo AS DOUBLE))
                                  AS BIGINT), CAST(999 AS BIGINT)) END AS ck
      FROM peru p CROSS JOIN bounds b
    ),
    wrk AS (
      SELECT ck, x,
             ROW_NUMBER() OVER (PARTITION BY ck ORDER BY x, user_id) AS r_in
      FROM chunked
    ),
    per_chunk AS (
      SELECT ck, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(x) AS DECIMAL(38,2)) AS sxc,
             CAST(SUM(r_in * x) AS DECIMAL(38,2)) AS srxc
      FROM wrk GROUP BY ck
    ),
    offs AS (
      -- prefix offsets over the <=1000-row chunk grid
      SELECT ck, c, sxc, srxc,
             COALESCE(SUM(c) OVER (ORDER BY ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS BIGINT)) AS off
      FROM per_chunk
    ),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(sxc) AS DOUBLE) AS sx,
             CAST(SUM(srxc + CAST(off AS DECIMAL(18,0)) * sxc) AS DOUBLE)
               AS srx
      FROM offs
    )
    SELECT n, ROUND(sx, 2) AS total_value,
           ROUND(2 * srx / (n * sx) - (n + 1.0) / n, 6) AS gini
    FROM agg
"""

register_sql(
    "x198_gini",
    spark_sql=_X198_BODY,
    duckdb_sql=_X198_BODY,
    tags=("stats", "window"),
)
