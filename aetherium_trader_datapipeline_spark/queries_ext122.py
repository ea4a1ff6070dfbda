"""Wave 122 (x439–x441): optimizer statistics & experiment planning.

x439 — ANALYZE-style column statistics for l_quantity: the top-10
most-common values (MCVs, exact counts, value-tiebroken) plus
equi-depth decile boundaries computed over the REMAINING values by
exact rank selection — the two-part histogram a cost-based optimizer
stores.  Emitted as a uniform (stat_kind, idx, value, cnt) table.

x440 — functional-dependency strength between low-cardinality column
pairs: 1 − H(Y|X)/H(Y) from exact contingency counts; each entropy term
−(c/n)·ln(c/n) is one IEEE expression 1e12-quantized before the
bounded cross-cell sum.  FD ≈ 1 flags columns an optimizer can treat as
implied (and a modeler should not double-count).

x441 — two-proportion power analysis per event_type: with the observed
share as baseline p1 and a 10% relative MDE, the required per-arm
sample is (z_{α/2}+z_β)²·(p1q1+p2q2)/(p2−p1)² at the conventional
z = 1.96/0.84 constants; the feasible flag compares against the traffic
actually observed.  The pre-experiment sibling of x416's SRM and
x358's post-hoc test.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x439: MCV + equi-depth column stats --------------------------------------------

_X439 = """
    WITH counts AS (
      SELECT l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_quantity
    ),
    mcv AS (
      SELECT v, c, ROW_NUMBER() OVER (ORDER BY c DESC, v) AS rk
      FROM counts
    ),
    rest AS (
      -- equi-depth deciles over the non-MCV remainder, by exact rank
      SELECT v, c,
             SUM(c) OVER (ORDER BY v) AS cum,
             SUM(c) OVER () AS tot
      FROM mcv WHERE rk > 10
    ),
    boundaries AS (
      SELECT d.idx,
             MIN(r.v) AS v
      FROM rest r
      JOIN (SELECT 1 AS idx UNION ALL SELECT 2 UNION ALL SELECT 3
            UNION ALL SELECT 4 UNION ALL SELECT 5 UNION ALL SELECT 6
            UNION ALL SELECT 7 UNION ALL SELECT 8 UNION ALL SELECT 9) d
        ON r.cum * 10 >= d.idx * r.tot
      GROUP BY d.idx
    )
    SELECT 'mcv' AS stat_kind, CAST(rk AS BIGINT) AS idx,
           ROUND(v, 2) AS value, c AS cnt
    FROM mcv WHERE rk <= 10
    UNION ALL
    SELECT 'equi_depth_boundary', CAST(idx AS BIGINT), ROUND(v, 2),
           CAST(NULL AS BIGINT)
    FROM boundaries
    ORDER BY stat_kind, idx
"""

register_sql(
    "x439_mcv_stats",
    spark_sql=_X439,
    duckdb_sql=_X439,
    tags=("profiling", "planning"),
)

# -- x440: functional-dependency strength --------------------------------------------

_X440_PAIR = """
      SELECT '{name}' AS pair, {x} AS xv, {y} AS yv,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {tbl} GROUP BY {x}, {y}
"""

_X440 = """
    WITH cells AS (
      {p1}
      UNION ALL
      {p2}
      UNION ALL
      {p3}
      UNION ALL
      {p4}
    ),
    sized AS (
      SELECT pair, xv, yv, c,
             SUM(c) OVER (PARTITION BY pair) AS n,
             SUM(c) OVER (PARTITION BY pair, xv) AS nx,
             SUM(c) OVER (PARTITION BY pair, yv) AS ny
      FROM cells
    ),
    terms AS (
      SELECT pair,
             -- H(Y|X) cell term and, scaled to avoid double count,
             -- H(Y) term weighted by the cell's share of its y-group
             CAST(FLOOR(-(CAST(c AS DOUBLE) / n)
                        * LN(CAST(c AS DOUBLE) / nx) * 1e12) AS BIGINT)
               AS hyx_fp,
             CAST(FLOOR(-(CAST(c AS DOUBLE) / n)
                        * LN(CAST(ny AS DOUBLE) / n) * 1e12) AS BIGINT)
               AS hy_fp
      FROM sized
    ),
    ent AS (
      SELECT pair,
             CAST(SUM(hyx_fp) AS BIGINT) AS hyx,
             CAST(SUM(hy_fp) AS BIGINT) AS hy
      FROM terms GROUP BY pair
    )
    SELECT pair,
           ROUND(hy / 1e12, 6) AS h_y,
           ROUND(hyx / 1e12, 6) AS h_y_given_x,
           CASE WHEN hy > 0
                THEN ROUND(1 - CAST(hyx AS DOUBLE) / hy, 6)
                ELSE 1.0 END AS fd_strength
    FROM ent ORDER BY pair
"""


def _x440_sql() -> str:
    return _X440.format(
        p1=_X440_PAIR.format(
            name="returnflag_to_linestatus", x="l_returnflag",
            y="l_linestatus", tbl="lineitem",
        ),
        p2=_X440_PAIR.format(
            name="orderstatus_to_priority", x="o_orderstatus",
            y="o_orderpriority", tbl="orders",
        ),
        p3=_X440_PAIR.format(
            name="lang_to_source", x="lang", y="source", tbl="documents",
        ),
        p4=_X440_PAIR.format(
            name="source_to_lang", x="source", y="lang", tbl="documents",
        ),
    )


register_sql(
    "x440_functional_dependency",
    spark_sql=_x440_sql(),
    duckdb_sql=_x440_sql(),
    tags=("profiling", "stats"),
)

# -- x441: two-proportion power plan ---------------------------------------------------

_X441 = """
    WITH base AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
      FROM events GROUP BY event_type
    ),
    rates AS (
      SELECT event_type, n_events,
             CAST(n_events AS DOUBLE) / n_total AS p1,
             CAST(n_events AS DOUBLE) / n_total * 1.1 AS p2
      FROM base
    )
    SELECT event_type, n_events,
           ROUND(p1, 6) AS baseline_rate,
           ROUND(p2, 6) AS target_rate,
           CAST(CEIL(POWER(1.96 + 0.84, 2)
                     * (p1 * (1 - p1) + p2 * (1 - p2))
                     / POWER(p2 - p1, 2)) AS BIGINT) AS n_per_arm,
           CASE WHEN CEIL(POWER(1.96 + 0.84, 2)
                          * (p1 * (1 - p1) + p2 * (1 - p2))
                          / POWER(p2 - p1, 2)) * 2 <= n_events
                THEN 1 ELSE 0 END AS feasible_with_observed_traffic
    FROM rates ORDER BY event_type
"""

register_sql(
    "x441_ab_power_plan",
    spark_sql=_X441,
    duckdb_sql=_X441,
    tags=("experiment", "planning"),
)
