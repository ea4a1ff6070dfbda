"""Forty-sixth extension wave — join/rollup/window-surface completions:

x239 band join     non-equi banded join turned into an equi join: both
                   sides map to an integer band id (FLOOR(value/width)),
                   the join is then hash-partitionable — the standard
                   rewrite that keeps a range join off the BNLJ path
x240 time rollup   day/month/year rollup in ONE pass via GROUPING SETS
                   with GROUPING() labels — the time-hierarchy cube
x241 rank fns      PERCENT_RANK and CUME_DIST (the two rank-family
                   window functions not yet exercised anywhere in the
                   registry), floored micro for cross-engine ties

Scale shapes: x239 is a plain hash join on the band id (dim side is 10
rows); x240 is one aggregation producing all three grains (partial aggs
shared); x241 is one window pass per key.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x239: banded equi-join --------------------------------------------------

_X239_BODY = """
    WITH bands AS (
      SELECT CAST(b AS BIGINT) AS band_id,
             CAST(b * 10 AS BIGINT) AS lo, CAST((b + 1) * 10 AS BIGINT) AS hi,
             CASE WHEN b < 3 THEN 'low' WHEN b < 7 THEN 'mid' ELSE 'high' END AS tier
      FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9)) t(b)
    ),
    e AS (
      SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS band_id, value
      FROM events WHERE value >= 0 AND value < 100
    )
    SELECT b.tier, e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(e.value, 2) AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM e JOIN bands b ON e.band_id = b.band_id
    GROUP BY b.tier, e.event_type
    ORDER BY b.tier, e.event_type
"""

register_sql(
    "x239_band_join",
    spark_sql=_X239_BODY,
    duckdb_sql=_X239_BODY,
    tags=("join", "banding"),
)

# -- x240: time-hierarchy rollup via GROUPING SETS --------------------------

_X240_FMT = """
    SELECT CAST(GROUPING({y}) AS INT) AS g_year,
           CAST(GROUPING({m}) AS INT) AS g_month,
           CAST(GROUPING({d}) AS INT) AS g_day,
           {y} AS yr, {m} AS mo, {d} AS dy,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS (({y}, {m}, {d}), ({y}, {m}), ({y}))
    ORDER BY yr NULLS FIRST, mo NULLS FIRST, dy NULLS FIRST
    LIMIT 400
"""


def _x240(y: str, m: str, d: str) -> str:
    return _X240_FMT.format(y=y, m=m, d=d)


register_sql(
    "x240_time_rollup",
    spark_sql=_x240(
        "CAST(YEAR(o_orderdate) AS BIGINT)",
        "CAST(MONTH(o_orderdate) AS BIGINT)",
        "CAST(DAY(o_orderdate) AS BIGINT)",
    ),
    duckdb_sql=_x240(
        "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)",
        "CAST(EXTRACT(month FROM o_orderdate) AS BIGINT)",
        "CAST(EXTRACT(day FROM o_orderdate) AS BIGINT)",
    ),
    tags=("olap", "rollup"),
)

# -- x241: percent_rank / cume_dist -----------------------------------------

_X241_BODY = """
    SELECT c_nationkey, c_custkey,
           CAST(FLOOR(1e6 * PERCENT_RANK() OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal, c_custkey)) AS BIGINT) AS pctrank_micro,
           CAST(FLOOR(1e6 * CUME_DIST() OVER (PARTITION BY c_nationkey
                ORDER BY c_acctbal, c_custkey)) AS BIGINT) AS cumedist_micro
    FROM customer
    ORDER BY c_nationkey, c_custkey LIMIT 400
"""

register_sql(
    "x241_rank_fns",
    spark_sql=_X241_BODY,
    duckdb_sql=_X241_BODY,
    tags=("window", "functions"),
)
