"""Fifty-third extension wave — BI decompositions:

x257 revenue bridge  year-over-year revenue bridge (volume effect at old
                     price + price effect at new volume) over parts sold
                     in both years — the waterfall decomposition; exact
                     decimal revenues, floored-micro effect terms
x258 abc class       ABC inventory classification (A ≤ 80% cumulative
                     revenue share, B ≤ 95%, else C) with per-class
                     part counts and revenue

Scale shapes: both aggregate per part first; x258's window runs over
|parts| rows.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x257: revenue bridge ----------------------------------------------------

_X257_FMT = """
    WITH py AS (
      SELECT l.l_partkey AS pk,
             CAST({yr} AS INT) AS yr,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS q,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS r
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
      GROUP BY l.l_partkey, CAST({yr} AS INT)
    ),
    both_years AS (
      SELECT a.pk,
             CAST(a.q AS DOUBLE) AS q1, CAST(a.r AS DOUBLE) AS r1,
             CAST(b.q AS DOUBLE) AS q2, CAST(b.r AS DOUBLE) AS r2,
             a.r AS r1d, b.r AS r2d
      FROM py a JOIN py b ON a.pk = b.pk AND a.yr = 1996 AND b.yr = 1997
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(r1d) AS DOUBLE), 4) AS rev_1996,
           ROUND(CAST(SUM(r2d) AS DOUBLE), 4) AS rev_1997,
           ROUND(CAST(SUM(r2d) - SUM(r1d) AS DOUBLE), 4) AS delta_exact,
           CAST(FLOOR(SUM((q2 - q1) * (r1 / q1))) AS BIGINT) AS volume_effect_floor,
           CAST(FLOOR(SUM(((r2 / q2) - (r1 / q1)) * q2)) AS BIGINT) AS price_effect_floor
    FROM both_years
"""

register_sql(
    "x257_revenue_bridge",
    spark_sql=_X257_FMT.format(yr="EXTRACT(YEAR FROM o.o_orderdate)"),
    duckdb_sql=_X257_FMT.format(yr="EXTRACT(year FROM o.o_orderdate)"),
    tags=("bi", "decomposition", "join"),
)

# -- x258: ABC classification ------------------------------------------------

_X258_BODY = """
    WITH pr AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    bounds AS (SELECT MIN(r) AS lo, MAX(r) AS hi FROM pr),
    chunked AS (
      -- value-range chunking (x198/x238/x498 family): ck ascends as r
      -- DESCENDS, so (ck, r DESC, pk) is the original total order; the
      -- Lorenz cumsum runs PARTITIONED by the <=1000-chunk id instead of
      -- pushing every part through one task (the x442 class)
      SELECT p.pk, p.r,
             CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST(FLOOR(CAST(b.hi - p.r AS DOUBLE) * 1000
                                        / CAST(b.hi - b.lo AS DOUBLE))
                                  AS BIGINT), CAST(999 AS BIGINT)) END AS ck
      FROM pr p CROSS JOIN bounds b
    ),
    wrk AS (
      SELECT ck, pk, r,
             SUM(r) OVER (PARTITION BY ck ORDER BY r DESC, pk
                          ROWS UNBOUNDED PRECEDING) AS cum_in
      FROM chunked
    ),
    offs AS (
      -- prefix revenue offsets over the <=1000-row chunk grid
      SELECT ck,
             COALESCE(SUM(src) OVER (ORDER BY ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(38,4))) AS rev_off,
             SUM(src) OVER () AS tot_r
      FROM (SELECT ck, CAST(SUM(r) AS DECIMAL(38,4)) AS src
            FROM chunked GROUP BY ck)
    ),
    classed AS (
      SELECT w.pk, w.r,
             CASE WHEN CAST(o.rev_off + w.cum_in AS DOUBLE)
                       <= 0.80 * CAST(o.tot_r AS DOUBLE) THEN 'A'
                  WHEN CAST(o.rev_off + w.cum_in AS DOUBLE)
                       <= 0.95 * CAST(o.tot_r AS DOUBLE) THEN 'B'
                  ELSE 'C' END AS abc
      FROM wrk w JOIN offs o ON w.ck = o.ck
    )
    SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(r) AS DOUBLE), 4) AS revenue
    FROM classed GROUP BY abc ORDER BY abc
"""

register_sql(
    "x258_abc_class",
    spark_sql=_X258_BODY,
    duckdb_sql=_X258_BODY,
    tags=("bi", "window"),
)
