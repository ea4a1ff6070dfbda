"""Fifty-sixth extension wave — econometrics:

x263 price elasticity  log-log OLS slope of quantity on net price per
                       part type (the demand-elasticity estimate), from
                       exact decimal moment sums over 7-dp quantized logs
                       (the x101/x183 float policy)
x264 promo lift (DiD)  difference-in-differences: mean quantity for
                       discounted vs undiscounted lines, before vs after
                       a cutoff date — the 2x2 causal contrast with exact
                       integer/decimal cell sums

Scale shapes: one scan + grouped moment sums each; the DiD is a 4-cell
aggregate.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x263: demand elasticity per part type ----------------------------------

_X263_BODY = """
    WITH obs AS (
      SELECT p.p_type AS ptype,
             CAST(ROUND(LN(l.l_quantity), 7) AS DECIMAL(18,7)) AS ly,
             CAST(ROUND(LN(l.l_extendedprice * (1 - l.l_discount) / l.l_quantity), 7)
                  AS DECIMAL(18,7)) AS lx
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ),
    m AS (
      SELECT ptype, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
             CAST(SUM(lx * ly) AS DOUBLE) AS sxy,
             CAST(SUM(lx * lx) AS DOUBLE) AS sxx
      FROM obs GROUP BY ptype
    )
    SELECT ptype, n,
           CAST(FLOOR(1e6 * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) AS BIGINT)
             AS elasticity_micro
    FROM m WHERE n > 10 ORDER BY ptype
"""

register_sql(
    "x263_price_elasticity",
    spark_sql=_X263_BODY,
    duckdb_sql=_X263_BODY,
    tags=("econometrics", "regression"),
)

# -- x264: promo lift via difference-in-differences -------------------------
# Treatment = discounted line (l_discount > 0.05); period split at
# 1997-01-01. DiD = (treat_post - treat_pre) - (ctrl_post - ctrl_pre) on
# mean quantity. Cell sums are exact decimals; the four means and the
# contrast are a handful of double ops on exact inputs.

_X264_BODY = """
    WITH cells AS (
      SELECT CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END AS treated,
             CASE WHEN o.o_orderdate >= DATE '1997-01-01' THEN 1 ELSE 0 END AS post,
             CAST(l.l_quantity AS DECIMAL(18,2)) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    agg AS (
      SELECT treated, post, CAST(COUNT(*) AS BIGINT) AS n, SUM(q) AS sq
      FROM cells GROUP BY treated, post
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(sq AS DOUBLE) / n END) AS tp,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(sq AS DOUBLE) / n END) AS tb,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(sq AS DOUBLE) / n END) AS cp,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(sq AS DOUBLE) / n END) AS cb,
        CAST(SUM(n) AS BIGINT) AS n_total
      FROM agg
    )
    SELECT n_total,
           CAST(FLOOR(1e6 * (tp - tb)) AS BIGINT) AS treated_delta_micro,
           CAST(FLOOR(1e6 * (cp - cb)) AS BIGINT) AS control_delta_micro,
           CAST(FLOOR(1e6 * ((tp - tb) - (cp - cb))) AS BIGINT) AS did_micro
    FROM wide
"""

register_sql(
    "x264_promo_lift_did",
    spark_sql=_X264_BODY,
    duckdb_sql=_X264_BODY,
    tags=("econometrics", "causal"),
)
