"""Forty-second extension wave — sketch algebra and graph projection:

x229 hll intersection  HyperLogLog set algebra: per-set registers over the
                       same md5 hash, union by register-wise MAX (the HLL
                       merge), intersection via inclusion-exclusion —
                       alongside the exact answer. Same 64-register
                       deterministic construction as x187 (every 2^-M term
                       exact, order-free).
x230 bipartite projection supplier co-purchase graph from the customer–
                       supplier bipartite edges, with per-customer top-10
                       degree capping — the standard guard against the
                       C(degree,2) fan-out explosion of naive projection.

Scale shapes: x229 reduces each set to 64 register rows before any
estimate math. x230's pair fan-out is C(10,2)=45 per customer by
construction, whatever the raw degree.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_SPARK = {
    "hex8": "CAST(CONV(SUBSTRING(MD5({x}), 1, 8), 16, 10) AS BIGINT)",
    "idiv": "{a} DIV {b}",
    "shl1": "SHIFTLEFT(CAST(1 AS BIGINT), {n})",
}
_DUCK = {
    "hex8": "('0x' || SUBSTRING(MD5({x}), 1, 8))::BIGINT",
    "idiv": "{a} // {b}",
    "shl1": "(CAST(1 AS BIGINT) << {n})",
}

# -- x229: HLL intersection via inclusion-exclusion -------------------------


def _x229(d: dict) -> str:
    hv = d["hex8"].format(x="CAST(user_id AS STRING)")
    pat = d["idiv"].format(a="hv", b="64")
    shl = d["shl1"].format(n="m")
    est = (
        "CASE WHEN (0.709 * 64 * 64 / {z}) <= 160 AND {zz} > 0 "
        "THEN 64 * LN(64.0 / {zz}) ELSE 0.709 * 64 * 64 / {z} END"
    )
    est_s = est.format(z="zsum", zz="zeros")
    return f"""
    WITH sets AS (
      SELECT 'A' AS s, user_id FROM events WHERE event_type = 'click' GROUP BY user_id
      UNION ALL
      SELECT 'B' AS s, user_id FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    h AS (SELECT s, user_id, {hv} AS hv FROM sets),
    reg AS (
      SELECT s, hv % 64 AS idx,
             MAX(CASE WHEN {pat} = 0 THEN 27
                      ELSE 26 - CAST(FLOOR(LOG2(CAST({pat} AS DOUBLE))) AS INT)
                 END) AS m
      FROM h GROUP BY s, hv % 64
    ),
    ureg AS (SELECT idx, MAX(m) AS m FROM reg GROUP BY idx),
    zs AS (
      SELECT s AS tag,
             SUM(1.0 / {shl}) + (64 - COUNT(*)) AS zsum,
             64 - CAST(COUNT(*) AS BIGINT) AS zeros
      FROM reg GROUP BY s
      UNION ALL
      SELECT 'U', SUM(1.0 / {shl}) + (64 - COUNT(*)), 64 - CAST(COUNT(*) AS BIGINT)
      FROM ureg
    ),
    est AS (SELECT tag, {est_s} AS e FROM zs),
    wide AS (
      SELECT MAX(CASE WHEN tag = 'A' THEN e END) AS ea,
             MAX(CASE WHEN tag = 'B' THEN e END) AS eb,
             MAX(CASE WHEN tag = 'U' THEN e END) AS eu
      FROM est
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_i FROM (
        SELECT user_id FROM sets GROUP BY user_id HAVING COUNT(*) = 2
      ) b
    )
    SELECT exact.exact_i,
           ROUND(wide.ea, 2) AS est_a, ROUND(wide.eb, 2) AS est_b,
           ROUND(wide.eu, 2) AS est_union,
           ROUND(wide.ea + wide.eb - wide.eu, 2) AS est_intersection
    FROM wide CROSS JOIN exact
"""


register_sql(
    "x229_hll_intersection",
    spark_sql=_x229(_SPARK),
    duckdb_sql=_x229(_DUCK).replace("CAST(user_id AS STRING)", "CAST(user_id AS VARCHAR)"),
    tags=("sketch", "algebra"),
)

# -- x230: degree-capped bipartite projection -------------------------------

_X230_BODY = """
    WITH cs AS (
      SELECT o.o_custkey AS c, l.l_suppkey AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_custkey, l.l_suppkey
    ),
    capped AS (
      SELECT c, s FROM (
        SELECT c, s, ROW_NUMBER() OVER (PARTITION BY c ORDER BY n DESC, s) AS rk
        FROM cs
      ) r WHERE rk <= 10
    ),
    pairs AS (
      SELECT a.s AS supp_a, b.s AS supp_b, CAST(COUNT(*) AS BIGINT) AS w
      FROM capped a JOIN capped b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT supp_a, supp_b, w
    FROM pairs ORDER BY w DESC, supp_a, supp_b LIMIT 100
"""

register_sql(
    "x230_bipartite_projection",
    spark_sql=_X230_BODY,
    duckdb_sql=_X230_BODY,
    tags=("graph", "join"),
)
