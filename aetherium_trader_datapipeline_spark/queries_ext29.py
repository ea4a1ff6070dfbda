"""Twenty-ninth extension wave — graph topology analytics over the trade
graph, complementing x72/x73 (connected components) and x172 (PageRank).

Both keys project the orders⨝lineitem bipartite relation into a
supplier–supplier graph and stay in exact integer arithmetic until one
final division, so they hash-verify. Plans are pure equality joins —
no iteration, no driver collects.

x189 triangle census   edge-edge-edge join with a<b<c id ordering (each
                       triangle enumerated exactly once) + global
                       clustering coefficient 6T / Σd(d-1). The per-order
                       supplier fan-out is bounded (≤7 lineitems/order),
                       so the projected edge list grows linearly in
                       orders; the standard scale refinement — ordering
                       endpoints by (degree, id) instead of id to cap the
                       wedge join on hub nodes — is noted for the dense-
                       graph regime but unnecessary at these SFs.
x190 neighbor jaccard  supplier similarity by shared-customer sets:
                       intersection via one equality self-join on
                       customer, union by inclusion-exclusion from exact
                       degrees — the same candidate-generation shape as
                       the LSH dedup paths (no all-pairs scan).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_X189_BODY = """
    WITH so AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.s AS a, b.s AS b
      FROM so a JOIN so b ON a.ok = b.ok AND a.s < b.s
    ),
    deg AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT a AS s FROM e UNION ALL SELECT b AS s FROM e) u GROUP BY s
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t
      FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    wedges AS (SELECT CAST(SUM(d * (d - 1)) AS BIGINT) AS w2 FROM deg)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           t AS n_triangles,
           ROUND(CAST(6 AS DOUBLE) * t / w2, 6) AS global_clustering
    FROM tri CROSS JOIN wedges
"""

register_sql(
    "x189_triangle_census",
    spark_sql=_X189_BODY,
    duckdb_sql=_X189_BODY,
    tags=("graph",),
)

_X190_BODY = """
    WITH sc AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM sc GROUP BY s),
    inter AS (
      SELECT a.s AS sa, b.s AS sb, CAST(COUNT(*) AS BIGINT) AS shared
      FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT i.sa, i.sb, i.shared, da.d AS deg_a, db.d AS deg_b,
           ROUND(CAST(i.shared AS DOUBLE) / (da.d + db.d - i.shared), 6) AS jaccard
    FROM inter i JOIN deg da ON i.sa = da.s JOIN deg db ON i.sb = db.s
    ORDER BY jaccard DESC, sa, sb LIMIT 20
"""

register_sql(
    "x190_neighbor_jaccard",
    spark_sql=_X190_BODY,
    duckdb_sql=_X190_BODY,
    tags=("graph", "similarity"),
)
