"""Twenty-first extension wave — the stateful-anomaly kernel as a
hash-verified registry key.

x171 runs the ``anomaly_batch`` applyInPandas kernel
(streaming/anomaly.py — the SAME integer-cents kernel the streaming
operator carries across micro-batches via GroupState) over the full
events history and hash-verifies its per-event flags against a DuckDB
window replay of the cross-multiplied 3-sigma inequality. Same
verification pattern as x63's rate-limit kernel: the custom stateful
operator's kernel is pinned to an independent SQL oracle, and the
stream==batch equivalence test (tests/test_streaming.py) extends that
guarantee to the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

_X171_ORACLE = """
    WITH d AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
      FROM events),
    w AS (
      SELECT user_id, event_id, xc,
             COUNT(*) OVER win AS n,
             CAST(SUM(xc) OVER win AS BIGINT) AS s,
             CAST(SUM(xc * xc) OVER win AS BIGINT) AS ss
      FROM d
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id,
           (n >= 20 AND (n * xc - s) * (n * xc - s) > 9 * (n * ss - s * s)) AS flagged
    FROM w ORDER BY user_id, event_id LIMIT 3000
"""


@register("x171_stateful_anomaly", oracle=_X171_ORACLE, tags=("streaming", "stateful", "monitoring"))
def x171_stateful_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.streaming.anomaly import anomaly_batch

    t = load_tables(spark, sf_dir)
    # r14: the groupBy exchange feeding the per-user Python kernel was
    # AQE-coalesced to ~1 task (events are a few MB on disk), serializing
    # all 1 500 user histories through one worker — pre-partitioning by
    # the group key pins the exchange width (user repartitions are not
    # coalesced): 4.6 s → 1.5 s at sf0.1 on local[32]
    p = spark.sparkContext.defaultParallelism * 2
    out = anomaly_batch(
        t["events"].repartition(p, "user_id"),
        key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_col="value",
    )
    return (
        out.select("user_id", "event_id", "flagged")
        .orderBy("user_id", "event_id")
        .limit(3000)
    )


# -- x172: fixed-point integer PageRank -------------------------------------
#
# Random-walk centrality over the customer↔supplier trade graph (bipartite
# edges from orders⨝lineitem, symmetrized). Node ids interleave the two
# key spaces by parity — customers even (2k), suppliers odd (2k+1) — so
# they stay disjoint at ANY scale factor (a fixed additive offset
# collides once custkey outgrows it, ~SF 67 for +10M). The operator (operators/graph.py:pagerank_fixed)
# runs 3 BSP rounds entirely in fixed-point integers, so the DuckDB oracle
# — the same 3 rounds unrolled as CTEs — matches bit-for-bit. Float
# PageRank could never hash-verify: its per-partition sums are
# order-dependent.

_PR_SCALE = 10**12
_PR_ITERS = 3


def _x172_oracle() -> str:
    # Every chained CTE is AS MATERIALIZED: DuckDB re-inlines plain CTEs
    # per reference, and this chain references edges/deg/nodes at every
    # level — the inlined form re-ran the 6 M-row DISTINCT edge build
    # ~2^levels times and filled the sweep host's disk with spill at the
    # sf1 replica (r9 find; same family as the r8 recursive-CTE fixes).
    head = f"""
    WITH e1 AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS MATERIALIZED (SELECT src, dst FROM e1 UNION SELECT dst AS src, src AS dst FROM e1),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst AS node FROM edges),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
    tele AS MATERIALIZED (SELECT (15 * ({_PR_SCALE} // n)) // 100 AS t FROM nn),
    p0 AS MATERIALIZED (SELECT node, {_PR_SCALE} // n AS p FROM nodes CROSS JOIN nn)"""
    its = []
    for i in range(_PR_ITERS):
        its.append(f"""
    sh{i} AS MATERIALIZED (
      SELECT d.src AS s, p.p // d.outdeg AS sh
      FROM p{i} p JOIN deg d ON p.node = d.src),
    p{i + 1} AS MATERIALIZED (
      SELECT nd.node,
             tele.t + (85 * COALESCE(c.c, 0)) // 100 AS p
      FROM nodes nd CROSS JOIN tele
      LEFT JOIN (SELECT e.dst, CAST(SUM(s.sh) AS BIGINT) AS c
                 FROM edges e JOIN sh{i} s ON e.src = s.s
                 GROUP BY e.dst) c ON nd.node = c.dst)""")
    return (
        head + "," + ",".join(its)
        + f"""
    SELECT node, p AS pr FROM p{_PR_ITERS}
    ORDER BY pr DESC, node LIMIT 100
    """
    )


@register("x172_pagerank",
    headline=True, oracle=_x172_oracle(), tags=("graph", "iterative"))
def x172_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.graph import pagerank_fixed

    t = load_tables(spark, sf_dir)
    # r13: symmetrize BEFORE the one distinct instead of
    # distinct → union(reversed) — the union form re-ran the
    # orders⋈lineitem join per branch and paid three dedup shuffles
    # (e1.distinct twice via CTE-style duplication + pagerank's own
    # .distinct); exploding both directions off one join pass yields the
    # identical edge SET (dedup after symmetrize ≡ symmetrize after
    # dedup) with one join and one shuffle (guide §2.4). Second r13 step:
    # run the distinct on the PAIRS, before the 2× explode, so the dedup
    # exchange moves half the rows (guide §2.3 "shuffle fewer bytes";
    # §3.3 "explode before a join multiplies the shuffle"). Distinct
    # pairs ⇒ distinct edges: node ids are parity-disjoint (cust even,
    # supp odd), so the (a,b) and (b,a) branches can never collide and
    # each branch is injective in the pair — pagerank_fixed is told so
    # via assume_distinct. Plan: 2 joins + 3 exchanges → 1 join +
    # 1 half-width exchange before the checkpoint.
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    pr = pagerank_fixed(
        edges,
        iterations=_PR_ITERS,
        scale=_PR_SCALE,
        symmetric=True,
        assume_distinct=True,
    )
    return (
        pr.select("node", F.col("p").alias("pr"))
        .orderBy(F.desc("pr"), "node")
        .limit(100)
    )
