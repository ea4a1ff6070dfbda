"""Connected components over a pair/edge DataFrame — the clustering step of
near-duplicate document removal (candidate pairs from MinHash LSH / n-gram
Jaccard / SimHash → duplicate *clusters* → one canonical survivor each).

The reference has no graph operator; this is part of the training-data
extension surface (same family as operators/dedup.py).

Algorithm: min-label propagation with pointer jumping (path halving).
Each iteration does (1) a neighbor-min round — every node adopts the
smallest label among itself and its neighbors — and (2) a pointer-jump
round — every node re-reads the label *of its label*. Jumping makes label
chains collapse geometrically, so convergence is O(log diameter)
iterations instead of O(diameter); each iteration is two equality-join
shuffles on node id, both AQE-coalesced. This is the standard
Hash-Min/pointer-jumping CC formulation for bulk-synchronous engines.

Scale notes (100 TB): state is one (node, label) row per vertex —
never adjacency materialized per node; iterations are checkpointed
(``localCheckpoint``) to truncate lineage so plan size stays constant;
the convergence probe is a single label-sum aggregate (labels only
decrease, so the sum strictly decreases until fixpoint). Edges are
deduplicated and symmetrized once up front.

Size-adaptive execution, two levels (algorithms switching on measured
size is the same posture as AQE):

1. **Small-graph fast path** (≤ ``local_threshold_edges`` distinct
   edges): one union-find pass in a single ``applyInPandas`` task.
   Candidate graphs from LSH/shingle blocking are near-dup-sparse —
   typically millions of edges even for petabyte corpora — and a single
   O(E α(E)) task beats any bulk-synchronous loop by an order of
   magnitude. This is a *task*, not a driver collect: the edge list
   flows executor→executor as one Arrow batch.
2. **Distributed loop** (above the threshold): the pointer-jumping
   iteration, with per-iteration join strategy chosen by node count —
   checkpointed DataFrames lose Catalyst stats, so without help every
   join falls back to a shuffle join even when the label table is tiny;
   under ``broadcast_threshold_rows`` the label side is broadcast.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_local(e: DataFrame) -> DataFrame:
    """Whole-graph union-find in one Arrow task (small-graph fast path)."""
    typ = e.schema["u"].dataType.simpleString()

    def uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf["u"], pdf["v"]):
            parent[find(a)] = find(b)
        members: dict = {}
        for n in list(parent):
            members.setdefault(find(n), []).append(n)
        rows = [
            (n, m)
            for ns in members.values()
            for m in [min(ns)]
            for n in ns
        ]
        return pd.DataFrame(rows, columns=["node", "component"])

    return (
        e.groupBy(F.lit(1).alias("g"))
        .applyInPandas(
            lambda _, pdf: uf(pdf), f"node {typ}, component {typ}"
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    broadcast_threshold_rows: int = 500_000,
    local_threshold_edges: int = 5_000_000,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    Isolated endpoints (nodes appearing in edges only) are included;
    nodes not present in ``edges`` at all are absent — union them in with
    component = own id if the full vertex set is needed.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        # lazy checkpoint (r13): the path-deciding count below is the
        # first action, so it materializes the distinct edge list as a
        # side effect — the local union-find pass (and the distributed
        # path's sym build) then reads the stored partitions instead of
        # re-running the (possibly join-derived) dedup a second time.
        .localCheckpoint(eager=False)
    )
    if e.count() <= local_threshold_edges:
        return _union_find_local(e)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).localCheckpoint()
    # seed with min(self, neighbors) — one propagation round for free
    labels = sym.groupBy(F.col("u").alias("node")).agg(
        F.least(F.min("v"), F.min("u")).alias("lbl")
    ).localCheckpoint()
    # node count is invariant across iterations — decide the per-iteration
    # join strategy once (checkpointed frames have no stats, so AQE alone
    # would never pick broadcast here)
    n_nodes = labels.count()
    bc = F.broadcast if n_nodes <= broadcast_threshold_rows else (lambda d: d)
    if n_nodes > broadcast_threshold_rows:
        # large-graph path (label side too big to broadcast): hash-
        # partition the STATIC symmetrized edge list by the join key once
        # — LogicalRDD preserves outputPartitioning through the
        # checkpoint, so each round's neighbor-min join reshuffles only
        # the |V|-row label frame, never the |E|-row edge list (the x297
        # r7 lesson, 111 s → 2.3 s at the 100× replica)
        sym = sym.repartition(F.col("v")).localCheckpoint(eager=False)

    def _lbl_sum(lb: DataFrame) -> int:
        # labels only decrease, so the exact sum strictly decreases until
        # the fixpoint — a narrow one-job convergence probe (no join).
        return int(lb.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0])

    prev_sum = _lbl_sum(labels)
    for _ in range(max_iter):
        nbr_min = sym.join(bc(labels), sym["v"] == labels["node"]).select(
            sym["u"].alias("node"), F.col("lbl")
        )
        stepped = (
            nbr_min.union(labels).groupBy("node").agg(F.min("lbl").alias("lbl"))
        )
        # pointer jump: lbl <- lbl(lbl). Labels only decrease, so the jump
        # target's label is always <= our own — min() keeps it monotone.
        jump_src = stepped.select(F.col("node").alias("jn"), F.col("lbl").alias("jl"))
        labels = (
            stepped.join(bc(jump_src), stepped["lbl"] == jump_src["jn"], "left")
            .select("node", F.least(F.col("lbl"), F.coalesce("jl", "lbl")).alias("lbl"))
            .localCheckpoint()
        )
        cur_sum = _lbl_sum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("node", F.col("lbl").alias("component"))


def dedup_clusters(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """(id, canonical_id) for every doc appearing in a near-dup pair; the
    canonical survivor is the minimum id of the doc's duplicate cluster.
    Downstream dedup = anti-join docs against rows where id != canonical_id."""
    cc = connected_components(pairs, src=a, dst=b)
    return cc.select(F.col("node").alias("id"), F.col("component").alias("canonical_id"))


def kcore_counts(
    edges: DataFrame,
    k: int = 4,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> list[tuple[int, int, int]]:
    """K-core peeling round summary: [(round, n_nodes, n_edges)].

    PRECONDITION: ``edges`` must be a SYMMETRIZED edge list (every
    undirected edge present in both directions, as x212 builds). Residual
    degree is measured as out-degree (``groupBy(src)``) and survivors are
    counted from the src side — correct exactly when src-degree ==
    total-degree, i.e. on symmetric input. An asymmetric edge list gives
    silently wrong k-cores: dst-only nodes never receive a degree.

    Each round keeps nodes with residual degree >= k and restricts edges
    to survivors on both ends. The edge list is localCheckpoint'ed once
    up front and after every round — the pagerank_fixed lesson: without
    it, every downstream reference replans the (possibly join-derived)
    edge derivation, which measured 11.9 s vs ~1 s at sf0.1 for the
    unrolled-CTE form of x212. Survivor sets are broadcast while small
    (same n-gated posture as pagerank_fixed); only 2 scalars per round
    cross the driver.
    """
    # lazy checkpoints throughout (r13): every checkpoint here is followed
    # immediately by a .count() on itself (or a derivation of it), so the
    # count job materializes the stored partitions as a side effect — the
    # eager form ran a dedicated materialization job first (the
    # pagerank_fixed/connected_components job-diet lesson).
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out = [(0, e.select("src").distinct().count(), e.count())]
    cur = e
    for r in range(1, rounds + 1):
        deg = cur.groupBy("src").agg(F.count("*").alias("deg"))
        keep = (
            deg.where(F.col("deg") >= k)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=False)
        )
        n_keep = keep.count()
        _b = F.broadcast if n_keep <= 1_000_000 else (lambda df: df)
        nxt = (
            cur.join(_b(keep.withColumnRenamed("node", "src")), "src")
            .join(_b(keep.withColumnRenamed("node", "dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        out.append((r, n_keep, nxt.count()))
        cur = nxt
    return out


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
    n_nodes: int | None = None,
    symmetric: bool = False,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-point integer PageRank (damping 0.85), ``iterations`` rounds.

    All arithmetic is integer: ranks live at ``scale`` fixed-point, each
    contribution is ``p DIV outdeg`` and the damped sum is
    ``(85 * Σcontrib) DIV 100`` — truncating division on non-negative
    ints agrees between Spark (DIV) and DuckDB (//), so the result is
    engine-exact and hash-verifiable (x172), unlike float PageRank whose
    per-partition double sums are order-dependent. The truncation error
    is ≤ outdeg per node per round — at scale=1e12, noise in the 12th
    digit, irrelevant for ranking.

    Scale shape: per iteration one equality-join shuffle (share × edges)
    plus one groupBy(dst) agg — the standard BSP PageRank round; rank
    state is one row per node. ``n_nodes`` avoids the count job when the
    caller already knows it (same contract as similarity.py's ``n``).
    Fixed iteration count keeps the plan finite for Catalyst (the x139
    k-means posture); convergence-probe loops belong to the caller.

    ``symmetric=True`` is a caller-asserted fast path: it requires EVERY
    node to have at least one in-edge (true for symmetrized graphs, where
    in-edges == out-edges). It skips the nodes left-join, so on a graph
    with in-edge-less nodes it SHRINKS the output node set instead of
    erroring — pass it only when the input is genuinely symmetrized.
    """
    # materialize the (possibly join-derived) edge list ONCE — every frame
    # below re-reads it, and three BSP rounds would otherwise recompute the
    # upstream join per reference (measured 8.8 s → 2.9 s at sf0.1).
    # ``assume_distinct=True`` is a caller-asserted contract that the edge
    # rows are already unique (e.g. dedup ran upstream on a pre-explode
    # form half the size — the r13 x172 shape); the fixed-point iteration
    # itself REQUIRES uniqueness (duplicate edges double-count
    # contributions), so only pass it when dedup really happened.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    # LAZY checkpoint (r13): the eager form ran the whole edge build as a
    # dedicated materialization job before any consumer; lazily the first
    # consumer job (deg.count() below on the symmetric path, the nodes
    # checkpoint on the general path) materializes e as a side effect —
    # one driver job instead of two, same stored partitions either way.
    e = e.localCheckpoint(eager=False)
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # name-based equi-joins throughout: every frame below re-derives from
    # ``e``, and attribute-based conditions trip Spark's ambiguous-self-join
    # check on shared lineage
    # deg is joined once per round (plus the p init in the symmetric case);
    # a lazy checkpoint computes the aggregation once instead of per
    # reference
    deg = outdeg.withColumnRenamed("src", "node").localCheckpoint(eager=False)
    if symmetric:
        # symmetrized graph: every node appears as a src, so the node set
        # IS the degree frame's key set — skip the union+distinct+
        # checkpoint the general case needs. Derive nodes (and the p init
        # below) from the CHECKPOINTED deg, not the raw aggregation:
        # otherwise round 1's p side re-runs the groupBy a second time.
        nodes = deg.select("node")
    else:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
    if n_nodes is not None:
        n = n_nodes
    elif symmetric:
        # counting deg (|nodes| rows) materializes e AND deg in the same
        # job the count needs anyway — the nodes.count() form ran the
        # outdeg aggregation once for the count and again when deg's
        # checkpoint materialized in round 1 (r13: 3 jobs -> 1).
        n = deg.count()  # bounded scalar
    else:
        n = nodes.count()  # bounded scalar
    base = scale // n
    tele = (15 * base) // 100
    # checkpointed frames lose Catalyst stats (graph.py:110-114 posture):
    # broadcast the node-sized sides explicitly while the built hash
    # relation stays tens of MB (row count bounds rows, not JVM bytes —
    # 5M-row relations already risk driver pressure across 9 broadcasts)
    small = n <= 1_000_000
    _b = F.broadcast if small else (lambda df: df)
    if symmetric and n_nodes is not None and not small:
        # Pin deg's lazy checkpoint before round 1 (ADVICE r13): on the
        # large-graph symmetric path with a caller-supplied n_nodes no
        # earlier job materializes deg, and round 1's join reaches it from
        # two subtrees (p init and the probe side), so the outdeg groupBy
        # could run twice concurrently before the first cached write
        # lands. The count is |V|-row cheap; the small path is safe (the
        # broadcast build runs as its own job first).
        deg.count()
    e_s = e.withColumnRenamed("src", "s")
    if not small:
        # large-graph path (share side too big to broadcast): hash-
        # partition the static edge list by the join key once so each
        # round's share join reshuffles only the |V|-row share frame,
        # never |E| edges (the x297 r7 lesson). On the small path the
        # share broadcast already streams e_s unshuffled.
        e_s = e_s.repartition(F.col("s")).localCheckpoint(eager=False)
    p = nodes.withColumn("p", F.lit(base))
    for _ in range(iterations):
        share = p.join(_b(deg), "node").select(
            F.col("node").alias("s"), F.expr("p DIV outdeg").alias("sh")
        )
        contrib = (
            e_s.join(_b(share), "s")
            .groupBy("dst")
            .agg(F.sum("sh").alias("c"))
            .withColumnRenamed("dst", "node")
        )
        if symmetric:
            # in a symmetrized graph every node has in-edges, so contrib
            # already covers the full node set — the nodes left-join (and
            # its broadcast) is redundant: 3 fewer joins over 3 rounds
            p = contrib.select(
                "node",
                (F.lit(tele) + F.expr("(85 * c) DIV 100")).alias("p"),
            )
        else:
            p = nodes.join(_b(contrib), "node", "left").select(
                "node",
                (F.lit(tele) + F.expr("(85 * coalesce(c, 0L)) DIV 100")).alias("p"),
            )
    return p


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
) -> DataFrame:
    """Synchronous frequency-based label propagation (Raghavan et al. 2007),
    a fixed number of rounds: labels start as own node id; each round every
    node adopts its neighbors' MOST FREQUENT current label, ties broken by
    the smallest label.  A fixed round count + deterministic tie-break make
    the result engine-reproducible (async LPA's random visit order is what
    makes the classic formulation nondeterministic — unusable under a value
    hash).  Distinct from connected components: frequency voting splits a
    connected graph into dense communities instead of flooding the min id.

    ``edges`` must already be symmetric (pass both directions).  Per round:
    one join (neighbor labels), one (node, label) count aggregate, one
    max_by vote — all key-partitioned, no driver traffic; the per-round
    localCheckpoint cut stops Catalyst re-deriving the full lineage each
    iteration (same convention as pagerank_fixed).

    Scale shape (r7, VERDICT r6 ask #7 — the r6 form was the worst 100×
    row at 111 s): the STATIC edge list is hash-partitioned by the join
    key once and localCheckpointed — LogicalRDD preserves the physical
    outputPartitioning, so each round's join reshuffles only the |V|-row
    label frame, never the |E|-row edge list; and the rank-1 window
    (full sort of the (node, label) pairs per round) is replaced by a
    max_by hash aggregate with the identical (max count, then min label)
    tie-break — partial aggregation map-side, no sort.  Measured at the
    100× replica: 111 s → see SCALE.md round-7 note.

    Returns (node, lab) — community = shared ``lab`` value.
    """

    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .where(F.col("node").isNotNull() & F.col("nbr").isNotNull())
        .distinct()
        .repartition(F.col("nbr"))
        .localCheckpoint(eager=False)
    )
    labels = e.select("node").distinct().withColumn("lab", F.col("node"))
    for _ in range(rounds):
        nbr_labs = labels.withColumnRenamed("node", "nbr")
        cnt = (
            e.join(nbr_labs, "nbr")
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # min over (-count, label): largest count, then smallest label —
        # the count is always numeric so the negation is safe for ANY
        # orderable label type (x310's labels are strings)
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min_by(
                    "lab", F.struct((-F.col("c")).alias("nc"), F.col("lab"))
                ).alias("lab")
            )
            .localCheckpoint(eager=False)
        )
    return labels
