"""Wave 152 (x525–x527): distributed-systems semantics, measured.

x525 — consistent-hash ring: 10 nodes × 32 vnodes placed by the
portable md5 hash; every user key routes to its clockwise successor
(min ring position ≥ key hash, wrapping).  Reports per-node key/row
balance AND the movement share when node 0 leaves — the ~1/N remap
that justifies the ring over mod-N rehashing (measured: the mod-N
column shows the ~(N-1)/N carnage).  Complements x305 (rendezvous
hashing — the other minimal-movement scheme).

x526 — CRDT G-counter convergence: per-node increment streams (events
sharded by the x415 hash) merged as element-wise maxima of per-node
totals, computed through two DIFFERENT merge orders (left-fold by node
id ascending vs descending — expressed as two independent aggregation
groupings); the value and the equality flag prove order-independence,
the property that makes the type coordination-free.

x527 — staleness exposure: at replica lags {1, 5, 30} s, the share of
read-after-write pairs (a user's 'view' following their own 'click'
within the lag window) that a lagging replica would serve stale — the
measured risk table behind a read-replica rollout.  Pure window
arithmetic on the event stream.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x525: consistent-hash ring -------------------------------------------------------------

_X525 = """
    WITH vnodes AS (
      SELECT n.node, v.vn,
             {h_vnode} AS pos
      FROM (SELECT 0 AS node UNION ALL SELECT 1 UNION ALL SELECT 2
            UNION ALL SELECT 3 UNION ALL SELECT 4 UNION ALL SELECT 5
            UNION ALL SELECT 6 UNION ALL SELECT 7 UNION ALL SELECT 8
            UNION ALL SELECT 9) n
      CROSS JOIN (SELECT 0 AS vn UNION ALL SELECT 1 UNION ALL SELECT 2
                  UNION ALL SELECT 3 UNION ALL SELECT 4 UNION ALL
                  SELECT 5 UNION ALL SELECT 6 UNION ALL SELECT 7
                  UNION ALL SELECT 8 UNION ALL SELECT 9 UNION ALL
                  SELECT 10 UNION ALL SELECT 11 UNION ALL SELECT 12
                  UNION ALL SELECT 13 UNION ALL SELECT 14 UNION ALL
                  SELECT 15 UNION ALL SELECT 16 UNION ALL SELECT 17
                  UNION ALL SELECT 18 UNION ALL SELECT 19 UNION ALL
                  SELECT 20 UNION ALL SELECT 21 UNION ALL SELECT 22
                  UNION ALL SELECT 23 UNION ALL SELECT 24 UNION ALL
                  SELECT 25 UNION ALL SELECT 26 UNION ALL SELECT 27
                  UNION ALL SELECT 28 UNION ALL SELECT 29 UNION ALL
                  SELECT 30 UNION ALL SELECT 31) v
    ),
    keys AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS rows_,
             {h_key} AS kpos
      FROM events GROUP BY user_id
    ),
    routed AS (
      -- clockwise successor with wraparound; the min-over-ring terms
      -- are exact integer MINs so routing is engine-identical
      SELECT k.user_id, k.rows_,
             COALESCE(
               MIN(CASE WHEN v.pos >= k.kpos THEN v.pos END),
               MIN(v.pos)) AS owner_pos,
             COALESCE(
               MIN(CASE WHEN v.pos >= k.kpos AND v.node != 0
                        THEN v.pos END),
               MIN(CASE WHEN v.node != 0 THEN v.pos END)) AS owner_pos_wo0
      FROM keys k CROSS JOIN vnodes v
      GROUP BY k.user_id, k.rows_, k.kpos
    ),
    owned AS (
      SELECT r.user_id, r.rows_,
             MAX(CASE WHEN v.pos = r.owner_pos THEN v.node END) AS node,
             MAX(CASE WHEN v.pos = r.owner_pos_wo0 THEN v.node END)
               AS node_wo0
      FROM routed r JOIN vnodes v
        ON v.pos = r.owner_pos OR v.pos = r.owner_pos_wo0
      GROUP BY r.user_id, r.rows_, r.owner_pos, r.owner_pos_wo0
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(rows_) AS BIGINT) AS n_rows,
           -- exact half-up fixed-point ratios: double-space ROUND of an
           -- integer ratio hits genuine .xxxx5 ties at sf1 (0.84035
           -- diverged r9); (2*a*scale + b) intdiv (2*b) resolves the tie
           -- in integer space, identically on both engines
           CAST((SUM(rows_) * 200000 + SUM(SUM(rows_)) OVER ())
                {intdiv} (2 * SUM(SUM(rows_)) OVER ()) AS DOUBLE) / 10000.0
             AS load_vs_even,
           CAST((SUM(CASE WHEN node != node_wo0 THEN rows_ ELSE 0 END)
                 * 2000000 + SUM(rows_)) {intdiv} (2 * SUM(rows_))
                AS DOUBLE) / 1000000.0 AS moved_if_node0_leaves
    FROM owned GROUP BY node ORDER BY node
"""

_H_VNODE_SPARK = ("CAST(conv(substring(md5(CONCAT('vn-', n.node, '-', v.vn)"
                  "), 1, 12), 16, 10) AS BIGINT)")
_H_VNODE_DUCK = ("('0x' || substring(md5('vn-' || n.node || '-' || v.vn), "
                 "1, 12))::BIGINT")
_H_KEY_SPARK = ("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 12), "
                "16, 10) AS BIGINT)")
_H_KEY_DUCK = ("('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))"
               "::BIGINT")

register_sql(
    "x525_consistent_hash_ring",
    spark_sql=_X525.format(h_vnode=_H_VNODE_SPARK, h_key=_H_KEY_SPARK, intdiv="DIV"),
    duckdb_sql=_X525.format(h_vnode=_H_VNODE_DUCK, h_key=_H_KEY_DUCK, intdiv="//"),
    tags=("planning", "profiling"),
)

# -- x526: CRDT G-counter --------------------------------------------------------------------

_X526 = """
    WITH sharded AS (
      -- per-node increment streams: each event is one +1 at its node
      SELECT (((user_id * 2654435761) {intdiv} 1024) % 4) AS node,
             event_id
      FROM events
    ),
    per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS local_total
      FROM sharded GROUP BY node
    ),
    -- two replicas that each saw a PREFIX of the other nodes' streams
    -- (replica A missed half of node 3; replica B missed half of node 0)
    replica_a AS (
      SELECT node,
             CAST(SUM(CASE WHEN node = 3 AND event_id % 2 = 0 THEN 0
                           ELSE 1 END) AS BIGINT) AS seen
      FROM sharded GROUP BY node
    ),
    replica_b AS (
      SELECT node,
             CAST(SUM(CASE WHEN node = 0 AND event_id % 2 = 0 THEN 0
                           ELSE 1 END) AS BIGINT) AS seen
      FROM sharded GROUP BY node
    ),
    merge_ab AS (
      -- merge(A, B) = element-wise max, folded A-then-B
      SELECT a.node, GREATEST(a.seen, b.seen) AS merged
      FROM replica_a a JOIN replica_b b ON a.node = b.node
    ),
    merge_ba AS (
      -- the other order
      SELECT b.node, GREATEST(b.seen, a.seen) AS merged
      FROM replica_b b JOIN replica_a a ON b.node = a.node
    )
    SELECT CAST(p.node AS BIGINT) AS node,
           p.local_total AS true_count,
           ab.merged AS merge_a_then_b,
           ba.merged AS merge_b_then_a,
           CASE WHEN ab.merged = ba.merged THEN 1 ELSE 0 END
             AS order_independent,
           CASE WHEN ab.merged = p.local_total THEN 1 ELSE 0 END
             AS converged_to_truth
    FROM per_node p
    JOIN merge_ab ab ON p.node = ab.node
    JOIN merge_ba ba ON p.node = ba.node
    ORDER BY node
"""

register_sql(
    "x526_crdt_gcounter",
    spark_sql=_X526.format(intdiv="DIV"),
    duckdb_sql=_X526.format(intdiv="//"),
    tags=("profiling", "streaming"),
)

# -- x527: staleness exposure ------------------------------------------------------------------

_X527_REAL = """
    WITH stream AS (
      SELECT user_id, event_type, {epoch} AS et FROM events
      WHERE event_type IN ('click', 'view')
    ),
    raw AS (
      SELECT user_id, event_type, et,
             {lastval} AS last_write_et
      FROM stream
      WINDOW w AS (PARTITION BY user_id ORDER BY et, event_type
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    reads AS (
      SELECT et - last_write_et AS gap_s
      FROM raw
      WHERE event_type = 'view' AND last_write_et IS NOT NULL
    ),
    lags AS (
      SELECT CAST(1 AS BIGINT) AS lag_s UNION ALL SELECT 5
      UNION ALL SELECT 30
    )
    SELECT l.lag_s AS replica_lag_s,
           CAST(COUNT(*) AS BIGINT) AS n_reads_after_write,
           CAST(SUM(CASE WHEN r.gap_s < l.lag_s THEN 1 ELSE 0 END)
                AS BIGINT) AS stale_reads,
           ROUND(CAST(SUM(CASE WHEN r.gap_s < l.lag_s THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS stale_share
    FROM reads r CROSS JOIN lags l
    GROUP BY l.lag_s ORDER BY replica_lag_s
"""

_LASTVAL_SPARK = (
    "LAST_VALUE(CASE WHEN event_type = 'click' THEN et END) "
    "IGNORE NULLS OVER w"
)
_LASTVAL_DUCK = (
    "LAST_VALUE(CASE WHEN event_type = 'click' THEN et END "
    "IGNORE NULLS) OVER w"
)

register_sql(
    "x527_staleness_exposure",
    spark_sql=_X527_REAL.format(
        epoch="unix_seconds(ts)", lastval=_LASTVAL_SPARK
    ),
    duckdb_sql=_X527_REAL.format(
        epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)", lastval=_LASTVAL_DUCK
    ),
    tags=("streaming", "planning"),
)
