"""Wave 89 (x351–x353): apportionment, interval union, skyline.

x351 — largest-remainder (Hamilton) apportionment: split 10 000 budget
units across nations proportionally to customer count so the parts sum
EXACTLY to the whole — naive rounding of shares never does, and
downstream ledgers break on the missing units.  Integer quota floors
plus a remainder-rank window hand out the leftover units
deterministically (remainder DESC, nation ASC).  The invariant
Σ alloc = budget is the query's own output.  This is the shard-count /
sample-quota / money-split primitive every pipeline eventually
hand-rolls wrong.

x352 — interval UNION per key: merge overlapping [ts, ts+duration)
intervals (events carry their duration in ``value`` seconds) into
maximal islands via the classic running-max-of-end sweep — a new
island starts exactly where the running max of previous ends stops
covering the current start.  One window sort per key, exact epoch-micro
arithmetic; reports islands, merged spans, and covered time — the
occupancy/coverage question (sensor uptime, meeting rooms, position
exposure windows) as one window pass.  Differs from sessionization
(gap-based points) in that rows here have EXTENT.

x353 — 2-D skyline (Pareto frontier) of customers per market segment:
maximize account balance while minimizing customer key (the
deterministic 2-D stand-in): sort by balance DESC, a point survives iff
its custkey is strictly below the running minimum of keys seen so far.
The textbook nested-loop dominance test is O(n²); the sort-sweep is one
window pass — the same rewrite discipline as x338.  Exact integer
cents; ties on balance resolved inside the sweep by the sort key.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x351: largest-remainder apportionment -------------------------------------

_X351 = """
    WITH counts AS (
      SELECT c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY c_nationkey
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
    quotas AS (
      SELECT c.nation, c.n,
             CAST(FLOOR(CAST(c.n AS DECIMAL(28,0)) * 10000 / t.t) AS BIGINT)
               AS floor_q,
             CAST(CAST(c.n AS DECIMAL(28,0)) * 10000 % t.t AS BIGINT) AS rem
      FROM counts c CROSS JOIN tot t
    ),
    leftover AS (
      SELECT CAST(10000 - SUM(floor_q) AS BIGINT) AS k FROM quotas
    ),
    ranked AS (
      SELECT q.nation, q.n, q.floor_q,
             ROW_NUMBER() OVER (ORDER BY q.rem DESC, q.nation) AS rr,
             l.k
      FROM quotas q CROSS JOIN leftover l
    )
    SELECT CAST(nation AS BIGINT) AS nation, n,
           CAST(floor_q + CASE WHEN rr <= k THEN 1 ELSE 0 END AS BIGINT)
             AS allocation,
           CAST(SUM(floor_q + CASE WHEN rr <= k THEN 1 ELSE 0 END) OVER ()
             AS BIGINT) AS total_check
    FROM ranked ORDER BY nation
"""

register_sql(
    "x351_largest_remainder",
    spark_sql=_X351,
    duckdb_sql=_X351,
    tags=("sampling", "window"),
)

# -- x352: interval union (running-max sweep) ----------------------------------

_X352_FMT = """
    WITH iv AS (
      SELECT user_id % 10 AS k, event_id AS tb,
             {epoch_us} AS s,
             -- FLOOR, not ROUND: duration quantization must be tie-free.
             -- ABS(value)*1e6 lands on exact .5 halves at sf1 and Spark's
             -- shortest-repr HALF_UP vs DuckDB's binary rounding diverge
             -- there (the x118 half-way family, r9 find); FLOOR of the
             -- same double is engine-identical.
             {epoch_us} + CAST(FLOOR(ABS(value) * 1000000) AS BIGINT) AS e
      FROM events WHERE value IS NOT NULL
    ),
    -- Both windows ORDER BY the TOTAL key (s, e, tb): the sweep is two
    -- window passes, and with duplicate (s, e) rows (the key-shifted
    -- sf1 replica has exact duplicates) each engine may permute ties
    -- DIFFERENTLY between the two sorts — the island flags set under
    -- one permutation get prefix-summed under another, silently
    -- attaching tied rows to the previous island (covered_us diverged
    -- ~1% at sf1 with identical island counts; r9 find).  event_id
    -- totalizes the order so both passes and both engines see one row
    -- sequence.
    swept AS (
      SELECT k, s, e, tb,
             MAX(e) OVER (PARTITION BY k ORDER BY s, e, tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev_e
      FROM iv
    ),
    flagged AS (
      SELECT k, s, e, tb,
             CASE WHEN max_prev_e IS NULL OR s > max_prev_e THEN 1 ELSE 0 END
               AS new_island
      FROM swept
    ),
    islands AS (
      SELECT k, s, e,
             SUM(new_island) OVER (PARTITION BY k ORDER BY s, e, tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM flagged
    ),
    merged AS (
      SELECT k, island_id,
             CAST(MIN(s) AS BIGINT) AS island_s,
             CAST(MAX(e) AS BIGINT) AS island_e,
             CAST(COUNT(*) AS BIGINT) AS n_intervals
      FROM islands GROUP BY k, island_id
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(n_intervals) AS BIGINT) AS n_intervals,
           CAST(MAX(n_intervals) AS BIGINT) AS max_merge,
           CAST(CAST(SUM(CAST(island_e - island_s AS DECIMAL(28,0)))
                AS DECIMAL(38,0)) AS BIGINT) AS covered_us
    FROM merged GROUP BY k ORDER BY k
"""

register_sql(
    "x352_interval_union",
    spark_sql=_X352_FMT.format(epoch_us="unix_micros(ts)"),
    duckdb_sql=_X352_FMT.format(epoch_us="epoch_us(ts)"),
    tags=("window", "gaps"),
)

# -- x353: 2-D skyline ---------------------------------------------------------

_X353 = """
    WITH pts AS (
      SELECT c_mktsegment AS seg, c_custkey AS ck,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c
      FROM customer
    ),
    swept AS (
      SELECT seg, ck, bal_c,
             MIN(ck) OVER (PARTITION BY seg ORDER BY bal_c DESC, ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_prev_ck
      FROM pts
    ),
    sky AS (
      SELECT seg, ck, bal_c FROM swept
      WHERE min_prev_ck IS NULL OR ck < min_prev_ck
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS skyline_size,
           CAST(MIN(ck) AS BIGINT) AS best_ck,
           CAST(MAX(bal_c) AS BIGINT) AS best_bal_c,
           CAST(CAST(SUM(CAST(ck AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS BIGINT)
             AS ck_checksum
    FROM sky GROUP BY seg ORDER BY seg
"""

register_sql(
    "x353_skyline_2d",
    spark_sql=_X353,
    duckdb_sql=_X353,
    tags=("window", "mining"),
)
