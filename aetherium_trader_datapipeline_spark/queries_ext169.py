"""Wave 169 (x573–x575): capacity, storage-encoding, and
cardinality-estimation planners — the numbers an engine operator reads
before touching knobs.

x573 — Kingman G/G/1 wait approximation: per event type, the observed
interarrival CV² (DECIMAL-exact moment sums over integer-µs gaps) and
the service CV² of the synthetic service draw (the fractional part of
`value`), priced at a fixed ρ=0.7 utilization budget:
Wq ≈ ρ/(1−ρ) · (ca²+cs²)/2 · E[s].  The step beyond M/M/1 (x517) —
burstiness (x251) enters through ca², and the output shows exactly how
much the Poisson assumption under-prices the queue.

x574 — columnar encoding plan: for three lineitem columns, exact NDV,
run counts under the canonical (l_orderkey, l_linenumber, values)
order — the value-column tiebreakers make the layout a total order
(the synthetic (orderkey, linenumber) pair is NOT unique) —
computed scalably as ONE window pass chunked on contiguous
l_orderkey ranges with cross-chunk boundary handoff (the x498
convention; runs = total consecutive changes + 1, so within-order
and cross-order changes never need separating) — and the resulting
bit costs of PLAIN vs DICT vs RLE.  Dict width is
derived integer-exactly by joining NDV against a 2^b grid (no
cross-engine log2 float edge).  The same decision parquet writers
make; x419's size estimate priced bytes, this one picks the encoding.

x575 — equi-depth histogram selectivity error: a 10-bucket equi-depth
histogram on o_totalprice (boundaries = values at exact global ranks,
the x431 order-statistic convention), probed with five fixed range
predicates; estimated rows use uniform-within-bucket interpolation
(per-bucket contributions 1e6-quantized before the sum) against the
true counts, reporting absolute and q-error.  The planner-quality
companion of x470's selectivity_error (which scored single-column
equality; this scores ranges under equi-depth binning).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x573: Kingman G/G/1 wait under observed arrival variability -----------------

_X573 = """
    WITH arr AS (
      SELECT event_type, ts, event_id,
             {epoch_us} {intdiv} 1000 AS t_ms,
             CAST(FLOOR((value - FLOOR(value)) * 1000) AS BIGINT) AS s_ms
      FROM events WHERE value IS NOT NULL
    ),
    gaps AS (
      -- within-day windows keep partitions (|types| x |days|) wide and
      -- small; a per-type-only window is |types| single-threaded sorts
      -- of the whole stream (31 s at the 100x replica)
      SELECT event_type,
             t_ms - LAG(t_ms) OVER (
               PARTITION BY event_type, t_ms {intdiv} 86400000
               ORDER BY ts, event_id) AS a_ms
      FROM arr
    ),
    daymm AS (
      SELECT event_type, t_ms {intdiv} 86400000 AS d,
             CAST(MIN(t_ms) AS BIGINT) AS mn,
             CAST(MAX(t_ms) AS BIGINT) AS mx
      FROM arr GROUP BY event_type, t_ms {intdiv} 86400000
    ),
    bgaps AS (
      -- day-boundary gaps: |types| x |days| rows, trivially sorted
      SELECT event_type,
             mn - LAG(mx) OVER (PARTITION BY event_type ORDER BY d)
               AS a_ms
      FROM daymm
    ),
    allgaps AS (
      SELECT event_type, a_ms FROM gaps WHERE a_ms IS NOT NULL
      UNION ALL
      SELECT event_type, a_ms FROM bgaps WHERE a_ms IS NOT NULL
    ),
    mom AS (
      -- millisecond units keep every moment sum inside exact BIGINT
      -- at any replica scale (the microsecond DECIMAL form lost ulps
      -- in Spark's precision-loss decimal multiply)
      SELECT event_type,
             CAST(COUNT(a_ms) AS BIGINT) AS n,
             CAST(SUM(a_ms) AS BIGINT) AS sa,
             CAST(SUM(a_ms * a_ms) AS BIGINT) AS sa2
      FROM allgaps GROUP BY event_type
    ),
    smom AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(s_ms) AS BIGINT) AS ss,
             CAST(SUM(s_ms * s_ms) AS BIGINT) AS ss2
      FROM arr GROUP BY event_type
    ),
    cv AS (
      SELECT m.event_type, m.n,
             CAST(m.sa AS DOUBLE) / m.n AS mean_a,
             -- CV^2 = (n*S2 - S^2) / S^2  (exact integer cross
             -- products, one IEEE division)
             (m.n * CAST(m.sa2 AS DOUBLE) - CAST(m.sa AS DOUBLE) * m.sa)
               / (CAST(m.sa AS DOUBLE) * m.sa) AS ca2,
             (s.ns * CAST(s.ss2 AS DOUBLE) - CAST(s.ss AS DOUBLE) * s.ss)
               / (CAST(s.ss AS DOUBLE) * s.ss) AS cs2
      FROM mom m JOIN smom s ON m.event_type = s.event_type
      WHERE m.n >= 100
    )
    SELECT event_type, n AS n_gaps,
           ROUND(mean_a, 2) AS mean_interarrival_ms,
           ROUND(ca2, 6) AS ca2,
           ROUND(cs2, 6) AS cs2,
           -- Kingman multiplier at the rho=0.7 sizing budget, in units
           -- of the service time E[s] = 0.7 * E[a]
           ROUND(0.7E0 / 0.3 * (ca2 + cs2) / 2, 6) AS wq_over_s,
           ROUND(0.7E0 / 0.3 * (ca2 + cs2) / 2 * 0.7 * mean_a, 2)
             AS wq_ms,
           -- what M/M/1 (ca2 = cs2 = 1) would have predicted
           ROUND(0.7E0 / 0.3 * 0.7 * mean_a, 2) AS wq_ms_mm1
    FROM cv ORDER BY event_type
"""

register_sql(
    "x573_kingman_gg1",
    spark_sql=_X573.format(epoch_us="unix_micros(ts)", intdiv="DIV"),
    duckdb_sql=_X573.format(epoch_us="epoch_us(ts)", intdiv="//"),
    tags=("ops", "capacity"),
)

# -- x574: PLAIN vs DICT vs RLE encoding decision --------------------------------

_X574_FMT = """
    WITH li AS (
      SELECT l_orderkey, l_orderkey {intdiv} 8192 AS chunk, l_linenumber,
             l_returnflag AS c1, l_linestatus AS c2,
             CAST(l_quantity AS BIGINT) AS c3
      FROM lineitem
    ),
    cf AS (
      -- ONE chunked window pass over raw lineitem computes every
      -- consecutive-pair change flag under the canonical total order
      -- (l_orderkey, l_linenumber, values): within-order changes and
      -- cross-order boundaries are only ever consumed SUMMED
      -- (runs = changes + 1), so the r6 decomposition — a per-order
      -- window + a per-order first/last aggregate (12 struct-compare
      -- min_by/max_by over |lineitem|) + a GLOBAL single-partition
      -- LAG over |orders| rows — collapses into this one pass.
      -- Chunk = contiguous l_orderkey range (x498 boundary-handoff
      -- convention); chunk-edge values ride along as first/last_value
      -- in the SAME window node (no extra sort, no struct aggregates).
      -- Measured at the 100x replica: 180.7 s (r6 global form) →
      -- 95.8 s (chunked per-order decomposition, still two heavy
      -- struct-aggregate passes) → 19.5 s (this fused single pass);
      -- SCALE.md round-7 section has all three readings.
      SELECT chunk,
        CASE WHEN c1 != LAG(c1) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3)
             THEN 1 ELSE 0 END AS g1,
        CASE WHEN c2 != LAG(c2) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3)
             THEN 1 ELSE 0 END AS g2,
        CASE WHEN c3 != LAG(c3) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3)
             THEN 1 ELSE 0 END AS g3,
        FIRST_VALUE(c1) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3) AS fv1,
        FIRST_VALUE(c2) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3) AS fv2,
        FIRST_VALUE(c3) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3) AS fv3,
        LAST_VALUE(c1) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS lv1,
        LAST_VALUE(c2) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS lv2,
        LAST_VALUE(c3) OVER (PARTITION BY chunk
               ORDER BY l_orderkey, l_linenumber, c1, c2, c3
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS lv3
      FROM li
    ),
    cagg AS (
      -- per-chunk collapse: change sums + the (constant-per-chunk)
      -- edge values
      SELECT chunk, chunk {intdiv} 8192 AS ck2,
             CAST(SUM(g1) AS BIGINT) AS s1,
             CAST(SUM(g2) AS BIGINT) AS s2,
             CAST(SUM(g3) AS BIGINT) AS s3,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             MIN(fv1) AS cf1, MIN(lv1) AS cl1,
             MIN(fv2) AS cf2, MIN(lv2) AS cl2,
             MIN(fv3) AS cf3, MIN(lv3) AS cl3
      FROM cf GROUP BY chunk
    ),
    handoff_in AS (
      -- TWO-LEVEL boundary handoff (r11): the flat chunk grid is
      -- |lineitem|/8192 rows — linear through one task.  Level 1
      -- compares adjacent chunks PARTITIONED by a super-chunk of 8192
      -- chunks (the first chunk of each super-chunk sees LAG NULL and
      -- contributes 0 here — its boundary is counted at level 2);
      -- level 2's global band sees only the |lineitem|/8192^2
      -- super-chunk grid.
      SELECT cnt, s1, s2, s3,
        CASE WHEN cf1 != LAG(cl1) OVER (PARTITION BY ck2 ORDER BY chunk)
             THEN 1 ELSE 0 END AS g1,
        CASE WHEN cf2 != LAG(cl2) OVER (PARTITION BY ck2 ORDER BY chunk)
             THEN 1 ELSE 0 END AS g2,
        CASE WHEN cf3 != LAG(cl3) OVER (PARTITION BY ck2 ORDER BY chunk)
             THEN 1 ELSE 0 END AS g3
      FROM cagg
    ),
    k2b AS (
      -- per super-chunk edge values: first chunk's firsts, last
      -- chunk's lasts
      SELECT ck2,
             MIN_BY(cf1, chunk) AS f1, MAX_BY(cl1, chunk) AS l1,
             MIN_BY(cf2, chunk) AS f2, MAX_BY(cl2, chunk) AS l2,
             MIN_BY(cf3, chunk) AS f3, MAX_BY(cl3, chunk) AS l3
      FROM cagg GROUP BY ck2
    ),
    handoff_x AS (
      SELECT
        CASE WHEN f1 != LAG(l1) OVER (ORDER BY ck2) THEN 1 ELSE 0 END AS g1,
        CASE WHEN f2 != LAG(l2) OVER (ORDER BY ck2) THEN 1 ELSE 0 END AS g2,
        CASE WHEN f3 != LAG(l3) OVER (ORDER BY ck2) THEN 1 ELSE 0 END AS g3
      FROM k2b
    ),
    chg AS (
      SELECT CAST(a.t1 + b.x1 AS BIGINT) AS t1,
             CAST(a.t2 + b.x2 AS BIGINT) AS t2,
             CAST(a.t3 + b.x3 AS BIGINT) AS t3,
             a.n
      FROM (SELECT CAST(SUM(s1 + g1) AS BIGINT) AS t1,
                   CAST(SUM(s2 + g2) AS BIGINT) AS t2,
                   CAST(SUM(s3 + g3) AS BIGINT) AS t3,
                   CAST(SUM(cnt) AS BIGINT) AS n
            FROM handoff_in) a
      CROSS JOIN (SELECT COALESCE(CAST(SUM(g1) AS BIGINT), 0) AS x1,
                         COALESCE(CAST(SUM(g2) AS BIGINT), 0) AS x2,
                         COALESCE(CAST(SUM(g3) AS BIGINT), 0) AS x3
                  FROM handoff_x) b
    ),
    ndv AS (
      -- NDVs over the collapsed (c1, c2, c3) TUPLE grid, not the raw
      -- rows: distinct-of-projection over distinct-tuples equals the
      -- global distinct, the tuple domain is tiny by construction
      -- (these are the dict-encoding candidates — here 3 x 2 x 50
      -- combos), and the collapse is one map-side-partial hash agg.
      -- The raw-row form planned a 3x expand of all of lineitem
      -- (Spark's multi-count-distinct) — a third of the key's 100x
      -- wall (r12).
      SELECT CAST(COUNT(DISTINCT c1) AS BIGINT) AS ndv1,
             CAST(COUNT(DISTINCT c2) AS BIGINT) AS ndv2,
             CAST(COUNT(DISTINCT c3) AS BIGINT) AS ndv3
      FROM (SELECT c1, c2, c3 FROM li GROUP BY c1, c2, c3) tg
    ),
    stats AS (
      -- single 1-row assembly so each expensive pass runs ONCE (a
      -- UNION ALL of three projections re-executes unmaterialized
      -- CTEs per branch: 9 scans instead of 2 at 10x)
      SELECT * FROM chg CROSS JOIN ndv
    ),
    cols AS (
      SELECT CASE g.i WHEN 1 THEN 'l_returnflag'
                      WHEN 2 THEN 'l_linestatus'
                      ELSE 'l_quantity' END AS col,
             s.n,
             CASE g.i WHEN 1 THEN s.ndv1 WHEN 2 THEN s.ndv2
                      ELSE s.ndv3 END AS ndv,
             CASE g.i WHEN 1 THEN s.t1 + 1
                      WHEN 2 THEN s.t2 + 1
                      ELSE s.t3 + 1 END AS runs,
             CAST(CASE g.i WHEN 3 THEN 64 ELSE 8 END AS BIGINT)
               AS plain_bits
      FROM stats s CROSS JOIN (VALUES (1), (2), (3)) g(i)
    ),
    bits AS (
      -- dict width = min b with 2^b >= ndv (integer grid, no log2)
      SELECT c.col, c.n, c.ndv, c.runs, c.plain_bits,
             MIN(g.b) AS dict_bits
      FROM cols c
      JOIN ({grid}) g ON g.p >= c.ndv
      GROUP BY c.col, c.n, c.ndv, c.runs, c.plain_bits
    ),
    cost AS (
      SELECT col, n, ndv, runs, plain_bits, dict_bits,
             n * plain_bits AS plain_cost,
             n * dict_bits + ndv * plain_bits AS dict_cost,
             runs * (dict_bits + 32) + ndv * plain_bits AS rle_cost
      FROM bits
    )
    SELECT col, n, ndv, runs, dict_bits,
           plain_cost, dict_cost, rle_cost,
           CASE WHEN rle_cost <= dict_cost AND rle_cost <= plain_cost
                THEN 'rle'
                WHEN dict_cost <= plain_cost THEN 'dict'
                ELSE 'plain' END AS recommended,
           ROUND(CAST(plain_cost AS DOUBLE)
                 / LEAST(plain_cost, dict_cost, rle_cost), 4)
             AS compression_x
    FROM cost ORDER BY col
"""

_GRID_SPARK = (
    "SELECT b, CAST(POWER(2, b) AS BIGINT) AS p "
    "FROM (SELECT explode(sequence(1, 40)) AS b)"
)
_GRID_DUCK = (
    "SELECT b, CAST(POWER(2, b) AS BIGINT) AS p "
    "FROM (SELECT unnest(generate_series(1, 40)) AS b)"
)

register_sql(
    "x574_encoding_plan",
    spark_sql=_X574_FMT.format(
        grid=_GRID_SPARK,
        intdiv="DIV",
    ),
    duckdb_sql=_X574_FMT.format(
        grid=_GRID_DUCK,
        intdiv="//",
    ),
    tags=("layout", "planner"),
)

# -- x575: equi-depth histogram range-selectivity error --------------------------

_X575_FMT = """
    WITH vals AS (
      SELECT o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY o_totalprice
    ),
    ranked AS (
      SELECT v, c,
             SUM(c) OVER (ORDER BY v) AS cum,
             SUM(c) OVER () AS n
      FROM vals
    ),
    bounds AS (
      -- 10 equi-depth boundaries: value at global rank ceil(q*N/10)
      SELECT b,
             MIN(CASE WHEN cum >= (b * n + 9) {intdiv} 10 THEN v END)
               AS ub
      FROM ranked CROSS JOIN ({bgrid}) g
      GROUP BY b
    ),
    buckets AS (
      SELECT b,
             COALESCE(LAG(ub) OVER (ORDER BY b), 0.0) AS lb,
             ub,
             (SELECT MAX(n) FROM ranked) {intdiv} 10 AS depth
      FROM bounds
    ),
    preds AS (
      SELECT * FROM ({preds}) p
    ),
    est AS (
      -- uniform-within-bucket interpolation, 1e6-quantized per bucket.
      -- A zero-width bucket (equi-depth boundary repeated under heavy
      -- value duplication) would be 0/0: Spark NULLs it, DuckDB gives
      -- NaN/Inf — guard it explicitly (full depth iff the point lies
      -- inside the half-open predicate range, else nothing).
      SELECT p.pid, p.lo, p.hi,
             CAST(SUM(CAST(FLOOR(
               CASE
                 WHEN bu.ub > bu.lb THEN
                   GREATEST(0.0,
                     (LEAST(p.hi, bu.ub) - GREATEST(p.lo, bu.lb))
                     / (bu.ub - bu.lb))
                 WHEN bu.ub >= p.lo AND bu.ub < p.hi THEN 1.0
                 ELSE 0.0
               END
               * bu.depth * 1e6) AS BIGINT)) AS BIGINT) AS est_fp
      FROM preds p JOIN buckets bu
        ON bu.ub > p.lo AND bu.lb < p.hi
      GROUP BY p.pid, p.lo, p.hi
    ),
    actc AS (
      -- true counts via a theta probe whose BROADCAST side is the 5-row
      -- literal predicate grid (bounded by construction). The r6 form
      -- (preds LEFT JOIN orders) broadcast the FULL orders scan as the
      -- BNLJ build side — Θ(|preds|×|orders|) with a data-proportional
      -- broadcast, a genuine 100×-scale killer (VERDICT r6 ask #1).
      SELECT p.pid, CAST(COUNT(*) AS BIGINT) AS actual
      FROM orders o JOIN preds p
        ON o.o_totalprice >= p.lo AND o.o_totalprice < p.hi
      GROUP BY p.pid
    ),
    act AS (
      -- re-densify: a predicate matching zero rows must still report
      SELECT p.pid, p.lo, p.hi,
             COALESCE(a.actual, CAST(0 AS BIGINT)) AS actual
      FROM preds p LEFT JOIN actc a ON p.pid = a.pid
    )
    SELECT a.pid, a.lo, a.hi,
           CAST(FLOOR(COALESCE(e.est_fp, 0) / 1e6) AS BIGINT) AS est_rows,
           a.actual,
           CAST(ABS(CAST(FLOOR(COALESCE(e.est_fp, 0) / 1e6) AS BIGINT)
                    - a.actual) AS BIGINT) AS abs_err,
           ROUND(GREATEST(
             (COALESCE(e.est_fp, 0) / 1e6 + 1) / (a.actual + 1),
             (CAST(a.actual AS DOUBLE) + 1)
               / (COALESCE(e.est_fp, 0) / 1e6 + 1)), 4)
             AS q_error
    FROM act a LEFT JOIN est e ON e.pid = a.pid
    ORDER BY a.pid
"""

_PREDS = (
    "SELECT 1 AS pid, CAST(0 AS DOUBLE) AS lo, CAST(50000 AS DOUBLE) AS hi "
    "UNION ALL SELECT 2, 100000, 200000 "
    "UNION ALL SELECT 3, 250000, 260000 "
    "UNION ALL SELECT 4, 400000, 500000 "
    "UNION ALL SELECT 5, 480000, 600000"
)
_BGRID_SPARK = "SELECT explode(sequence(1, 10)) AS b"
_BGRID_DUCK = "SELECT unnest(generate_series(1, 10)) AS b"

register_sql(
    "x575_histogram_selectivity",
    spark_sql=_X575_FMT.format(
        intdiv="DIV", bgrid=_BGRID_SPARK, preds=_PREDS
    ),
    duckdb_sql=_X575_FMT.format(
        intdiv="//", bgrid=_BGRID_DUCK, preds=_PREDS
    ),
    tags=("planner", "stats"),
)
