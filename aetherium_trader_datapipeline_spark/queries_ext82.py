"""Wave 82 (x330–x332): l-diversity, degree assortativity, systematic sampling.

x330 extends the k-anonymity gate (x312) to l-diversity (Machanavajjhala
et al.): a QI group can be large (k-anonymous) yet still leak if every
member shares one sensitive value — distinct-l counts catch exactly
that.  QI = (nation, account-balance band) on customer, sensitive =
market segment; output is the distribution of l with each level's
entropy-l lower bound, all from integer counts with per-row rounded
ratios (no cross-row float sums).  One groupBy for cells, one for
groups, one for the histogram — three shuffles over shrinking frames.

x331 is degree assortativity on the customer–supplier trade graph (the
x297 edge set): Pearson correlation BETWEEN endpoint degrees over
edges.  Positive r = hubs trade with hubs.  Degrees are distinct-count
integers; moment sums accumulate in DECIMAL; the correlation is per-row
IEEE arithmetic on six scalars (the x322/x328 moment discipline).  The
degree frames are one row per NODE — they scale with the graph, so they
are explicitly SHUFFLE_HASH-joined, never broadcast (the 100× replica
OOMed the static broadcast plan; see the in-query comment).

x332 completes the sampling family (deterministic hash x100, stratified
x122, weighted reservoir x283) with SYSTEMATIC sampling — every k-th
row in a defined total order, the standard design when the frame is
already sorted and strict periodicity is wanted (audit pulls, QC
spot-checks): rank rows by (o_orderdate, o_orderkey), keep
rank % 50 = 7.  The global rank is NOT a global window (which would be
a single-partition sort — the scale failure the plan posture bans): it
is the standard two-phase distributed rank — per-date counts (parallel
groupBy), a running-sum offset over the tiny date frame, then a
per-date-partition ROW_NUMBER plus the offset.  Exactly reproducible,
exactly oracle-checkable, every table-sized pass hash-partitioned.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x330: l-diversity ---------------------------------------------------------

_X330 = """
    WITH rows_qi AS (
      SELECT c_custkey,
             c_nationkey AS qi_nation,
             CAST(FLOOR(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) / 200000)
               AS BIGINT) AS qi_balband,
             c_mktsegment AS sens
      FROM customer
    ),
    cells AS (
      SELECT qi_nation, qi_balband, sens, CAST(COUNT(*) AS BIGINT) AS n_sv
      FROM rows_qi GROUP BY qi_nation, qi_balband, sens
    ),
    groups AS (
      SELECT qi_nation, qi_balband,
             CAST(COUNT(*) AS BIGINT) AS l_distinct,
             CAST(SUM(n_sv) AS BIGINT) AS n_rows,
             CAST(MAX(n_sv) AS BIGINT) AS max_sv
      FROM cells GROUP BY qi_nation, qi_balband
    )
    SELECT l_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN max_sv * 2 > n_rows THEN 1 ELSE 0 END) AS BIGINT)
             AS n_groups_majority_leak,
           ROUND(MIN(CAST(n_rows AS DOUBLE) / max_sv), 4) AS min_entropy_l_bound
    FROM groups GROUP BY l_distinct ORDER BY l_distinct
"""

register_sql(
    "x330_l_diversity",
    spark_sql=_X330,
    duckdb_sql=_X330,
    tags=("privacy", "audit"),
)

# -- x331: degree assortativity ------------------------------------------------

_X331 = """
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    cdeg AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS dc FROM edges GROUP BY c),
    sdeg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS ds FROM edges GROUP BY s),
    joined AS (
      -- SHUFFLE_HASH, not broadcast: the degree frames scale with NODE
      -- count (15 M rows at the 100x replica), and Catalyst's post-agg
      -- size guess slips them under the broadcast threshold — the static
      -- plan then OOMs the driver building a ~1 GB hash relation (found
      -- by the 100x run, fixed here). DuckDB reads the hint as a comment.
      SELECT /*+ SHUFFLE_HASH(cd, sd) */ cd.dc, sd.ds
      FROM edges e JOIN cdeg cd ON e.c = cd.c JOIN sdeg sd ON e.s = sd.s
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(dc AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(ds AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(dc AS DECIMAL(18,0)) * dc) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(ds AS DECIMAL(18,0)) * ds) AS DECIMAL(38,0))
                  AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(dc AS DECIMAL(18,0)) * ds) AS DECIMAL(38,0))
                  AS DOUBLE) AS sxy
      FROM joined
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           ROUND(sx / n, 4) AS mean_cust_degree,
           ROUND(sy / n, 4) AS mean_supp_degree,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
             AS assortativity
    FROM m
"""

register_sql(
    "x331_assortativity",
    spark_sql=_X331,
    duckdb_sql=_X331,
    tags=("graph", "audit"),
)

# -- x332: systematic sampling -------------------------------------------------

_X332 = """
    WITH per_date AS (
      SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderdate
    ),
    offs AS (
      SELECT d, COALESCE(SUM(n) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM per_date
    ),
    ranked AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o.o_orderdate
                                ORDER BY o.o_orderkey) + f.off AS rnk
      FROM orders o JOIN offs f ON o.o_orderdate = f.d
    ),
    sample AS (
      SELECT * FROM ranked WHERE rnk % 50 = 7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS last_key,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(18,0)))
                AS DECIMAL(38,0)) AS BIGINT) AS sum_price_cents,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM sample
"""

register_sql(
    "x332_systematic_sample",
    spark_sql=_X332,
    duckdb_sql=_X332,
    tags=("sampling",),
)
