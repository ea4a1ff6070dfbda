"""Wave 146 (x507–x509): backfill triage, robust fitting, lifecycle
tiering.

x507 — backfill priority under a fetch budget: x467 told each symbol's
ETA; this RANKS them — expected rows recovered per rate-limited fetch
second (the value density), greedy cumulative schedule, and the cutoff
under a 1-hour budget.  The triage decision the reference's backfill
planner (P1) would make when it cannot catch everything up at once.
Pure integer ratios + one cumulative window over 10 rows.

x508 — deterministic RANSAC line fit on (n_chars, token-count): five
candidate lines from hash-chosen point pairs, each scored by its exact
inlier count (|residual| ≤ 8 via cross-multiplied integers — no float
residuals), best-by-count wins.  The breakdown-resistant cousin of
Theil–Sen (x344), with the candidate/score/argmax loop fully
relational: 5 × |docs| residual checks, never |docs|².

x509 — lifecycle tiering plan: customers tiered by days since last
order (hot < 60 < warm < 180 < cold); per tier: accounts, revenue at
stake, and storage share — the archive-policy table every retention
job reads.  One per-customer collapse + tier CASE.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x507: backfill priority --------------------------------------------------------------

_X507 = """
    WITH per_day AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 86400 AS dkey,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id % 10, {epoch} {intdiv} 86400
    ),
    span AS (SELECT MIN(dkey) AS d0, MAX(dkey) AS d1 FROM per_day),
    per_sym AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS present_days,
             CAST(SUM(cnt) AS BIGINT) AS total_rows
      FROM per_day GROUP BY sym
    ),
    scored AS (
      SELECT p.sym,
             CAST(s.d1 - s.d0 + 1 - p.present_days AS BIGINT)
               AS missing_days,
             CAST((s.d1 - s.d0 + 1 - p.present_days) * p.total_rows
                  {intdiv} p.present_days AS BIGINT) AS est_rows,
             -- 15 s per day-fetch (the reference's limiter window)
             CAST((s.d1 - s.d0 + 1 - p.present_days) * 15 AS BIGINT)
               AS fetch_cost_s,
             -- value density: rows recovered per fetch second
             CAST(p.total_rows {intdiv} (p.present_days * 15) AS BIGINT)
               AS rows_per_fetch_s
      FROM per_sym p CROSS JOIN span s
    ),
    ranked AS (
      SELECT sym, missing_days, est_rows, fetch_cost_s, rows_per_fetch_s,
             ROW_NUMBER() OVER (ORDER BY rows_per_fetch_s DESC, sym)
               AS priority,
             SUM(fetch_cost_s) OVER (ORDER BY rows_per_fetch_s DESC, sym)
               AS cum_cost_s
      FROM scored
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(priority AS BIGINT) AS priority,
           missing_days, est_rows, fetch_cost_s,
           CAST(cum_cost_s AS BIGINT) AS cumulative_cost_s,
           CASE WHEN cum_cost_s <= 3600 THEN 1 ELSE 0 END
             AS fits_1h_budget
    FROM ranked ORDER BY priority
"""

register_sql(
    "x507_backfill_priority",
    spark_sql=_X507.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X507.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("backfill", "planning"),
)

# -- x508: deterministic RANSAC -------------------------------------------------------------

_X508 = """
    WITH pts AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
             CAST({ntok} AS BIGINT) AS y
      FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
    trials AS (
      SELECT 1 AS trial UNION ALL SELECT 2 UNION ALL SELECT 3
      UNION ALL SELECT 4 UNION ALL SELECT 5
    ),
    cands AS (
      -- five hash-chosen point PAIRS: ids derived from the trial index
      SELECT t.trial,
             ((t.trial * 2654435761 + 12345) % n.n) AS id_a,
             ((t.trial * 40503 + 98765) % n.n) AS id_b
      FROM trials t CROSS JOIN n
    ),
    lines AS (
      -- line through (a, b): slope num/den kept as exact integers
      SELECT c.trial,
             pb.y - pa.y AS sn, pb.x - pa.x AS sd,
             pa.x AS x0, pa.y AS y0
      FROM cands c
      JOIN pts pa ON pa.doc_id = c.id_a
      JOIN pts pb ON pb.doc_id = c.id_b
      WHERE pb.x != pa.x
    ),
    fanned AS (
      -- fan the point cloud by the LITERAL trial dim (bounded BNLJ build
      -- side); the candidate lines then attach by an EQUI join — a bare
      -- lines×pts cross join let Spark broadcast the DATA side
      SELECT t.trial, p.x, p.y FROM pts p CROSS JOIN trials t
    ),
    scored AS (
      -- inlier iff |(y-y0)*sd - sn*(x-x0)| <= 8*|sd| (cross-multiplied:
      -- no float residual, exact integers end to end)
      SELECT l.trial, l.sn, l.sd,
             CAST(SUM(CASE WHEN ABS((f.y - l.y0) * l.sd
                                    - l.sn * (f.x - l.x0))
                                <= 8 * ABS(l.sd)
                           THEN 1 ELSE 0 END) AS BIGINT) AS inliers,
             CAST(COUNT(*) AS BIGINT) AS n_pts
      FROM fanned f JOIN lines l ON f.trial = l.trial
      GROUP BY l.trial, l.sn, l.sd
    )
    SELECT CAST(trial AS BIGINT) AS trial,
           ROUND(CAST(sn AS DOUBLE) / sd, 6) AS slope,
           inliers,
           ROUND(CAST(inliers AS DOUBLE) / n_pts, 6) AS inlier_share,
           CASE WHEN inliers = MAX(inliers) OVER () THEN 1 ELSE 0 END
             AS is_best
    FROM scored ORDER BY trial
"""

register_sql(
    "x508_ransac_line",
    spark_sql=_X508.format(ntok="size(split(text, ' '))"),
    duckdb_sql=_X508.format(ntok="len(string_split(text, ' '))"),
    tags=("stats", "profiling"),
)

# -- x509: lifecycle tiering -------------------------------------------------------------------

_X509 = """
    WITH last_order AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_dt,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT MAX(o_orderdate) AS now_dt FROM orders),
    tiered AS (
      SELECT CASE
               WHEN {datediff} < 60 THEN '1_hot'
               WHEN {datediff} < 180 THEN '2_warm'
               ELSE '3_cold' END AS tier,
             l.n_orders, l.revenue
      FROM last_order l CROSS JOIN anchor a
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(revenue) AS DOUBLE), 2) AS revenue_at_stake,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6)
             AS account_share
    FROM tiered GROUP BY tier ORDER BY tier
"""

register_sql(
    "x509_lifecycle_tiering",
    spark_sql=_X509.format(datediff="DATEDIFF(a.now_dt, l.last_dt)"),
    duckdb_sql=_X509.format(
        datediff="DATEDIFF('day', l.last_dt, a.now_dt)"
    ),
    tags=("warehouse", "planning"),
)
