"""Wave 90 (x354–x356): dataset diff, profile drift, coverage matrix.

Operational data-management primitives — the queries run BETWEEN
pipeline runs rather than inside one:

x354 — dataset DIFF between two corpus versions (v1 = doc_id ≢ 0
mod 7, v2 = doc_id ≢ 3 mod 7 with text "revised" for ids ≡ 1 mod 11 —
deterministic stand-ins for two snapshots): added / removed / changed /
unchanged, where "changed" means same id, different content hash.  This
is the release-notes table for a training-data version bump, the
document-level complement of the keyed CDC operator (merge.py) — full
outer join on id, md5 comparison for content, one shuffle.

x355 — column-profile DRIFT between the first and second half of the
events stream (split at the exact median event_id so both engines cut
identically): per column null rate, distinct count, and min/max.  The
schema-level early-warning that catches "the upstream started sending
empty props" before any model notices; pairs with x320 (PSI on a model
score) at the pipe level.  One scan per half, map-side combine, all
counts exact.

x356 — (symbol × day) COVERAGE matrix rollup: which fraction of the
expected grid actually has ticks, per symbol — expected days = the
corpus' own calendar (distinct days overall), so a symbol dark for a
day shows immediately.  The aggregate face of gap detection (G1
reports the holes; this reports the completeness score a dashboard
tiles), one groupBy + one tiny cross join against the calendar count.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x354: dataset version diff ------------------------------------------------

_X354 = """
    WITH v1 AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
    ),
    v2 AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 1 THEN text || ' [revised]'
                      ELSE text END) AS h
      FROM documents WHERE doc_id % 7 <> 3
    ),
    joined AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             CASE
               WHEN a.doc_id IS NULL THEN 'added'
               WHEN b.doc_id IS NULL THEN 'removed'
               WHEN a.h <> b.h THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM joined GROUP BY status ORDER BY status
"""

register_sql(
    "x354_dataset_diff",
    spark_sql=_X354,
    duckdb_sql=_X354,
    tags=("warehouse", "audit"),
)

# -- x355: column profile drift ------------------------------------------------

_X355 = """
    WITH med AS (
      -- Split at (min+max)/2, NOT MEDIAN: Spark's exact-median aggregate
      -- buffers every value (48.3 s at the 100x replica vs 4.2 s at 10x,
      -- measured) while min/max fold in O(1) per partition. event_ids are
      -- dense, so the cut lands where the median would; the profile only
      -- needs a DETERMINISTIC halving, not an order statistic.
      SELECT CAST(FLOOR((MIN(event_id) + MAX(event_id)) / 2) AS BIGINT) AS m
      FROM events
    ),
    halves AS (
      SELECT CASE WHEN e.event_id <= med.m THEN 'h1' ELSE 'h2' END AS half,
             e.value, e.event_type, e.user_id
      FROM events e CROSS JOIN med
    ),
    cellg AS (
      -- every profile agg decomposes through the (half, type, user)
      -- grid (counts sum, nulls sum, min/max fold), so the
      -- multi-COUNT(DISTINCT) — which plans as a 3x row EXPAND — runs
      -- over the collapsed grid (~users x types), never the raw events
      -- (r12)
      SELECT half, event_type, user_id,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS nv,
             MIN(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS mnv,
             MAX(CAST(ROUND(value * 1000000, 0) AS BIGINT)) AS mxv
      FROM halves GROUP BY half, event_type, user_id
    ),
    prof AS (
      SELECT half,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(SUM(nv) AS BIGINT) AS value_nulls,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS et_distinct,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_distinct,
             CAST(MIN(mnv) AS BIGINT) AS value_min_micro,
             CAST(MAX(mxv) AS BIGINT) AS value_max_micro
      FROM cellg GROUP BY half
    )
    SELECT half, n_rows, value_nulls,
           ROUND(CAST(value_nulls AS DOUBLE) / n_rows, 6) AS null_rate,
           et_distinct, users_distinct, value_min_micro, value_max_micro
    FROM prof ORDER BY half
"""

register_sql(
    "x355_profile_drift",
    spark_sql=_X355,
    duckdb_sql=_X355,
    tags=("quality", "audit"),
)

# -- x356: coverage matrix rollup ----------------------------------------------

_X356 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d
      FROM events WHERE value IS NOT NULL
    ),
    cal AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days FROM ticks),
    cell AS (
      SELECT sym, d, CAST(COUNT(*) AS BIGINT) AS n_ticks
      FROM ticks GROUP BY sym, d
    ),
    per_sym AS (
      SELECT sym,
             CAST(COUNT(*) AS BIGINT) AS days_present,
             CAST(SUM(n_ticks) AS BIGINT) AS total_ticks,
             CAST(MIN(n_ticks) AS BIGINT) AS min_day_ticks
      FROM cell GROUP BY sym
    )
    SELECT CAST(p.sym AS BIGINT) AS sym, p.days_present, c.n_days AS days_expected,
           ROUND(CAST(p.days_present AS DOUBLE) / c.n_days, 4) AS coverage,
           p.total_ticks, p.min_day_ticks
    FROM per_sym p CROSS JOIN cal c ORDER BY p.sym
"""

register_sql(
    "x356_coverage_matrix",
    spark_sql=_X356,
    duckdb_sql=_X356,
    tags=("gaps", "audit"),
)
