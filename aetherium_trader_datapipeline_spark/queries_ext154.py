"""Wave 154 (x531–x533): data valuation, cache sizing, and erasure
planning.

x531 — leave-one-source-out ablation: each source's marginal
contribution to the corpus-level quality metric (mean stopword share —
the x43 proxy), computed in closed form from per-source sums (mean
without source s = (S − S_s)/(N − N_s)) — the "data valuation lite"
that ranks sources by what removing them would do, with token cost per
quality point alongside.

x532 — TTL cache policy from measured access patterns: accesses are
(user, event_type) repeats; at TTLs {60, 300, 3600} s the hit share is
the fraction of repeat accesses whose gap beats the TTL — computed
from per-access LAG gaps in one pass.  The empirical curve that sizes
a cache TTL (the temporal sibling of x442's top-k coverage).

x533 — erasure blast radius: if a user requests deletion under a
day-partitioned layout (the K1 sink), every (day) partition holding
their rows must be rewritten; per-user partition counts give the
blast-radius distribution (mean/max partitions, total file rewrites
for a 1% deletion batch) — the privacy-ops cost table next to x312
(k-anonymity) and x452 (DP release).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x531: leave-one-source-out ablation ------------------------------------------------------

_X531 = """
    WITH scored AS (
      SELECT source,
             CAST(n_chars AS BIGINT) {intdiv} 4 AS tokens,
             CASE WHEN text LIKE '%the%' THEN 1 ELSE 0 END AS q
      FROM documents
    ),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_s,
             CAST(SUM(q) AS BIGINT) AS q_s,
             CAST(SUM(tokens) AS BIGINT) AS tok_s
      FROM scored GROUP BY source
    ),
    totals AS (
      SELECT CAST(SUM(n_s) AS BIGINT) AS n,
             CAST(SUM(q_s) AS BIGINT) AS q,
             CAST(SUM(tok_s) AS BIGINT) AS tok
      FROM per_source
    )
    SELECT p.source, p.n_s AS docs, p.tok_s AS tokens,
           ROUND(CAST(t.q AS DOUBLE) / t.n, 6) AS corpus_quality,
           ROUND(CAST(t.q - p.q_s AS DOUBLE) / (t.n - p.n_s), 6)
             AS quality_without_source,
           -- positive = the source LIFTS corpus quality
           ROUND(CAST(t.q AS DOUBLE) / t.n
                 - CAST(t.q - p.q_s AS DOUBLE) / (t.n - p.n_s), 9)
             AS marginal_contribution,
           CASE WHEN CAST(t.q AS DOUBLE) / t.n
                     - CAST(t.q - p.q_s AS DOUBLE) / (t.n - p.n_s) < 0
                THEN 1 ELSE 0 END AS drags_quality
    FROM per_source p CROSS JOIN totals t
    ORDER BY marginal_contribution, p.source
"""

register_sql(
    "x531_source_ablation",
    spark_sql=_X531.format(intdiv="DIV"),
    duckdb_sql=_X531.format(intdiv="//"),
    tags=("curation", "planning"),
)

# -- x532: TTL cache hits -----------------------------------------------------------------------

_X532 = """
    WITH accesses AS (
      SELECT user_id, event_type, {epoch} AS et,
             LAG({epoch}) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS prev_et
      FROM events
    ),
    gaps AS (
      SELECT et - prev_et AS gap_s FROM accesses WHERE prev_et IS NOT NULL
    ),
    ttls AS (
      SELECT CAST(60 AS BIGINT) AS ttl_s UNION ALL SELECT 300
      UNION ALL SELECT 3600
    )
    SELECT t.ttl_s,
           CAST(COUNT(*) AS BIGINT) AS repeat_accesses,
           CAST(SUM(CASE WHEN g.gap_s <= t.ttl_s THEN 1 ELSE 0 END)
                AS BIGINT) AS cache_hits,
           ROUND(CAST(SUM(CASE WHEN g.gap_s <= t.ttl_s THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS hit_share
    FROM gaps g CROSS JOIN ttls t
    GROUP BY t.ttl_s ORDER BY ttl_s
"""

register_sql(
    "x532_ttl_cache_hits",
    spark_sql=_X532.format(epoch="unix_seconds(ts)"),
    duckdb_sql=_X532.format(epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"),
    tags=("planning", "events"),
)

# -- x533: erasure blast radius --------------------------------------------------------------------

_X533 = """
    WITH footprints AS (
      SELECT user_id,
             CAST(COUNT(DISTINCT {epoch} {intdiv} 86400) AS BIGINT)
               AS partitions_touched,
             CAST(COUNT(*) AS BIGINT) AS user_rows
      FROM events GROUP BY user_id
    ),
    marked AS (
      -- a deterministic 1% deletion batch
      SELECT *,
             CASE WHEN ((user_id * 2654435761) {intdiv} 1024) % 100 = 0
                  THEN 1 ELSE 0 END AS in_batch
      FROM footprints
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(in_batch) AS BIGINT) AS deletion_batch_users,
           ROUND(CAST(SUM(partitions_touched) AS DOUBLE) / COUNT(*), 4)
             AS mean_partitions_per_user,
           CAST(MAX(partitions_touched) AS BIGINT)
             AS max_partitions_per_user,
           CAST(SUM(CASE WHEN in_batch = 1 THEN partitions_touched
                         ELSE 0 END) AS BIGINT)
             AS batch_partition_rewrites,
           CAST(SUM(CASE WHEN in_batch = 1 THEN user_rows ELSE 0 END)
                AS BIGINT) AS batch_rows_erased
    FROM marked
"""

register_sql(
    "x533_erasure_blast_radius",
    spark_sql=_X533.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X533.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("privacy", "planning"),
)
