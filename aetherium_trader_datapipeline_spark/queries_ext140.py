"""Wave 140 (x488–x490): partition-granularity planning, selection
stability, and measurement sizing.

x488 — partition-granularity planner: the reference sinks hourly
parquet partitions (K1); whether DAILY or HOURLY partitioning is right
depends on rows-per-partition vs the 128 MB file target.  Per day:
measured rows, estimated bytes (fixed 64 B/row), file counts under
both granularities, and the recommendation (hourly only when a daily
file would exceed the target; tiny hourly files are the small-file
problem x398 compacts away).  Emitted per day so skewed days flip
independently.

x489 — top-k selection stability: five deterministic half-samples
(multiplicative-hash bits) each rank documents by n_chars; the
pairwise Jaccard of their top-100 sets measures how reproducible the
"top corpus slice" is — the selection-stability check run before
curating by any score.  All set math via exact group counts.

x490 — DKW sample sizing for quantile SLOs: the
Dvoretzky–Kiefer–Wolfowitz bound n ≥ ln(2/δ)/(2ε²) gives the sample
size that certifies an empirical CDF within ε of truth with 1−δ
confidence; the table crosses ε ∈ {0.01, 0.005, 0.001} with the
per-event-type traffic actually available, flagging which SLOs are
measurable today.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x488: partition-granularity planner --------------------------------------------------

_X488 = """
    WITH per_hour AS (
      SELECT {epoch} {intdiv} 86400 AS dkey,
             {epoch} {intdiv} 3600 AS hkey,
             CAST(COUNT(*) AS BIGINT) AS rows_h
      FROM events GROUP BY {epoch} {intdiv} 86400, {epoch} {intdiv} 3600
    ),
    per_day AS (
      SELECT dkey,
             CAST(SUM(rows_h) AS BIGINT) AS rows_d,
             CAST(COUNT(*) AS BIGINT) AS hours_present,
             CAST(MAX(rows_h) AS BIGINT) AS max_hour_rows
      FROM per_hour GROUP BY dkey
    )
    SELECT CAST(dkey AS BIGINT) AS day_key, rows_d, hours_present,
           CAST(rows_d * 64 AS BIGINT) AS est_bytes,
           -- files at a 128 MB target under each granularity
           CAST((rows_d * 64 + 134217727) {intdiv} 134217728 AS BIGINT)
             AS daily_files,
           hours_present AS hourly_files_min,
           CASE WHEN rows_d * 64 > 134217728 THEN 'hourly'
                ELSE 'daily' END AS recommended_granularity
    FROM per_day ORDER BY day_key
"""

register_sql(
    "x488_partition_granularity",
    spark_sql=_X488.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X488.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("storage", "planning"),
)

# -- x489: top-k selection stability --------------------------------------------------------

_X489 = """
    WITH samples AS (
      SELECT 0 AS s UNION ALL SELECT 1 UNION ALL SELECT 2
      UNION ALL SELECT 3 UNION ALL SELECT 4
    ),
    member AS (
      -- half-sample s keeps docs whose hash bit s is set
      SELECT d.doc_id, d.n_chars, sm.s
      FROM documents d JOIN samples sm
        ON (((d.doc_id * 2654435761) {intdiv} 1024) {intdiv}
            (CASE sm.s WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
                       WHEN 3 THEN 8 ELSE 16 END)) % 2 = 1
    ),
    topk AS (
      SELECT s, doc_id FROM (
        SELECT s, doc_id,
               ROW_NUMBER() OVER (PARTITION BY s
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM member
      ) r WHERE rk <= 100
    ),
    pairs AS (
      SELECT a.s AS s_a, b.s AS s_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM topk a JOIN topk b ON a.doc_id = b.doc_id AND a.s < b.s
      GROUP BY a.s, b.s
    )
    SELECT CAST(s_a AS BIGINT) AS sample_a, CAST(s_b AS BIGINT) AS sample_b,
           n_inter,
           ROUND(CAST(n_inter AS DOUBLE) / (200 - n_inter), 6)
             AS topk_jaccard
    FROM pairs ORDER BY sample_a, sample_b
"""

register_sql(
    "x489_topk_stability",
    spark_sql=_X489.format(intdiv="DIV"),
    duckdb_sql=_X489.format(intdiv="//"),
    tags=("eval", "curation"),
)

# -- x490: DKW sample sizing ------------------------------------------------------------------

_X490 = """
    WITH traffic AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_available
      FROM events GROUP BY event_type
    ),
    eps AS (
      SELECT CAST(0.01 AS DOUBLE) AS epsilon
      UNION ALL SELECT CAST(0.005 AS DOUBLE)
      UNION ALL SELECT CAST(0.001 AS DOUBLE)
    )
    SELECT t.event_type, e.epsilon, t.n_available,
           -- n >= ln(2/delta) / (2 eps^2) at delta = 0.05
           CAST(CEIL(LN(2.0 / 0.05) / (2 * e.epsilon * e.epsilon))
                AS BIGINT) AS n_required,
           CASE WHEN t.n_available
                     >= CEIL(LN(2.0 / 0.05) / (2 * e.epsilon * e.epsilon))
                THEN 1 ELSE 0 END AS measurable_today
    FROM traffic t CROSS JOIN eps e
    ORDER BY t.event_type, e.epsilon DESC
"""

register_sql(
    "x490_dkw_sample_size",
    spark_sql=_X490,
    duckdb_sql=_X490,
    tags=("planning", "stats"),
)
