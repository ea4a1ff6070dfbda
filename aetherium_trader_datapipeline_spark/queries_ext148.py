"""Wave 148 (x513–x515): training-mix optimization, LSH parameter
choice, and pipeline-order auditing.

x513 — greedy water-fill mix optimizer: domains ranked by quality
density (stopword-ratio proxy) are filled into a 2M-token budget up to
a 4-epoch repetition cap each; the last domain takes a partial fill.
Extends the mix family (x137 shares, x366 temperature, x367 epochs,
x410 repeat decay) with the OPTIMIZING step; all token math integer.

x514 — LSH banding chooser: for the portable-MinHash family (x129,
x280), the S-curve P(candidate) = 1 − (1 − s^r)^b is evaluated on a
21-point Jaccard grid for each (bands, rows) layout of 24 hashes; the
false-positive mass below the 0.7 threshold and false-negative mass
above it (grid-quantized trapezoids) pick the layout — the planning
math that precedes every dedup deployment.

x515 — pipeline-order audit: dedup-then-sample vs sample-then-dedup,
both at a deterministic 50% hash sample, measured EXACTLY: unique
texts surviving, duplicates leaked into the sample, and tokens kept —
the ordering decision every curation pipeline makes once and lives
with.  Pure group-size arithmetic.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x513: greedy water-fill mix ------------------------------------------------------------

_X513 = """
    WITH dom AS (
      SELECT source,
             CAST(SUM(n_chars) AS BIGINT) {intdiv} 4 AS unique_tokens,
             -- quality density proxy: stopword share (higher = cleaner)
             CAST(SUM(CASE WHEN text LIKE '%the%' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) AS quality
      FROM documents GROUP BY source
    ),
    ranked AS (
      SELECT source, unique_tokens,
             CAST(FLOOR(quality * 1e9) AS BIGINT) AS q_fp,
             4 * unique_tokens AS cap_tokens,
             ROW_NUMBER() OVER (ORDER BY quality DESC, source) AS rk
      FROM dom
    ),
    filled AS (
      SELECT source, rk, unique_tokens, q_fp, cap_tokens,
             SUM(cap_tokens) OVER (ORDER BY rk) AS cum_cap,
             SUM(cap_tokens) OVER (ORDER BY rk) - cap_tokens AS cum_before
      FROM ranked
    )
    SELECT source, CAST(rk AS BIGINT) AS quality_rank,
           unique_tokens, cap_tokens,
           ROUND(q_fp / 1e9, 6) AS quality_score,
           CAST(CASE WHEN cum_cap <= 2000000 THEN cap_tokens
                     WHEN cum_before >= 2000000 THEN 0
                     ELSE 2000000 - cum_before END AS BIGINT)
             AS allocated_tokens,
           CASE WHEN cum_cap <= 2000000 THEN 'full'
                WHEN cum_before >= 2000000 THEN 'excluded'
                ELSE 'partial' END AS fill_status
    FROM filled ORDER BY quality_rank
"""

register_sql(
    "x513_mix_waterfill",
    spark_sql=_X513.format(intdiv="DIV"),
    duckdb_sql=_X513.format(intdiv="//"),
    tags=("curation", "planning"),
)

# -- x514: LSH parameter chooser --------------------------------------------------------------

_X514 = """
    WITH layouts AS (
      SELECT 2 AS b, 12 AS r UNION ALL SELECT 3, 8 UNION ALL SELECT 4, 6
      UNION ALL SELECT 6, 4 UNION ALL SELECT 8, 3 UNION ALL SELECT 12, 2
    ),
    grid AS (
      SELECT CAST(g AS DOUBLE) / 20 AS s
      FROM {gensrc}
    ),
    curve AS (
      -- P(candidate at similarity s) = 1 - (1 - s^r)^b, 1e12-quantized
      SELECT l.b, l.r, g.s,
             CAST(FLOOR((1 - POWER(1 - POWER(g.s, l.r), l.b)) * 1e12)
                  AS BIGINT) AS p_fp
      FROM layouts l CROSS JOIN grid g
    ),
    masses AS (
      SELECT b, r,
             CAST(SUM(CASE WHEN s < 0.7 THEN p_fp ELSE 0 END) AS BIGINT)
               AS fp_mass,
             CAST(SUM(CASE WHEN s >= 0.7 THEN 1000000000000 - p_fp
                           ELSE 0 END) AS BIGINT) AS fn_mass
      FROM curve GROUP BY b, r
    )
    SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
           ROUND(fp_mass / 1e12 / 20, 6) AS false_positive_mass,
           ROUND(fn_mass / 1e12 / 20, 6) AS false_negative_mass,
           ROUND((fp_mass + fn_mass) / 1e12 / 20, 6) AS total_error_mass,
           CASE WHEN fp_mass + fn_mass
                     = MIN(fp_mass + fn_mass) OVER () THEN 1 ELSE 0 END
             AS is_chosen
    FROM masses ORDER BY bands
"""

_GEN_SPARK = "(SELECT explode(sequence(0, 20)) AS g) t"
_GEN_DUCK = "(SELECT unnest(range(0, 21)) AS g) t"

register_sql(
    "x514_lsh_param_plan",
    spark_sql=_X514.format(gensrc=_GEN_SPARK),
    duckdb_sql=_X514.format(gensrc=_GEN_DUCK),
    tags=("dedup", "planning"),
)

# -- x515: pipeline-order audit ------------------------------------------------------------------

_X515 = """
    WITH docs AS (
      SELECT doc_id, text, n_chars,
             CASE WHEN ((doc_id * 2654435761) {intdiv} 1024) % 2 = 0
                  THEN 1 ELSE 0 END AS in_sample
      FROM documents
    ),
    -- order A: dedup first (keep min doc_id per text), then sample
    dedup_first AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS docs_kept,
             CAST(SUM(n_chars) AS BIGINT) {intdiv} 4 AS tokens_kept,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS unique_texts
      FROM (
        SELECT text, n_chars, in_sample,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rk
        FROM docs
      ) d WHERE rk = 1 AND in_sample = 1
    ),
    -- order B: sample first, then dedup inside the sample
    sample_first AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS docs_kept,
             CAST(SUM(n_chars) AS BIGINT) {intdiv} 4 AS tokens_kept,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS unique_texts
      FROM (
        SELECT text, n_chars,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rk
        FROM docs WHERE in_sample = 1
      ) d WHERE rk = 1
    )
    SELECT 'A_dedup_then_sample' AS pipeline_order,
           docs_kept, unique_texts, tokens_kept
    FROM dedup_first
    UNION ALL
    SELECT 'B_sample_then_dedup', docs_kept, unique_texts, tokens_kept
    FROM sample_first
    ORDER BY pipeline_order
"""

register_sql(
    "x515_pipeline_order_audit",
    spark_sql=_X515.format(intdiv="DIV"),
    duckdb_sql=_X515.format(intdiv="//"),
    tags=("curation", "dedup"),
)
