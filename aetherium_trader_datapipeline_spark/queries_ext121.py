"""Wave 121 (x436–x438): physical-plan & tokenizer planning reports.

x436 — tokenizer fertility by source: whitespace words vs a
deterministic ⌈len/4⌉-per-word subword proxy (the x44 counting rule),
reported as tokens-per-word (fertility) and bytes-per-token — the
cross-corpus efficiency table a team reads before choosing a tokenizer
budget.  Pure integer sums; ratios are final-row IEEE.

x437 — join shuffle-cost model for the three fact joins the TPC-H keys
exercise: per side, rows × fixed payload width estimates shuffle bytes;
the build side's max-key group count over its average gives the skew
factor; the recommendation column applies the 10 MB broadcast / 3x skew
rules.  This is the statistics table an optimizer's join planner
consumes — computed exactly, not sampled.

x438 — Bloom-filter sizing for semi-join pruning: for three part-filter
selectivities, the exact ndv of surviving build keys sizes the filter
(m = ⌈−n·ln p / ln²2⌉ bits at p = 1%, k = max(1, ⌊m/n·ln2⌋)) and the
probe side's exact non-member share bounds the scan rows a pushed-down
filter would skip.  The planning math behind x195's measured Bloom
prune.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x436: tokenizer fertility ------------------------------------------------------

_X436 = """
    WITH words AS (
      SELECT source, LENGTH(w) AS wl
      FROM {wordsrc}
      WHERE w != ''
    ),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(wl) AS BIGINT) AS n_bytes,
             CAST(SUM((wl + 3) {intdiv} 4) AS BIGINT) AS n_subwords
      FROM words GROUP BY source
    )
    SELECT source, n_words, n_bytes, n_subwords,
           ROUND(CAST(n_subwords AS DOUBLE) / n_words, 6) AS fertility,
           ROUND(CAST(n_bytes AS DOUBLE) / n_subwords, 6) AS bytes_per_token
    FROM per_source ORDER BY source
"""

_WORDSRC_SPARK = """(
      SELECT source, w
      FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
    ) ws"""
_WORDSRC_DUCK = """(
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents
    ) ws"""

register_sql(
    "x436_tokenizer_fertility",
    spark_sql=_X436.format(wordsrc=_WORDSRC_SPARK, intdiv="DIV"),
    duckdb_sql=_X436.format(wordsrc=_WORDSRC_DUCK, intdiv="//"),
    tags=("text", "planning"),
)

# -- x437: join shuffle-cost model ---------------------------------------------------

_X437 = """
    WITH ok AS (
      SELECT CAST(MAX(cnt) AS BIGINT) AS max_ok,
             CAST(SUM(cnt) AS BIGINT) AS n
      FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey) g
    ),
    pk AS (
      SELECT CAST(MAX(cnt) AS BIGINT) AS max_pk
      FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey) g
    ),
    li AS (
      SELECT ok.n, ok.max_ok, pk.max_pk FROM ok CROSS JOIN pk
    ),
    od AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_cust
      FROM orders
    ),
    cu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
    pa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part),
    cand AS (
      -- payload widths: fixed per joined column set (bytes/row)
      SELECT 'orders_x_lineitem' AS join_name,
             od.n AS build_rows, 24 AS build_width,
             li.n AS probe_rows, 40 AS probe_width,
             CAST(li.max_ok AS BIGINT) AS max_key_rows,
             CAST(li.n AS DOUBLE) / od.n AS avg_key_rows
      FROM od CROSS JOIN li
      UNION ALL
      SELECT 'customer_x_orders', cu.n, 32, od.n, 24,
             CAST(od.n AS BIGINT), CAST(od.n AS DOUBLE) / od.ndv_cust
      FROM cu CROSS JOIN od
      UNION ALL
      SELECT 'part_x_lineitem', pa.n, 28, li.n, 40,
             CAST(li.max_pk AS BIGINT), CAST(li.n AS DOUBLE) / pa.n
      FROM pa CROSS JOIN li
    )
    SELECT join_name, build_rows, probe_rows,
           CAST(build_rows * build_width AS BIGINT) AS build_bytes,
           CAST(probe_rows * probe_width AS BIGINT) AS probe_bytes,
           ROUND(max_key_rows / avg_key_rows, 4) AS skew_factor,
           CASE WHEN build_rows * build_width < 10485760 THEN 'broadcast'
                WHEN max_key_rows / avg_key_rows > 3.0
                  THEN 'shuffle_hash_salted'
                ELSE 'sort_merge' END AS recommended
    FROM cand ORDER BY join_name
"""

register_sql(
    "x437_shuffle_cost_model",
    spark_sql=_X437,
    duckdb_sql=_X437,
    tags=("planning", "profiling"),
)

# -- x438: Bloom-filter sizing -------------------------------------------------------

_X438 = """
    WITH cand AS (
      SELECT 10 AS size_cap UNION ALL SELECT 25 UNION ALL SELECT 40
    ),
    build AS (
      SELECT c.size_cap,
             CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_keys
      FROM part p JOIN cand c ON p.p_size <= c.size_cap
      GROUP BY c.size_cap
    ),
    pk_counts AS (
      -- collapse the fact table ONCE; the per-candidate probe math then
      -- runs over |distinct partkeys| rows, not 3x the fact rows
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ),
    probe AS (
      SELECT c.size_cap,
             CAST(SUM(k.cnt) AS BIGINT) AS probe_rows,
             CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN k.cnt ELSE 0 END)
                  AS BIGINT) AS non_member_rows
      FROM cand c
      CROSS JOIN pk_counts k
      LEFT JOIN part p
        ON k.l_partkey = p.p_partkey AND p.p_size <= c.size_cap
      GROUP BY c.size_cap
    )
    SELECT b.size_cap, b.n_keys, pr.probe_rows, pr.non_member_rows,
           CAST(CEIL(-CAST(b.n_keys AS DOUBLE) * LN(0.01)
                     / (LN(2.0) * LN(2.0))) AS BIGINT) AS bloom_bits,
           CAST(GREATEST(1, FLOOR(
             (CEIL(-CAST(b.n_keys AS DOUBLE) * LN(0.01)
                   / (LN(2.0) * LN(2.0))) / b.n_keys) * LN(2.0)))
             AS BIGINT) AS n_hashes,
           ROUND(CAST(pr.non_member_rows AS DOUBLE) / pr.probe_rows * 0.99,
                 6) AS est_skip_share
    FROM build b JOIN probe pr ON b.size_cap = pr.size_cap
    ORDER BY b.size_cap
"""

register_sql(
    "x438_bloom_size_plan",
    spark_sql=_X438,
    duckdb_sql=_X438,
    tags=("planning", "storage"),
)
