"""Eighteenth extension wave — corpus-modeling and pipeline-hygiene
queries a training-data platform runs between dedup and shard-writing.
All DuckDB hash-verified; float policy follows the repo convention
(integer/decimal aggregation, per-row double math only on counts).

- x156 bigram-LM scoring: add-one-smoothed corpus bigram model, per-doc
  mean negative log2 likelihood (the cheap KenLM-style quality signal).
- x157 duplicated-span fraction: per-doc fraction of 8-token shingles
  shared with any other doc — the exact-substring dedup *signal* (Lee et
  al., "Deduplicating Training Data Makes Language Models Better") whose
  threshold pass feeds the suffix-array-style span remover.
- x158 linear quality-model scoring: broadcast one-row weight relation ×
  per-row features (the fastText-classifier stand-in; swapping learned
  weights in changes nothing about the plan).
- x159 deterministic shard assignment: multiplicative-hash shard + intra-
  shard position — the global-shuffle/shard-writer step before training.
- x160 URL parse/normalize: parse_url host/path/query extraction and the
  canonical form used for crawl-level URL dedup.
- x161 rolling anomaly flags: per-user 50-event trailing window, 3-sigma
  rule evaluated entirely in integer cents ((n·x−s)² > 9·(n·ss−s²)) so
  the flag is engine-exact — no float variance anywhere.

Reference parity: these extend the curation family (SURVEY.md §2.3);
the anomaly detector is the monitoring analogue of the reference's
heartbeat/stall thresholds (application/src/backfill_service.rs:82-115
uses fixed staleness cutoffs; here the cutoff is data-driven).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x156: bigram language-model scoring ------------------------------------
#
# Two shuffles that matter at scale: the self-join building bigram
# occurrences re-uses the doc_id partitioning of the posexplode (Catalyst
# keeps it a single exchange), and the count tables join back to
# occurrences on word keys — at 100 TB the bigram-count table is the only
# wide state, and it is Zipf-concentrated, so AQE's skew split plus the
# broadcast of the (scalar) vocab count keep the plan hash-join only.
# Per-term log2 runs on integer counts (engine-deterministic); the sum is
# DECIMAL(18,9)-exact per x146's convention.

register_sql(
    "x156_bigram_lm_score",
    headline=True,
    # r13: the Spark side builds bigram occurrences by exploding adjacent
    # (ws[i], ws[i+1]) pairs straight off the split array instead of the
    # positional self-join `toks a JOIN toks b ON a.doc_id = b.doc_id AND
    # b.idx = a.idx + 1` (kept as the DuckDB oracle): CTE inlining ran the
    # explode subtree once per reference and the self-join added a
    # doc_id-keyed exchange pair — the plan showed 6 parquet scans and 10
    # exchanges (guide §2.3 "shuffle fewer bytes" / §2.4). vocab also
    # derives from uni (COUNT of its rows == COUNT(DISTINCT w)) instead of
    # a third distinct-aggregate over the token stream. After: 4 scans
    # (occ ×2, uni ×2 — the two remaining multi-reference CTEs), 7
    # exchanges, no self-join. Same multiset of (doc_id, w1, w2): split
    # yields at least one element, the size(ws) >= 2 guard excludes
    # bigram-less docs (and keeps sequence() ascending), and element_at is
    # 1-based over the same array posexplode indexed 0-based.
    spark_sql="""
    WITH toks AS (
      SELECT doc_id, w FROM documents
      LATERAL VIEW explode(split(lower(text), ' ')) t AS w),
    occ AS (
      SELECT doc_id, b.w1, b.w2 FROM (
        SELECT doc_id, split(lower(text), ' ') AS ws
        FROM documents WHERE size(split(lower(text), ' ')) >= 2) d
      LATERAL VIEW explode(
        transform(sequence(1, size(ws) - 1),
                  i -> named_struct('w1', element_at(ws, i),
                                    'w2', element_at(ws, i + 1)))) t AS b),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    bc AS (SELECT w1, w2, COUNT(*) AS c FROM occ GROUP BY w1, w2),
    vocab AS (SELECT COUNT(*) AS v FROM uni),
    scored AS (
      SELECT occ.doc_id,
             CAST(log2(CAST(bc.c + 1 AS DOUBLE) / (uni.c + vocab.v))
                  AS DECIMAL(18,9)) AS lp
      FROM occ
      JOIN bc ON occ.w1 = bc.w1 AND occ.w2 = bc.w2
      JOIN uni ON occ.w1 = uni.w
      CROSS JOIN vocab)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 4) AS avg_nll_bits
    FROM scored GROUP BY doc_id ORDER BY doc_id LIMIT 300
    """,
    duckdb_sql="""
    WITH toks AS (
      SELECT doc_id, i AS idx, ws[i] AS w FROM (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        LATERAL unnest(generate_series(1, len(ws))) AS t(i)),
    occ AS (
      SELECT a.doc_id, a.w AS w1, b.w AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1),
    bc AS (SELECT w1, w2, COUNT(*) AS c FROM occ GROUP BY w1, w2),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
    scored AS (
      SELECT occ.doc_id,
             CAST(log2(CAST(bc.c + 1 AS DOUBLE) / (uni.c + vocab.v))
                  AS DECIMAL(18,9)) AS lp
      FROM occ
      JOIN bc ON occ.w1 = bc.w1 AND occ.w2 = bc.w2
      JOIN uni ON occ.w1 = uni.w
      CROSS JOIN vocab)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 4) AS avg_nll_bits
    FROM scored GROUP BY doc_id ORDER BY doc_id LIMIT 300
    """,
    tags=("text", "llm", "stats"),
)

# -- x157: duplicated-span (8-gram) fraction --------------------------------
#
# The shingle table is the same shape x46/x129 build for near-dup; here we
# keep per-occurrence rows and join back the distinct-doc count so each
# document learns what fraction of its spans exist elsewhere. At scale:
# one groupBy on the shingle hash (Zipf head guarded by the same
# stop-shingle cap as dedup.py), one join back on that key — no all-pairs
# anywhere. Docs shorter than the window score NULL-free zero via the
# >= 8 guard.

register_sql(
    "x157_dup_span_fraction",
    headline=True,
    # r13: the Spark side replaces oc's GROUP BY h re-aggregation + join
    # (kept as the DuckDB oracle shape) with COUNT(*) OVER (PARTITION BY h)
    # on the oc grid itself: CTE inlining computed the whole
    # scan→explode→groupBy(doc,h) subtree twice (plan: 2 parquet scans, 5
    # exchanges; guide §2.4). The window input is the (doc, shingle-hash)
    # grid — one row per doc per distinct shingle — so a partition is
    # exactly the doc-frequency of one shingle, the same cardinality the
    # GROUP BY h aggregate and its join key carried. After: 1 scan, 3
    # exchanges. The 8-word join string is still built once and never
    # shuffled (64-bit key only; collision odds ~1e-8 at 1M spans).
    spark_sql="""
    WITH sh AS (
      SELECT doc_id, xxhash64(array_join(slice(ws, i, 8), ' ')) AS h
      FROM (SELECT doc_id, split(lower(text), ' ') AS ws FROM documents)
      LATERAL VIEW explode(sequence(1, size(ws) - 7)) t AS i
      WHERE size(ws) >= 8),
    oc AS (SELECT doc_id, h, COUNT(*) AS n_occ FROM sh GROUP BY doc_id, h),
    wc AS (SELECT doc_id, n_occ, COUNT(*) OVER (PARTITION BY h) AS nd FROM oc)
    SELECT doc_id,
           SUM(n_occ) AS n_spans,
           SUM(CASE WHEN nd > 1 THEN n_occ ELSE 0 END) AS n_dup_spans,
           ROUND(SUM(CASE WHEN nd > 1 THEN n_occ ELSE 0 END)
                 / CAST(SUM(n_occ) AS DOUBLE), 4) AS dup_frac
    FROM wc
    GROUP BY doc_id ORDER BY dup_frac DESC, doc_id LIMIT 300
    """,
    duckdb_sql="""
    WITH sh AS (
      SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS shingle
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
            FROM documents) d,
      LATERAL unnest(generate_series(1, len(ws) - 7)) AS t(i)
      WHERE len(ws) >= 8),
    cnt AS (SELECT shingle, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY shingle)
    SELECT sh.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN cnt.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           ROUND(SUM(CASE WHEN cnt.nd > 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS dup_frac
    FROM sh JOIN cnt ON sh.shingle = cnt.shingle
    GROUP BY sh.doc_id ORDER BY dup_frac DESC, doc_id LIMIT 300
    """,
    tags=("dedup", "llm", "text"),
)

# -- x158: linear quality-model scoring -------------------------------------
#
# A one-row weight relation cross-joined (broadcast — Catalyst plans
# BroadcastNestedLoopJoin over a single row, i.e. free) against per-row
# features; the score is Σ wᵢ·fᵢ in per-row double math on exact counts.
# This is the plan a learned fastText/logistic quality filter runs at
# 100 TB: weights change, the physical plan does not.

register_sql(
    "x158_quality_model_score",
    spark_sql="""
    WITH w AS (SELECT 0.35 AS w_logtok, -2.0 AS w_digit, -1.5 AS w_caps,
                      0.8 AS w_meanlen, -1.25 AS bias),
    feat AS (
      SELECT doc_id,
             size(split(text, ' ')) AS n_tok,
             length(text) AS n_ch,
             length(regexp_replace(text, '[^0-9]', '')) AS n_digit,
             length(regexp_replace(text, '[^A-Z]', '')) AS n_caps
      FROM documents)
    SELECT doc_id,
           ROUND(w.bias
                 + w.w_logtok * log2(CAST(n_tok + 1 AS DOUBLE))
                 + w.w_digit * (n_digit / CAST(n_ch AS DOUBLE))
                 + w.w_caps * (n_caps / CAST(n_ch AS DOUBLE))
                 + w.w_meanlen * (n_ch / CAST(n_tok + 1 AS DOUBLE) / 8.0),
                 4) AS score,
           CASE WHEN w.bias
                 + w.w_logtok * log2(CAST(n_tok + 1 AS DOUBLE))
                 + w.w_digit * (n_digit / CAST(n_ch AS DOUBLE))
                 + w.w_caps * (n_caps / CAST(n_ch AS DOUBLE))
                 + w.w_meanlen * (n_ch / CAST(n_tok + 1 AS DOUBLE) / 8.0) > 0
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM feat CROSS JOIN w
    ORDER BY doc_id LIMIT 300
    """,
    duckdb_sql="""
    WITH w AS (SELECT 0.35 AS w_logtok, -2.0 AS w_digit, -1.5 AS w_caps,
                      0.8 AS w_meanlen, -1.25 AS bias),
    feat AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             length(text) AS n_ch,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_caps
      FROM documents)
    SELECT doc_id,
           ROUND(w.bias
                 + w.w_logtok * log2(CAST(n_tok + 1 AS DOUBLE))
                 + w.w_digit * (n_digit / CAST(n_ch AS DOUBLE))
                 + w.w_caps * (n_caps / CAST(n_ch AS DOUBLE))
                 + w.w_meanlen * (n_ch / CAST(n_tok + 1 AS DOUBLE) / 8.0),
                 4) AS score,
           CASE WHEN w.bias
                 + w.w_logtok * log2(CAST(n_tok + 1 AS DOUBLE))
                 + w.w_digit * (n_digit / CAST(n_ch AS DOUBLE))
                 + w.w_caps * (n_caps / CAST(n_ch AS DOUBLE))
                 + w.w_meanlen * (n_ch / CAST(n_tok + 1 AS DOUBLE) / 8.0) > 0
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM feat CROSS JOIN w
    ORDER BY doc_id LIMIT 300
    """,
    tags=("llm", "curation"),
)

# -- x159: deterministic shard assignment -----------------------------------
#
# The shard-writer step: Knuth multiplicative hash → shard, row_number
# inside each shard → position. Exactly one shuffle (the window's
# PARTITION BY shard), which is also the write partitioning — at 100 TB
# this plan IS the output layout, no extra exchange before the sink. The
# hash is integer math, reproducible across engines and runs.

register_sql(
    "x159_shard_assign",
    spark_sql="""
    WITH h AS (
      SELECT doc_id, n_chars,
             (doc_id * 2654435761) % 4294967296 AS hv
      FROM documents)
    SELECT CAST(hv % 8 AS INT) AS shard,
           ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos,
           doc_id, n_chars
    FROM h ORDER BY shard, pos LIMIT 500
    """,
    duckdb_sql="""
    WITH h AS (
      SELECT doc_id, n_chars,
             (doc_id * 2654435761) % 4294967296 AS hv
      FROM documents)
    SELECT CAST(hv % 8 AS INT) AS shard,
           ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos,
           doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM h ORDER BY shard, pos LIMIT 500
    """,
    tags=("training", "sampling", "layout"),
)

# -- x160: URL parse + canonicalization -------------------------------------
#
# Crawl-pipeline hygiene: split a URL into host/path/query, emit the
# canonical (scheme-less, lowercased-host, query-stripped) form used as
# the URL-dedup key. Spark side uses the built-in parse_url (codegen'd);
# the oracle replays it with regexes. Pure per-row string ops — at scale
# this is a map-only stage fused into the scan.

register_sql(
    "x160_url_canonicalize",
    spark_sql="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', upper(source), '.Example.org/', lang,
                    '/doc/', CAST(doc_id AS STRING), '?ref=r',
                    CAST(doc_id % 7 AS STRING), '&utm=x') AS url
      FROM documents)
    SELECT doc_id,
           lower(parse_url(url, 'HOST')) AS host,
           parse_url(url, 'PATH') AS path,
           parse_url(url, 'QUERY', 'ref') AS ref,
           concat(lower(parse_url(url, 'HOST')), parse_url(url, 'PATH')) AS canonical
    FROM u ORDER BY doc_id LIMIT 300
    """,
    duckdb_sql="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', upper(source), '.Example.org/', lang,
                    '/doc/', CAST(doc_id AS VARCHAR), '?ref=r',
                    CAST(doc_id % 7 AS VARCHAR), '&utm=x') AS url
      FROM documents)
    SELECT doc_id,
           lower(regexp_extract(url, 'https?://([^/?#]+)', 1)) AS host,
           regexp_extract(url, 'https?://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref,
           concat(lower(regexp_extract(url, 'https?://([^/?#]+)', 1)),
                  regexp_extract(url, 'https?://[^/?#]+(/[^?#]*)', 1)) AS canonical
    FROM u ORDER BY doc_id LIMIT 300
    """,
    tags=("text", "functions", "dedup"),
)

# -- x161: rolling 3-sigma anomaly flags, integer-exact ---------------------
#
# Monitoring-grade anomaly detection with zero float state: values become
# integer cents, the trailing 50-event window keeps (n, Σx, Σx²), and the
# 3-sigma rule is the cross-multiplied inequality (n·x−s)² > 9·(n·ss−s²)
# — every quantity a BIGINT, so Spark and DuckDB agree bit-for-bit (no
# variance-of-doubles drift). Warm-up rows (n < 20) never flag. At scale:
# one shuffle on user_id; the window state is three longs per row.

register_sql(
    "x161_rolling_anomaly",
    headline=True,
    spark_sql="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
      FROM events),
    w AS (
      SELECT user_id, event_id, xc,
             COUNT(*) OVER win AS n,
             SUM(xc) OVER win AS s,
             SUM(xc * xc) OVER win AS ss
      FROM d
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
    SELECT user_id,
           COUNT(*) AS n_events,
           SUM(CASE WHEN n >= 20
                     AND (n * xc - s) * (n * xc - s) > 9 * (n * ss - s * s)
                    THEN 1 ELSE 0 END) AS n_anomalies
    FROM w GROUP BY user_id ORDER BY user_id
    """,
    duckdb_sql="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
      FROM events),
    w AS (
      SELECT user_id, event_id, xc,
             COUNT(*) OVER win AS n,
             CAST(SUM(xc) OVER win AS BIGINT) AS s,
             CAST(SUM(xc * xc) OVER win AS BIGINT) AS ss
      FROM d
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN n >= 20
                     AND (n * xc - s) * (n * xc - s) > 9 * (n * ss - s * s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM w GROUP BY user_id ORDER BY user_id
    """,
    tags=("timeseries", "window", "monitoring"),
)
