"""Seventeenth extension wave — round-3 additions, all DuckDB
hash-verified:

Training-data prep (documents): x143 overlapping token-window chunking
(pure split/sequence/explode/slice — JVM-side fan-out), x144 PII
redaction (global regexp_replace chains, codegen'd), x146 word-entropy
lexical diversity (decimal-exact Σ c·log2 c), x154 bigram-PMI
collocation mining, x155 Spark 4 Arrow-optimized scalar UDF surface.

Joins/time-series (events): x147 interval-coverage range join, x148/x149
forward/nearest as-of directions (operators/asof.py), x153 cascading
OHLCV rollup (minute → hour K-bars; mergeability proven in pytest).

Data quality: x151 FK orphan audit (anti-join per edge), x152 per-column
profile (null fraction / exact distinct / range).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x143: overlapping token-window chunking --------------------------------
#
# Window 128 tokens, stride 64 → every token belongs to ≤2 chunks; chunk
# count per doc is ceil(n_tokens/64). At scale this is a narrow map-side
# fan-out (no shuffle): the explode multiplies rows before the sink's own
# partitioning, exactly where a tokenizer stage would consume them.

register_sql(
    "x143_doc_chunking",
    headline=True,
    spark_sql="""
    SELECT doc_id, ci AS chunk_idx,
           array_join(slice(ws, ci * 64 + 1, 128), ' ') AS chunk_text,
           CAST(size(slice(ws, ci * 64 + 1, 128)) AS INT) AS n_tokens
    FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents)
    LATERAL VIEW explode(sequence(0, CAST(ceil(size(ws) / 64.0) AS INT) - 1)) t AS ci
    ORDER BY doc_id, chunk_idx LIMIT 500
    """,
    duckdb_sql="""
    SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
           array_to_string(ws[ci * 64 + 1 : ci * 64 + 128], ' ') AS chunk_text,
           CAST(len(ws[ci * 64 + 1 : ci * 64 + 128]) AS INT) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         LATERAL unnest(generate_series(0, CAST(ceil(len(ws) / 64.0) AS INT) - 1)) AS t(ci)
    ORDER BY doc_id, chunk_idx LIMIT 500
    """,
    tags=("text", "llm"),
)

# -- x144: PII redaction ----------------------------------------------------
#
# The fixture corpus carries no PII, so the query plants deterministic
# synthetic email/phone strings per doc and then scrubs them — the scrub
# chain (global regexp_replace, expression-only) is what a real pipeline
# runs over raw crawl text. n_hits counts replacements via length deltas,
# so a regex that over- or under-matches hash-mismatches.

register_sql(
    "x144_pii_redact",
    spark_sql="""
    WITH dirty AS (
      SELECT doc_id,
             concat(substr(text, 1, 80), ' contact user', doc_id,
                    '@mail.example tel 555-01', CAST(doc_id % 100 AS STRING),
                    ' and admin', doc_id, '@corp.example') AS raw
      FROM documents),
    scrubbed AS (
      SELECT doc_id, raw,
             regexp_replace(regexp_replace(raw,
                 '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>'),
                 '555-[0-9]+', '<PHONE>') AS clean
      FROM dirty)
    SELECT doc_id, clean,
           CAST((length(raw) - length(regexp_replace(raw, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', ''))) > 0 AS INT)
             + CAST((length(raw) - length(regexp_replace(raw, '555-[0-9]+', ''))) > 0 AS INT) AS n_pii_kinds
    FROM scrubbed ORDER BY doc_id LIMIT 300
    """,
    duckdb_sql="""
    WITH dirty AS (
      SELECT doc_id,
             concat(substr(text, 1, 80), ' contact user', doc_id,
                    '@mail.example tel 555-01', CAST(doc_id % 100 AS VARCHAR),
                    ' and admin', doc_id, '@corp.example') AS raw
      FROM documents),
    scrubbed AS (
      SELECT doc_id, raw,
             regexp_replace(regexp_replace(raw,
                 '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
                 '555-[0-9]+', '<PHONE>', 'g') AS clean
      FROM dirty)
    SELECT doc_id, clean,
           CAST((length(raw) - length(regexp_replace(raw, '[A-Za-z0-9_.]+@[A-Za-z0-9.]+', '', 'g'))) > 0 AS INT)
             + CAST((length(raw) - length(regexp_replace(raw, '555-[0-9]+', '', 'g'))) > 0 AS INT) AS n_pii_kinds
    FROM scrubbed ORDER BY doc_id LIMIT 300
    """,
    tags=("text", "llm", "regex"),
)

# -- x146: word-distribution Shannon entropy --------------------------------
#
# Lexical diversity h = log2(n) − Σ c·log2(c) / n over per-doc word counts.
# Σ c·log2(c) accumulates per-term DECIMAL(18,9) values (each term is the
# same IEEE double in both engines before the cast), so the aggregate is
# exact and order-independent; only the final combine runs in double.

register_sql(
    "x146_word_entropy",
    spark_sql="""
    WITH counts AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM (SELECT doc_id, explode(split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, w),
    agg AS (
      SELECT doc_id, SUM(c) AS n,
             SUM(CAST(c * log2(c) AS DECIMAL(18,9))) AS s
      FROM counts GROUP BY doc_id)
    SELECT doc_id,
           ROUND(log2(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n, 4) AS entropy_bits,
           CAST(n AS BIGINT) AS n_tokens
    FROM agg ORDER BY doc_id LIMIT 300
    """,
    duckdb_sql="""
    WITH counts AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, w),
    agg AS (
      SELECT doc_id, SUM(c) AS n,
             SUM(CAST(c * log2(c) AS DECIMAL(18,9))) AS s
      FROM counts GROUP BY doc_id)
    SELECT doc_id,
           ROUND(log2(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n, 4) AS entropy_bits,
           CAST(n AS BIGINT) AS n_tokens
    FROM agg ORDER BY doc_id LIMIT 300
    """,
    tags=("text", "llm", "stats"),
)

# -- x147: interval-coverage range join -------------------------------------
#
# Each 'click' joined to the 15-minute windows opened by the same user's
# 'view' events — the interval-overlap join shape (ad attribution, session
# stitching). Catalyst plans the equi-part (user_id) as the shuffle key and
# evaluates the range predicate inside the join; at 100 TB the equality key
# keeps this a hash join, never a cartesian.

register_sql(
    "x147_interval_join",
    spark_sql="""
    SELECT c.event_id,
           COUNT(v.event_id) AS n_cover,
           MAX(v.ts) AS last_view_ts
    FROM events c
    LEFT JOIN events v
      ON c.user_id = v.user_id AND v.event_type = 'view'
         AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 15 MINUTES
         AND v.event_id != c.event_id
    WHERE c.event_type = 'click'
    GROUP BY c.event_id ORDER BY c.event_id LIMIT 500
    """,
    duckdb_sql="""
    SELECT c.event_id,
           COUNT(v.event_id) AS n_cover,
           CAST(MAX(v.ts) AS TIMESTAMP) AS last_view_ts
    FROM events c
    LEFT JOIN events v
      ON c.user_id = v.user_id AND v.event_type = 'view'
         AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 15 MINUTE
         AND v.event_id != c.event_id
    WHERE c.event_type = 'click'
    GROUP BY c.event_id ORDER BY c.event_id LIMIT 500
    """,
    tags=("join", "timeseries"),
)

# -- x148/x149: as-of join directions (operators/asof.py) -------------------
#
# The tagged-union window as-of now covers all three merge_asof directions;
# these keys hash-verify forward and nearest (backward is q10) against a
# naive range-join oracle. Fixture ts is unique per user, so "earliest
# following" / "closest" are well-defined without further tie-breaks
# beyond nearest's backward preference.

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables


def _asof_direction_query(direction: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from aetherium_trader_datapipeline_spark.operators.asof import asof_join

        t = load_tables(spark, sf_dir)
        ev = t["events"]
        clicks = ev.where("event_type = 'click'").select("user_id", "ts", "event_id")
        views = ev.where("event_type = 'view'").select("user_id", "ts", "event_id", "value")
        out = asof_join(
            clicks, views, "ts", ["user_id"], ["event_id", "value"],
            direction=direction,
        )
        return (
            out.where(F.col("event_id_r").isNotNull())
            .select(
                "event_id",
                F.col("event_id_r").alias("view_event_id"),
                F.round("value_r", 4).alias("view_value"),
            )
            .orderBy("event_id")
            .limit(300)
        )

    return run


register(
    "x148_asof_forward",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    j AS (
      SELECT c.event_id, v.event_id AS view_event_id, v.value AS vv,
             ROW_NUMBER() OVER (PARTITION BY c.event_id ORDER BY v.ts) AS rn
      FROM c JOIN v ON c.user_id = v.user_id AND v.ts >= c.ts)
    SELECT event_id, view_event_id, ROUND(vv, 4) AS view_value
    FROM j WHERE rn = 1 ORDER BY event_id LIMIT 300
    """,
    tags=("join", "asof"),
)(_asof_direction_query("forward"))

register(
    "x149_asof_nearest",
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    j AS (
      SELECT c.event_id, v.event_id AS view_event_id, v.value AS vv,
             ROW_NUMBER() OVER (PARTITION BY c.event_id
                 ORDER BY ABS(epoch_us(v.ts) - epoch_us(c.ts)),
                          CASE WHEN v.ts <= c.ts THEN 0 ELSE 1 END) AS rn
      FROM c JOIN v ON c.user_id = v.user_id)
    SELECT event_id, view_event_id, ROUND(vv, 4) AS view_value
    FROM j WHERE rn = 1 ORDER BY event_id LIMIT 300
    """,
    tags=("join", "asof"),
)(_asof_direction_query("nearest"))

# -- x151/x152: data-quality operators --------------------------------------
#
# A pipeline feeding 100 TB of training data needs the audit pass, not just
# the transforms: referential-integrity violations between fact and dim
# tables (anti-join counts — each an independent broadcast-dim anti join),
# and per-column profiling (null fraction, exact distinct, numeric range)
# of the kind schema-drift monitors diff between ingest runs.

register_sql(
    "x151_fk_audit",
    spark_sql="""
    SELECT 'lineitem.l_orderkey->orders' AS fk, COUNT(*) AS n_orphans
    FROM lineitem WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem.l_partkey->part_subset', COUNT(*)
    FROM lineitem WHERE NOT EXISTS (
      SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_partkey % 7 != 0)
    UNION ALL
    SELECT 'orders.o_custkey->customer', COUNT(*)
    FROM orders WHERE NOT EXISTS (
      SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    ORDER BY fk
    """,
    duckdb_sql="""
    SELECT 'lineitem.l_orderkey->orders' AS fk, COUNT(*) AS n_orphans
    FROM lineitem WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem.l_partkey->part_subset', COUNT(*)
    FROM lineitem WHERE NOT EXISTS (
      SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_partkey % 7 != 0)
    UNION ALL
    SELECT 'orders.o_custkey->customer', COUNT(*)
    FROM orders WHERE NOT EXISTS (
      SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    ORDER BY fk
    """,
    tags=("quality", "join"),
)

register_sql(
    "x152_column_profile",
    spark_sql="""
    SELECT 'o_totalprice' AS col,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT o_totalprice) AS n_distinct,
           ROUND(MIN(o_totalprice), 2) AS min_v, ROUND(MAX(o_totalprice), 2) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*),
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderdate),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM orders
    ORDER BY col
    """,
    duckdb_sql="""
    SELECT 'o_totalprice' AS col,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT o_totalprice) AS n_distinct,
           ROUND(MIN(o_totalprice), 2) AS min_v, ROUND(MAX(o_totalprice), 2) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*),
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderdate),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM orders
    ORDER BY col
    """,
    tags=("quality", "agg"),
)

# -- x153: cascading OHLCV rollup -------------------------------------------
#
# Hourly K-bars computed FROM minute K-bars (open = open of first minute,
# close = close of last, high/low = max/min, volume = sum) — the
# mergeability property that lets a tick store keep only fine-grained bars
# and roll coarser granularities on demand (the reference docs' on-the-fly
# K-bar design, docs/…系統設計文件.md:69-72, extended to the rollup cascade a
# ClickHouse materialized-view hierarchy would hold).
# tests/test_rollup_sketches.py asserts cascade == direct-from-ticks.

register_sql(
    "x153_ohlcv_cascade",
    headline=True,
    spark_sql="""
    WITH m AS (
      SELECT user_id, date_trunc('minute', ts) AS wm,
             MIN_BY(value, ts) AS o, MAX(value) AS h,
             MIN(value) AS l, MAX_BY(value, ts) AS c,
             SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS vol
      FROM events GROUP BY user_id, date_trunc('minute', ts)),
    hr AS (
      SELECT user_id, date_trunc('hour', wm) AS wh,
             MIN_BY(o, wm) AS open, MAX(h) AS high,
             MIN(l) AS low, MAX_BY(c, wm) AS close, SUM(vol) AS vol
      FROM m GROUP BY user_id, date_trunc('hour', wm))
    SELECT user_id, wh,
           ROUND(open, 4) AS open, ROUND(high, 4) AS high,
           ROUND(low, 4) AS low, ROUND(close, 4) AS close,
           ROUND(CAST(vol AS DOUBLE), 4) AS vol
    FROM hr ORDER BY user_id, wh LIMIT 500
    """,
    duckdb_sql="""
    WITH m AS (
      SELECT user_id, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS wm,
             MIN_BY(value, ts) AS o, MAX(value) AS h,
             MIN(value) AS l, MAX_BY(value, ts) AS c,
             SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS vol
      FROM events GROUP BY user_id, date_trunc('minute', CAST(ts AS TIMESTAMP))),
    hr AS (
      SELECT user_id, date_trunc('hour', wm) AS wh,
             MIN_BY(o, wm) AS open, MAX(h) AS high,
             MIN(l) AS low, MAX_BY(c, wm) AS close, SUM(vol) AS vol
      FROM m GROUP BY user_id, date_trunc('hour', wm))
    SELECT user_id, CAST(wh AS TIMESTAMP) AS wh,
           ROUND(open, 4) AS open, ROUND(high, 4) AS high,
           ROUND(low, 4) AS low, ROUND(close, 4) AS close,
           ROUND(CAST(vol AS DOUBLE), 4) AS vol
    FROM hr ORDER BY user_id, wh LIMIT 500
    """,
    tags=("timeseries", "ohlcv", "rollup"),
)

# -- x154: bigram PMI (collocation mining) ----------------------------------
#
# Pointwise mutual information over corpus bigrams: the phrase-mining pass
# that finds multi-word units worth treating as tokens. All counting is
# exact integer aggregation; the PMI itself is per-row double math on
# counts (no float SUMs), so it is engine-deterministic without decimal
# tricks.

register_sql(
    "x154_bigram_pmi",
    spark_sql="""
    WITH toks AS (
      SELECT doc_id, w, idx FROM documents
      LATERAL VIEW posexplode(split(lower(text), ' ')) t AS idx, w),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    tot AS (SELECT SUM(c) AS n FROM uni),
    big AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
      GROUP BY a.w, b.w),
    btot AS (SELECT SUM(c) AS bn FROM big)
    SELECT w1, w2, big.c AS c,
           ROUND(log2((big.c / bn) / ((u1.c / n) * (u2.c / n))), 4) AS pmi
    FROM big JOIN uni u1 ON big.w1 = u1.w JOIN uni u2 ON big.w2 = u2.w
    CROSS JOIN tot CROSS JOIN btot
    WHERE big.c >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 100
    """,
    duckdb_sql="""
    WITH toks AS (
      SELECT doc_id, ws[i] AS w, i AS idx FROM (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        LATERAL unnest(generate_series(1, len(ws))) AS t(i)),
    uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
    tot AS (SELECT SUM(c) AS n FROM uni),
    big AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
      GROUP BY a.w, b.w),
    btot AS (SELECT SUM(c) AS bn FROM big)
    SELECT w1, w2, big.c AS c,
           ROUND(log2((big.c / bn) / ((u1.c / n) * (u2.c / n))), 4) AS pmi
    FROM big JOIN uni u1 ON big.w1 = u1.w JOIN uni u2 ON big.w2 = u2.w
    CROSS JOIN tot CROSS JOIN btot
    WHERE big.c >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 100
    """,
    tags=("text", "llm", "stats"),
)

# -- x155: Arrow-optimized Python UDF (Spark 4 useArrow) --------------------
#
# Completes the Q38 UDF surface tiers: row-at-a-time udf (x40), pandas_udf
# (x41/x56), applyInPandas/mapInPandas (x77/x138/x142) — and here the
# Spark 4 Arrow-optimized scalar udf (useArrow=True), which keeps the
# Python worker but swaps pickle row transfer for Arrow batches. The
# logic is deliberately SQL-replayable so the whole path hash-verifies.

def _x155_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf("double", useArrow=True)
    def chars_per_token(n_chars: int, text: str) -> float:
        toks = text.split(" ")
        return float(n_chars) / (1.0 + len(toks))

    t = load_tables(spark, sf_dir)
    out = t["documents"].select(
        "doc_id",
        F.round(chars_per_token(F.col("n_chars"), F.col("text")), 4).alias("cpt"),
    )
    return out.orderBy("doc_id").limit(300)


register(
    "x155_arrow_udf",
    oracle="""
    SELECT doc_id,
           ROUND(CAST(n_chars AS DOUBLE) / (1.0 + len(string_split(text, ' '))), 4) AS cpt
    FROM documents ORDER BY doc_id LIMIT 300
    """,
    tags=("udf", "arrow"),
)(_x155_run)
