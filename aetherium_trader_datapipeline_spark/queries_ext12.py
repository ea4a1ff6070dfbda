"""Training-data curation surface (x120–x122): TF-IDF term scoring,
deterministic train/valid/test splits, and stratified per-stratum sampling
— the selection/weighting stage of a 100 TB corpus pipeline, downstream of
the dedup family (x34/x46–x49) and quality scoring (x43).

All three are pure relational plans (no UDFs): tokenize with
split/explode, score with log arithmetic, split with a multiplicative
integer hash — so Catalyst keeps everything in whole-stage codegen and the
only shuffles are the groupBys on (doc, term) / strata.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- TF-IDF: top-3 terms per document (smoothed idf, deterministic ties) ----

register_sql(
    "x120_tfidf",
    headline=True,
    spark_sql="""
WITH tok AS (
  SELECT doc_id, w AS term
  FROM documents LATERAL VIEW explode(split(lower(text), ' ')) t AS w
  WHERE doc_id <= 50 AND w != ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tok),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN((n.n + 1.0) / (df.df + 1.0)), 4) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored)
WHERE rn <= 3 ORDER BY doc_id, tfidf DESC, term
""",
    duckdb_sql="""
WITH tok AS (
  SELECT doc_id, w AS term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents WHERE doc_id <= 50)
  WHERE w != ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tok),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN((n.n + 1.0) / (df.df + 1.0)), 4) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored) s
WHERE rn <= 3 ORDER BY doc_id, tfidf DESC, term
""",
    tags=("text", "training"),
)

# -- deterministic train/valid/test split (multiplicative integer hash) -----
# Knuth multiplicative hash on doc_id → stable 80/10/10 split that any
# engine reproduces bit-for-bit (no RNG, no engine-specific hash()).

_SPLIT_EXPR = """
CASE WHEN (doc_id * 2654435761) % 4294967296 % 10 < 8 THEN 'train'
     WHEN (doc_id * 2654435761) % 4294967296 % 10 = 8 THEN 'valid'
     ELSE 'test' END
"""

register_sql(
    "x121_train_split",
    spark_sql=f"""
SELECT split, lang, COUNT(*) AS n, SUM(n_chars) AS chars
FROM (SELECT lang, n_chars, {_SPLIT_EXPR} AS split FROM documents)
GROUP BY split, lang ORDER BY split, lang
""",
    duckdb_sql=f"""
SELECT split, lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM (SELECT lang, n_chars, {_SPLIT_EXPR} AS split FROM documents)
GROUP BY split, lang ORDER BY split, lang
""",
    tags=("training", "sampling"),
)

# -- stratified sample: fixed quota per stratum, hash-ordered ---------------
# row_number over a deterministic hash order inside each (lang, source)
# stratum — at scale this is one shuffle on the stratum key and the
# quota-filter is a per-partition top-k (no global sort).

register_sql(
    "x122_stratified_sample",
    headline=True,
    spark_sql="""
SELECT lang, source, doc_id FROM (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rn
  FROM documents)
WHERE rn <= 5 ORDER BY lang, source, doc_id
""",
    duckdb_sql="""
SELECT lang, source, doc_id FROM (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rn
  FROM documents) s
WHERE rn <= 5 ORDER BY lang, source, doc_id
""",
    tags=("training", "sampling"),
)
