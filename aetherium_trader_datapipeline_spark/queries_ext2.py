"""Second extension wave: multimodal plumbing as verified queries, plus
relational-surface breadth (stats aggregates, pivot, regex, conditional
aggregation).

Determinism notes:
- Multimodal metadata is derived from UTF-8 byte content (octet_length in
  DuckDB == binary length in Spark), so the mapInPandas decode-stub path
  is hash-verifiable end-to-end despite the codec itself being stubbed.
- Variance/correlation are computed from DECIMAL power sums (exact in both
  engines) and only combined in double at the end — built-in stddev/corr
  accumulate in double and are summation-order-dependent, which would make
  the hash comparison flaky under parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables


# ---------------------------------------------------------------------------
# Multimodal plumbing as hash-verified queries (operators/multimodal.py)
# ---------------------------------------------------------------------------


@register(
    "x57_multimodal_meta",
    oracle="""
    SELECT CASE octet_length(encode(text)) % 3
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
           COUNT(*) AS n,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    tags=("multimodal", "udf"),
)
def x57_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction via Arrow-batched mapInPandas
    (operators/multimodal.extract_image_meta); the decode stub derives
    format/n_bytes purely from byte content so DuckDB can replay it."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import extract_image_meta

    t = load_tables(spark, sf_dir)
    blobs = t["documents"].select("doc_id", F.encode("text", "UTF-8").alias("blob"))
    meta = extract_image_meta(blobs, "blob")
    return (
        meta.groupBy("format")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_bytes").alias("total_bytes"))
        .orderBy("format")
    )


@register(
    "x58_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, greatest(CAST((length(text) % 30 + 1) * 2 AS BIGINT), 1))) AS BIGINT) AS frame_idx
    FROM documents
    ORDER BY doc_id, frame_idx LIMIT 500
    """,
    tags=("multimodal",),
)
def x58_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (operators/multimodal.frame_sample_plan):
    pure sequence/explode — rows fan out JVM-side, no Python."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import frame_sample_plan

    t = load_tables(spark, sf_dir)
    vids = t["documents"].select(
        "doc_id", (F.length("text") % 30 + 1).cast("double").alias("duration_s")
    )
    planned = frame_sample_plan(vids, "duration_s", fps=2.0)
    return (
        planned.select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
        .orderBy("doc_id", "frame_idx")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# Relational-surface breadth
# ---------------------------------------------------------------------------

register_sql(
    "x59_stats_aggs",
    # Sample variance / correlation from exact DECIMAL power sums; the final
    # double combine is identical IEEE arithmetic in both engines.
    spark_sql="""
    SELECT o_orderstatus,
           ROUND(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)), 2) AS sd_price,
           ROUND((CAST(sxy AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sk AS DOUBLE) / n) / (n - 1), 2) AS cov_price_cust
    FROM (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS s1,
             SUM(CAST(o_totalprice AS DECIMAL(28,8)) * CAST(o_totalprice AS DECIMAL(28,8))) AS s2,
             SUM(CAST(o_custkey AS DECIMAL(28,8))) AS sk,
             SUM(CAST(o_totalprice AS DECIMAL(28,8)) * CAST(o_custkey AS DECIMAL(28,8))) AS sxy
      FROM orders GROUP BY o_orderstatus
    ) t ORDER BY o_orderstatus
    """,
    tags=("agg", "stats"),
)

register_sql(
    "x60_pivot",
    spark_sql="""
    SELECT c_mktsegment,
           COALESCE(O, 0) AS o_cnt, COALESCE(F, 0) AS f_cnt, COALESCE(P, 0) AS p_cnt
    FROM (
      SELECT c_mktsegment, o_orderstatus
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) PIVOT (COUNT(*) FOR o_orderstatus IN ('O', 'F', 'P'))
    ORDER BY c_mktsegment
    """,
    duckdb_sql="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("agg", "pivot"),
)

register_sql(
    "x61_regex_fns",
    spark_sql="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_type, '[aeiou]', '_') AS type_devoweled,
           CAST(p_name RLIKE '^[a-m]' AS INT) AS starts_low
    FROM part ORDER BY p_partkey LIMIT 200
    """,
    duckdb_sql="""
    SELECT p_partkey,
           COALESCE(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
           regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_devoweled,
           CAST(regexp_matches(p_name, '^[a-m]') AS INT) AS starts_low
    FROM part ORDER BY p_partkey LIMIT 200
    """,
    tags=("functions", "regex"),
)

register_sql(
    "x62_conditional_agg",
    spark_sql="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority LIKE '1%') AS n_urgent,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    duckdb_sql="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority LIKE '1%') AS n_urgent,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "conditional"),
)
