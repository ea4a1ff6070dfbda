"""Wave 68 (x302–x303): the two audits a training-data release runs last.

x302 is the SPLIT-LEAKAGE audit: near-duplicate pairs (portable-MinHash
band candidates, x129's family) classified by which train/valid/test
splits (x121's hash split) their endpoints fall in.  Pairs crossing a
split boundary are leakage — test-set members with a near-dup in train
inflate eval scores (the failure mode Lee et al. 2022 document); the
within-split counts give the residual dup rate each split ships with.

x303 is the per-source DATASET CARD: one aggregation pass producing the
datasheet row a corpus release publishes per source — doc/token/char
counts, language spread, exact-dup count (md5 content), short-doc and
empty-doc rates in basis points.  At 100 TB this is one map-side-partial
groupBy on source; the distinct-count columns are the only sketchable
spots (exact here, HLL at production scale — x187's portable sketch is
the swap-in).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql
from aetherium_trader_datapipeline_spark.queries_ext12 import _SPLIT_EXPR
from aetherium_trader_datapipeline_spark.queries_ext14 import _X129_CTES

# -- x302: near-dup links across split boundaries ----------------------------
# Classification runs over the LINEAR assignment edges (doc → bucket-min
# representative, x129's scale form), NOT the all-pairs band join: on a
# duplicate-heavy corpus the pair form is quadratic in cluster size —
# measured on the 100× replica (every doc cloned 100×, so 4 950 pairs per
# bucket per band) it produced a ~10⁸-row distinct and did not finish in
# 5 minutes, while the edge form stays ≤ bands edges per doc.  Every doc
# with a near-dup in another split still surfaces (its rep edge crosses),
# so the audit question — "does test leak into train?" — is answered with
# linear work.

_X302_TAIL = """,
    bucket_min AS (
      SELECT band, bk, MIN(id) AS rep FROM bands GROUP BY band, bk
    ),
    edges AS (
      SELECT DISTINCT e.id, m.rep
      FROM bands e JOIN bucket_min m ON e.band = m.band AND e.bk = m.bk
      WHERE m.rep < e.id
    ),
    sp AS (SELECT doc_id AS id, {split} AS split FROM documents),
    lab AS (
      SELECT LEAST(sa.split, sb.split) AS s1,
             GREATEST(sa.split, sb.split) AS s2
      FROM edges p
      JOIN sp sa ON p.id = sa.id
      JOIN sp sb ON p.rep = sb.id
    )
    SELECT s1 || '-' || s2 AS split_pair,
           CAST(COUNT(*) AS BIGINT) AS n_near_dup_links,
           s1 <> s2 AS is_leakage
    FROM lab GROUP BY s1, s2 ORDER BY split_pair
"""


# Spark implementation goes through the dedup operator (same portable
# family the oracle CTEs replay), then classifies pairs in DataFrame ops.
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from aetherium_trader_datapipeline_spark.queries import register  # noqa: E402
from aetherium_trader_datapipeline_spark.tables import load_tables  # noqa: E402


@register(
    "x302_split_leakage",
    oracle=_X129_CTES + _X302_TAIL.format(split=_SPLIT_EXPR),
    tags=("dedup", "training", "audit"),
)
def x302_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        minhash_portable_assignments,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    edges = minhash_portable_assignments(docs, "doc_id", "text")
    sp = docs.select(
        F.col("doc_id").alias("id"), F.expr(_SPLIT_EXPR).alias("split")
    )
    lab = (
        edges.join(sp.select(F.col("id"), F.col("split").alias("spa")), "id")
        .join(
            sp.select(F.col("id").alias("rep"), F.col("split").alias("spb")), "rep"
        )
        .select(
            F.least("spa", "spb").alias("s1"), F.greatest("spa", "spb").alias("s2")
        )
    )
    return (
        lab.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_near_dup_links"))
        .select(
            F.concat_ws("-", "s1", "s2").alias("split_pair"),
            "n_near_dup_links",
            (F.col("s1") != F.col("s2")).alias("is_leakage"),
        )
        .orderBy("split_pair")
    )


# -- x303: per-source dataset card -------------------------------------------

_X303_FMT = """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({nwords}) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
           CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) * 10000
                {div} COUNT(*) AS BIGINT) AS short_bp,
           CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) * 10000
                {div} COUNT(*) AS BIGINT) AS empty_bp
    FROM documents GROUP BY source ORDER BY source
"""

register_sql(
    "x303_dataset_card",
    spark_sql=_X303_FMT.format(nwords="size(split(text, ' '))", div="DIV"),
    duckdb_sql=_X303_FMT.format(nwords="len(string_split(text, ' '))", div="//"),
    tags=("training", "audit", "stats"),
)
