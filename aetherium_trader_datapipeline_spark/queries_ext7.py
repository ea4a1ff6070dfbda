"""Embedding scale-path + sampling queries (x98–x100).

x98: single-query brute-force kNN — the baseline every ANN variant
(x50 LSH, x74 IVF) is measured against.
x99: L2-normalize + symmetric int8 quantization — the 100 TB storage
lever for embedding columns (4x smaller, integer distance kernels).
x100: deterministic hash sampling — reproducible train/eval splits that
push down as a plain predicate (no .sample(), which is seed- and
partitioning-dependent and therefore not oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables


@register(
    "x98_knn_query",
    headline=True,
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))), 4) AS sim
    FROM embeddings, q
    ORDER BY sim DESC, vec_id LIMIT 10
    """,
    tags=("similarity", "knn"),
)
def x98_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.similarity import knn_search

    emb = load_tables(spark, sf_dir)["embeddings"]
    qv = [float(x) for x in emb.where("vec_id = 0").head().embedding]
    return knn_search(emb, qv, k=10)


@register(
    "x99_normalize_quantize",
    oracle="""
    SELECT vec_id,
           array_to_string(
             list_transform(
               list_slice(CAST(embedding AS DOUBLE[]), 1, 8),
               x -> CAST(FLOOR(x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                         CAST(embedding AS DOUBLE[]))) * 127) AS INT)),
             ',') AS q8_head,
           CAST(FLOOR(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[]))) * 10000) AS BIGINT) AS norm_tenthmilli
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    tags=("similarity", "quantization"),
)
def x99_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.functions.vectors import l2_norm, quantize_int8

    emb = load_tables(spark, sf_dir)["embeddings"]
    return (
        emb.select(
            "vec_id",
            F.array_join(F.slice(quantize_int8("embedding"), 1, 8), ",").alias("q8_head"),
            F.floor(l2_norm("embedding") * 10000).cast("bigint").alias("norm_tenthmilli"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


# Multiplicative (Knuth) hash sampling: identical integer arithmetic in any
# engine, unlike .sample()/TABLESAMPLE whose RNG is engine- and
# partitioning-specific. 10% slice of orders, reproducible forever.
_SAMPLE = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE (o_orderkey * 2654435761) % 4294967296 < 429496730
ORDER BY o_orderkey LIMIT 500
"""
register_sql(
    "x100_deterministic_sample",
    spark_sql=_SAMPLE,
    duckdb_sql=_SAMPLE,
    tags=("sampling",),
)
