"""Twenty-sixth extension wave — Matryoshka (MRL) truncation evaluation
(x181), DuckDB hash-verified.

Matryoshka-style embedding deployments serve a PREFIX of each vector
(dim 16 of 64 here) to cut memory/bandwidth, accepting some ranking
drift. This query is the offline evaluation that decides whether the
truncation is safe: for one query vector, score every candidate at full
dim and at prefix dim, and emit the full-dim top-10 with both cosines —
the rank/score drift is read directly off the result. Dot products are
sequential folds (Spark AGGREGATE ↔ DuckDB list_dot_product, both
left-to-right over doubles — the x94 pattern), so scores are
engine-identical. Scale shape: one broadcast of the query vector, a
map-only scoring pass, TakeOrdered top-k, and the rank number is
assigned AFTER the LIMIT so the window runs over 10 rows, not a
single-partition pass over the corpus — the brute-force baseline that
x50/x74's ANN paths approximate.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_SPARK_DOT = (
    "AGGREGATE(zip_with({a}, {b}, (x, y) -> x * y), "
    "CAST(0 AS DOUBLE), (a, v) -> a + v)"
)


def _spark_cos(a: str, b: str) -> str:
    d = _SPARK_DOT.format(a=a, b=b)
    na = _SPARK_DOT.format(a=a, b=a)
    nb = _SPARK_DOT.format(a=b, b=b)
    return f"({d} / (sqrt({na}) * sqrt({nb})))"


def _duck_cos(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


register_sql(
    "x181_mrl_truncation",
    spark_sql=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id,
             {_spark_cos("e.v", "q.qv")} AS cf,
             {_spark_cos("slice(e.v, 1, 16)", "slice(q.qv, 1, 16)")} AS c16
      FROM e CROSS JOIN q WHERE e.vec_id <> 0)
    SELECT ROW_NUMBER() OVER (ORDER BY cf DESC, vec_id) AS rank_full,
           vec_id, ROUND(cf, 4) AS cos_full, ROUND(c16, 4) AS cos_16
    FROM (SELECT * FROM s ORDER BY cf DESC, vec_id LIMIT 10)
    ORDER BY rank_full
    """,
    duckdb_sql=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id,
             {_duck_cos("e.v", "q.qv")} AS cf,
             {_duck_cos("e.v[1:16]", "q.qv[1:16]")} AS c16
      FROM e CROSS JOIN q WHERE e.vec_id <> 0)
    SELECT ROW_NUMBER() OVER (ORDER BY cf DESC, vec_id) AS rank_full,
           vec_id, ROUND(cf, 4) AS cos_full, ROUND(c16, 4) AS cos_16
    FROM (SELECT * FROM s ORDER BY cf DESC, vec_id LIMIT 10)
    ORDER BY rank_full
    """,
    tags=("similarity", "llm"),
)
