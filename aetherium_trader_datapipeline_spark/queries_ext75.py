"""Wave 75 (x313): exact ranking-quality metrics (NDCG@10, MRR).

The evaluation half of the retrieval stack (BM25 x178, phrase/boolean
x199/x200, kNN x98, ANN x50/x74): score a deterministic exact-cosine
top-10 ranking for 20 query vectors against label-match relevance and
report per-query NDCG@10 and MRR — the metrics a search/RAG pipeline
regression-gates on.

Determinism end to end: candidate scores are INTEGER dot products of
floor(v·1000)-quantized embeddings (exact, both engines), ranking order
is (score DESC, cand_id); each DCG term 1/log2(rank+1) is cast to
DECIMAL(18,9) before summing (x156's order-independent convention), and
IDCG comes from the same per-term table by ideal rank.  No float
aggregation anywhere, so the metric hash-verifies.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# DCG discount terms for ranks 1..10 as exact decimal literals of
# 1/log2(rank+1), 9 dp — shared by DCG (join on rank) and IDCG (join on
# ideal rank), so both engines use the identical constants.
_DISCOUNTS = ", ".join(
    f"({r}, {1.0 / __import__('math').log2(r + 1):.9f})" for r in range(1, 11)
)

_X313_FMT = """
    WITH disc(rank, d) AS (VALUES {discounts}),
    q AS (
      SELECT vec_id AS qid, label AS qlabel, {qv} AS qv
      FROM embeddings WHERE vec_id < 20
    ),
    c AS (
      SELECT vec_id AS cid, label AS clabel, {qv} AS cv
      FROM embeddings WHERE vec_id >= 100
    ),
    qx AS (SELECT qid, qlabel, i, v FROM q {explode_q}),
    cx AS (SELECT cid, clabel, i, v FROM c {explode_c}),
    scores AS (
      SELECT qx.qid, cx.cid,
             MIN(qx.qlabel) AS qlabel, MIN(cx.clabel) AS clabel,
             SUM(qx.v * cx.v) AS dot
      FROM qx JOIN cx ON qx.i = cx.i
      GROUP BY qx.qid, cx.cid
    ),
    ranked AS (
      SELECT qid, cid, qlabel, clabel,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rank
      FROM scores
    ),
    top10 AS (
      SELECT qid, rank, CASE WHEN qlabel = clabel THEN 1 ELSE 0 END AS rel
      FROM ranked WHERE rank <= 10
    ),
    dcg AS (
      SELECT t.qid,
             CAST(SUM(CASE WHEN t.rel = 1
                           THEN CAST(d.d AS DECIMAL(18,9))
                           ELSE CAST(0 AS DECIMAL(18,9)) END)
                  AS DECIMAL(18,9)) AS dcg,
             CAST(SUM(t.rel) AS BIGINT) AS n_rel
      FROM top10 t JOIN disc d ON t.rank = d.rank
      GROUP BY t.qid
    ),
    idcg AS (
      SELECT g.qid,
             CAST(SUM(CAST(d.d AS DECIMAL(18,9))) AS DECIMAL(18,9)) AS idcg
      FROM dcg g JOIN disc d ON d.rank <= g.n_rel
      GROUP BY g.qid
    ),
    mrr AS (
      SELECT qid, MIN(rank) AS first_rel_rank
      FROM top10 WHERE rel = 1 GROUP BY qid
    )
    SELECT g.qid, g.n_rel,
           CASE WHEN g.n_rel = 0 THEN CAST(0 AS DOUBLE)
                ELSE ROUND(CAST(g.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE), 4)
           END AS ndcg10,
           CAST(m.first_rel_rank AS BIGINT) AS first_rel_rank,
           CASE WHEN m.first_rel_rank IS NULL THEN CAST(0 AS DOUBLE)
                ELSE ROUND(CAST(1 AS DOUBLE) / m.first_rel_rank, 4) END AS mrr
    FROM dcg g
    LEFT JOIN idcg i ON g.qid = i.qid
    LEFT JOIN mrr m ON g.qid = m.qid
    ORDER BY g.qid
"""

_QV = "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_QV_DUCK = (
    "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
)

register_sql(
    "x313_ranking_metrics",
    spark_sql=_X313_FMT.format(
        discounts=_DISCOUNTS,
        qv=_QV,
        explode_q="LATERAL VIEW posexplode(qv) t AS i, v",
        explode_c="LATERAL VIEW posexplode(cv) t AS i, v",
    ),
    duckdb_sql=_X313_FMT.format(
        discounts=_DISCOUNTS,
        qv=_QV_DUCK,
        explode_q=", LATERAL (SELECT generate_subscripts(qv, 1) - 1 AS i, unnest(qv) AS v) t",
        explode_c=", LATERAL (SELECT generate_subscripts(cv, 1) - 1 AS i, unnest(cv) AS v) t",
    ),
    tags=("similarity", "ml", "eval"),
)
