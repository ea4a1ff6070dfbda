"""Twenty-fourth extension wave — BM25 relevance ranking (x178), DuckDB
hash-verified.

BM25 for a fixed 3-term query over the documents corpus:

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

with k1 = 1.2, b = 0.75, idf(t) = ln((N−df+0.5)/(df+0.5)+1) (the
Robertson–Sparck-Jones form Lucene uses). Float policy: every input to
the formula is an exact integer (tf, df, N, dl, Σdl), all division is
per-row double math (engine-deterministic), and the final score is a
FIXED-ORDER sum — the three per-term partial scores become columns via
conditional aggregation and are added s1+s2+s3 in the projection, never
via SUM over rows (whose accumulation order would be partition-
dependent). This is the trick that makes a ranking function
hash-verifiable.

Scale shape: one explode+groupBy for term frequencies (filtered to the
query terms at the scan — predicate pushdown keeps the token stream
narrow), one tiny df/stats broadcast, map-side scoring, TakeOrdered
top-k. A real search stack materializes the same plan incrementally as
an inverted index; the batch form is what you run for offline relevance
evaluation."""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_TERMS = ("table", "key", "row")
_K1, _B = "1.2", "0.75"


def _bm25_sql(dialect: str) -> str:
    if dialect == "spark":
        toks = "SELECT doc_id, explode(split(lower(text), ' ')) AS w FROM documents"
        ln = "ln"
    else:
        toks = ("SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
                "FROM documents")
        ln = "ln"
    terms_in = ", ".join(f"'{t}'" for t in _TERMS)
    tf_cols = ",\n             ".join(
        f"MAX(CASE WHEN w = '{t}' THEN c ELSE 0 END) AS tf{i}"
        for i, t in enumerate(_TERMS)
    )
    df_cols = ",\n             ".join(
        f"COUNT(DISTINCT CASE WHEN w = '{t}' THEN doc_id END) AS df{i}"
        for i, t in enumerate(_TERMS)
    )
    parts = []
    for i in range(len(_TERMS)):
        parts.append(
            f"({ln}((st.n - st.df{i} + 0.5) / (st.df{i} + 0.5) + 1.0)"
            f" * tf.tf{i} * ({_K1} + 1.0)"
            f" / (tf.tf{i} + {_K1} * (1.0 - {_B} + {_B} * d.dl * st.n / st.sdl)))"
        )
    score = " + ".join(parts)
    return f"""
    WITH toks AS ({toks}),
    tfm AS (
      SELECT doc_id, w, COUNT(*) AS c FROM toks
      WHERE w IN ({terms_in}) GROUP BY doc_id, w),
    tf AS (
      SELECT doc_id,
             {tf_cols}
      FROM tfm GROUP BY doc_id),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    st AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS sdl,
             {df_cols}
      FROM tfm),
    scored AS (
      SELECT tf.doc_id,
             {score} AS score
      FROM tf JOIN dl d ON tf.doc_id = d.doc_id CROSS JOIN st)
    SELECT doc_id, ROUND(score, 4) AS bm25
    FROM scored ORDER BY score DESC, doc_id LIMIT 100
    """


register_sql(
    "x178_bm25",
    spark_sql=_bm25_sql("spark"),
    duckdb_sql=_bm25_sql("duckdb"),
    tags=("text", "similarity", "llm"),
)
