"""Round-2 curation surface: benchmark decontamination, repetition
filters, domain-mixture sampling, sequence packing, and fixed-iteration
k-means over embeddings — the remaining ops of a large-scale
training-data pipeline (SURVEY.md §2.3), all DuckDB hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# ---------------------------------------------------------------------------
# x135 — benchmark decontamination (word-5-gram overlap, broadcast bench set)
# ---------------------------------------------------------------------------

_WS = "string_split(lower(text), ' ')"
_GRAM5 = (
    f"list_transform(range(1, greatest(len({_WS}) - 3, 1)), "
    f"i -> {_WS}[i] || ' ' || {_WS}[i+1] || ' ' || {_WS}[i+2] || ' ' || "
    f"{_WS}[i+3] || ' ' || {_WS}[i+4])"
)


@register(
    "x135_decontaminate",
    headline=True,
    oracle=f"""
    WITH g AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id, unnest({_GRAM5}) AS gram FROM documents
      )
    ),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    train AS (SELECT * FROM g WHERE doc_id % 97 <> 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS hit_grams
      FROM train t JOIN bench b ON t.gram = b.gram GROUP BY t.doc_id
    )
    SELECT h.doc_id, h.hit_grams,
           ROUND(h.hit_grams / s.n_grams, 4) AS contamination
    FROM hits h JOIN sizes s USING (doc_id)
    ORDER BY contamination DESC, doc_id LIMIT 100
    """,
    tags=("curation", "dedup"),
)
def x135_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark 5-gram overlap; benchmark = doc_id % 97 == 0 (a
    stand-in eval set). The benchmark shingle set is broadcast — the
    corpus side never shuffles (the 100 TB-side requirement)."""
    from aetherium_trader_datapipeline_spark.operators.curation import decontaminate

    docs = load_tables(spark, sf_dir)["documents"]
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    return (
        decontaminate(train, bench, "doc_id")
        .select(F.col("id").alias("doc_id"), "hit_grams", "contamination")
        .orderBy(F.desc("contamination"), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# x136 — intra-document repetition (Gopher-style degenerate-text signals)
# ---------------------------------------------------------------------------


@register(
    "x136_repetition_filter",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
    base AS (
      SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct
      FROM w
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws), 1)),
                    i -> ws[i] || ' ' || ws[i+1])) AS gram
      FROM w
    ),
    cnt AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
    top AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot FROM cnt GROUP BY doc_id)
    SELECT b.doc_id,
           ROUND(1 - n_distinct / n_words, 4) AS dup_word_frac,
           ROUND(top_c / tot, 4) AS top_bigram_frac
    FROM base b JOIN top USING (doc_id) ORDER BY doc_id
    """,
    tags=("curation", "text"),
)
def x136_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.curation import repetition_stats

    docs = load_tables(spark, sf_dir)["documents"]
    return (
        repetition_stats(docs, "doc_id")
        .select(F.col("id").alias("doc_id"), "dup_word_frac", "top_bigram_frac")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x137 — domain-mixture sampling (hash-threshold, broadcast weight dim)
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = [("src0", 1.0), ("src1", 0.75), ("src2", 0.5), ("src3", 0.25)]


@register(
    "x137_domain_mix",
    oracle="""
    WITH w(source, wt) AS (VALUES ('src0', 1.0), ('src1', 0.75), ('src2', 0.5), ('src3', 0.25)),
    d AS (
      SELECT doc_id, documents.source, COALESCE(wt, 0.1) AS wt,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM documents LEFT JOIN w USING (source)
    )
    SELECT source, COUNT(*) AS kept FROM d WHERE u < wt
    GROUP BY source ORDER BY source
    """,
    tags=("curation", "sampling"),
)
def x137_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic downsampling to a target mixture; the
    md5-threshold rule reproduces bit-identically in any engine (same
    family as x121_train_split)."""
    from aetherium_trader_datapipeline_spark.operators.curation import domain_mix_sample

    docs = load_tables(spark, sf_dir)["documents"]
    weights = spark.createDataFrame(_MIX_WEIGHTS, "source string, w double")
    return (
        domain_mix_sample(docs, weights)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("kept"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# x138 — next-fit sequence packing (token-budget bins, per-shard greedy)
# ---------------------------------------------------------------------------


@register(
    "x138_sequence_packing",
    headline=True,
    oracle=f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id % 8 AS shard, doc_id, len({_WS}) AS tokens,
             ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT shard, doc_id, tokens, rn, CAST(0 AS BIGINT) AS pack_id, tokens AS fill
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.doc_id, d.tokens, d.rn,
             CASE WHEN p.fill + d.tokens > 200 THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.fill + d.tokens > 200 THEN d.tokens ELSE p.fill + d.tokens END
      FROM docs d JOIN packed p ON d.shard = p.shard AND d.rn = p.rn + 1
    )
    SELECT shard, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS sum_tokens
    FROM packed GROUP BY shard, pack_id ORDER BY shard, pack_id
    """,
    tags=("curation", "packing"),
)
def x138_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit packing of docs into 200-token bins, sharded by
    doc_id % 8. The oracle unrolls the same greedy as a recursive CTE —
    packing is inherently sequential, which is exactly why it runs
    per-shard (parallel across shards, ordered within)."""
    from aetherium_trader_datapipeline_spark.operators.curation import pack_sequences

    docs = load_tables(spark, sf_dir)["documents"]
    return (
        pack_sequences(docs, budget=200, n_shards=8)
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("sum_tokens"),
        )
        .orderBy("shard", "pack_id")
    )


# ---------------------------------------------------------------------------
# x139 — fixed-iteration Lloyd's k-means over embeddings
# ---------------------------------------------------------------------------

_KM_K, _KM_ITERS, _KM_DIM = 4, 3, 64


def _kmeans_oracle(k: int, iters: int, dim: int) -> str:
    """Unroll Lloyd's iterations as chained CTEs (assignment via cross
    join + row_number argmin; centroid update via per-dim AVG) — the same
    dataflow the Spark operator runs, so values hash-match."""
    parts = [
        "WITH e AS (SELECT vec_id AS id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),",
        f"c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, v AS c "
        f"FROM (SELECT id, v FROM e ORDER BY id LIMIT {k}))",
    ]
    dist = (
        f"list_aggregate(list_transform(range(1, {dim + 1}), "
        f"j -> (v[j] - c[j]) * (v[j] - c[j])), 'sum')"
    )
    for i in range(1, iters + 2):
        parts.append(
            f", a{i} AS (SELECT id, v, cid, dist, "
            f"row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn FROM ("
            f"SELECT e.id, e.v, c.cid, {dist} AS dist FROM e CROSS JOIN c{i - 1} c))"
        )
        if i <= iters:
            parts.append(
                f", c{i} AS (SELECT cid, list(av ORDER BY d) AS c FROM ("
                f"SELECT cid, d, AVG(v[d]) AS av FROM "
                f"(SELECT * FROM a{i} WHERE rn = 1) s CROSS JOIN range(1, {dim + 1}) t(d) "
                f"GROUP BY cid, d) GROUP BY cid)"
            )
    parts.append(
        f" SELECT cid AS cluster, COUNT(*) AS n, ROUND(SQRT(AVG(dist)), 3) AS rmse "
        f"FROM a{iters + 1} WHERE rn = 1 GROUP BY cid ORDER BY cid"
    )
    return "".join(parts)


@register(
    "x139_kmeans_embeddings",
    headline=True,
    oracle=_kmeans_oracle(_KM_K, _KM_ITERS, _KM_DIM),
    tags=("curation", "similarity"),
)
def x139_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd's iterations, k=4, deterministic init (k smallest ids).
    Only k×dim floats cross the driver boundary per iteration — the
    corpus side is one assignment projection + one k-row groupBy, which
    is the canonical cluster-scale k-means shape."""
    from aetherium_trader_datapipeline_spark.operators.curation import kmeans_embeddings

    emb = load_tables(spark, sf_dir)["embeddings"]
    out = kmeans_embeddings(emb, k=_KM_K, iters=_KM_ITERS, dim=_KM_DIM)
    return (
        out.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sqrt(F.avg("dist")), 3).alias("rmse"),
        )
        .orderBy("cluster")
    )
