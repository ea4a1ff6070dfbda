"""Extension query inventory: training-data-pipeline operators (dedup,
similarity, text analysis, UDF surface, rate-limit analytics, backfill
planning) registered into the same REGISTRY as the core queries.

Hash-verified against DuckDB where SQL-expressible; hash-function-dependent
ops (MinHash LSH, SimHash, ANN) are rows-only here and recall-verified in
tests/test_operators.py instead.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables


# ---------------------------------------------------------------------------
# UDF surface (op Q38): pandas_udf validation + applyInPandas normalization
# ---------------------------------------------------------------------------


@register(
    "x40_udf_validate",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_returnflag IS NOT NULL AND TRIM(l_returnflag) != ''
                          AND l_discount - 0.01 IS NOT NULL AND l_discount - 0.01 > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("udf",),
)
def x40_udf_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas_udf running the reference's V1 tick-validation
    contract (tick.rs:27-49) against lineitem columns."""
    from aetherium_trader_datapipeline_spark.operators.validate import tick_valid_pandas

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].withColumn(
        "valid", tick_valid_pandas(F.col("l_returnflag"), F.col("l_discount") - 0.01)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("valid").cast("int")).alias("n_valid"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "x41_grouped_demean",
    oracle="""
    SELECT event_id,
           FLOOR((value - SUM(CAST(FLOOR(value * 1e6) AS BIGINT))
                            OVER (PARTITION BY user_id)
                          / COUNT(value) OVER (PARTITION BY user_id)
                          / 1e6) * 1e4 + 0.5) / 1e4 AS dvalue
    FROM events ORDER BY event_id LIMIT 500
    """,
    tags=("udf",),
)
def x41_grouped_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.validate import demean_by_group

    t = load_tables(spark, sf_dir)
    out = demean_by_group(t["events"], ["user_id"], "value")
    return out.select("event_id", "dvalue").orderBy("event_id").limit(500)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_EN = "'the','a','of','and','to','in','is','it'"
_DE = "'der','die','das','und','ist','nicht','ein','zu'"
_FR = "'le','la','les','et','est','un','une','dans'"
_ES = "'el','los','las','es','un','una','en','que'"


@register(
    "x42_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '), w -> list_contains([{_EN}], w))) AS s_en,
             len(list_filter(string_split(lower(text), ' '), w -> list_contains([{_DE}], w))) AS s_de,
             len(list_filter(string_split(lower(text), ' '), w -> list_contains([{_FR}], w))) AS s_fr,
             len(list_filter(string_split(lower(text), ' '), w -> list_contains([{_ES}], w))) AS s_es,
             regexp_matches(text, '[一-鿿]') AS zh
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN zh THEN 'zh'
                WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
                WHEN s_es > greatest(s_en, s_fr) THEN 'es'
                WHEN s_fr > s_en THEN 'fr'
                ELSE 'en' END AS pred_lang
    FROM scored ORDER BY doc_id LIMIT 200
    """,
    tags=("text",),
)
def x42_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.textops import language_id

    t = load_tables(spark, sf_dir)
    return (
        language_id(t["documents"]).select("doc_id", "pred_lang").orderBy("doc_id").limit(200)
    )


@register(
    "x43_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
           ROUND(length(text) / len(string_split(lower(text), ' ')), 4) AS avg_token_len,
           ROUND(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) / length(text), 4) AS punct_ratio,
           ROUND(len(list_filter(string_split(lower(text), ' '), w -> list_contains([{_EN}], w)))
                 / len(string_split(lower(text), ' ')), 4) AS stop_ratio
    FROM documents ORDER BY doc_id LIMIT 200
    """,
    tags=("text",),
)
def x43_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.textops import quality_score

    t = load_tables(spark, sf_dir)
    return (
        quality_score(t["documents"])
        .select("doc_id", "n_tokens", "avg_token_len", "punct_ratio", "stop_ratio")
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "x44_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens
    FROM documents ORDER BY doc_id LIMIT 200
    """,
    tags=("text",),
)
def x44_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.textops import token_counts

    t = load_tables(spark, sf_dir)
    return (
        token_counts(t["documents"])
        .select("doc_id", "ws_tokens", "bpe_tokens")
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "x45_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(SUM(i * (131 * length(w) + ascii(w))) % 1000000007 AS BIGINT) AS fp
    FROM (
      SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS w,
             generate_subscripts(string_split(lower(text), ' '), 1) AS i
      FROM documents
    ) t
    GROUP BY doc_id ORDER BY doc_id LIMIT 200
    """,
    tags=("text",),
)
def x45_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.textops import fingerprint

    t = load_tables(spark, sf_dir)
    return fingerprint(t["documents"], "doc_id").orderBy("doc_id").limit(200)


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------


@register(
    "x46_ngram_jaccard",
    oracle="""
    WITH sh0 AS (
      SELECT DISTINCT doc_id AS id, gram AS sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(string_split(lower(text), ' ')), 1)),
                      i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1])) AS gram
        FROM documents
      ) g
    ),
    freq AS (SELECT sh, COUNT(*) AS df FROM sh0 GROUP BY sh),
    -- df cap scales with the corpus (r7): an absolute 100 collapsed at
    -- sf0.1 (only 250 of 5000 docs kept ANY shingle, sets of size 1,
    -- and the "truth" became docs sharing one rare shingle); GREATEST
    -- keeps sf0.001/sf0.01 behavior bit-identical (cap stays 100 there)
    sh AS (SELECT id, sh0.sh FROM sh0 JOIN freq USING (sh)
           WHERE freq.df <= GREATEST(100,
                 CEIL(0.2 * (SELECT COUNT(*) FROM documents)))),
    sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS a, b.id AS b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT a, b,
           ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
    ORDER BY jaccard DESC, a, b LIMIT 50
    """,
    tags=("dedup",),
)
def x46_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df cap is the quadratic-blowup guard: a shingle shared by f
    docs contributes C(f,2) candidate pairs, so stop-shingles must be
    dropped for the join to stay near-linear (measured: the uncapped
    form dies at 50 k docs with replicated texts).  The cap MUST be the
    same expression as the oracle's (GREATEST(100, CEIL(0.2·n_docs)) —
    the r7 scale-aware form): the pre-r9 Spark side kept a flat 100,
    which is identical at sf<=0.01 (0.2·500 = 100, so the driver hash
    is unaffected) and happened to produce the same top-50 at sf0.1,
    but is a latent cross-engine divergence at any SF where the sets
    differ — found by the r9 sf1 sweep.  Note the cap is linear in n:
    EXACT all-pairs Jaccard with a corpus-proportional stop-shingle
    budget is inherently quadratic on a vocabulary-bounded fixture; the
    scale path for neardup is the LSH tier (x129/x150) with x307's
    kernel as the bounded exact verifier, and SCALE.md records x46's
    sf1 exclusion on those grounds."""
    from aetherium_trader_datapipeline_spark.operators.dedup import ngram_jaccard_pairs

    t = load_tables(spark, sf_dir)
    n_docs = t["documents"].count()
    cap = max(100, -(-n_docs // 5))  # == GREATEST(100, CEIL(0.2*n))
    return (
        ngram_jaccard_pairs(
            t["documents"],
            "doc_id",
            shingle_size=2,
            max_shingle_freq=cap,
            # corpus-proportional cap => exploding self-join: pin its
            # exchange width (see the operator docstring; 23 s -> 6 s)
            join_parallelism=spark.sparkContext.defaultParallelism * 2,
        )
        .orderBy(F.desc("jaccard"), "a", "b")
        .limit(50)
    )


@register(
    "x49_embedding_neardup",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), (a, b) -> a + b)) AS nrm
      FROM embeddings
    )
    SELECT * FROM (
      SELECT a.vec_id AS a, b.vec_id AS b,
             ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])), (x, y) -> x + y)
                   / (a.nrm * b.nrm), 4) AS sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    ) s WHERE sim >= 0.4
    ORDER BY sim DESC, a, b
    """,
    tags=("dedup", "similarity"),
)
def x49_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.similarity import cosine_neardup_pairs

    t = load_tables(spark, sf_dir)
    return cosine_neardup_pairs(t["embeddings"], "vec_id", "embedding", threshold=0.4)


@register(
    "x55_content_hash_dups",
    oracle="""
    SELECT COUNT(*) AS n_dup_groups FROM (
      SELECT text FROM documents GROUP BY text HAVING COUNT(*) > 1
    ) t
    """,
    tags=("dedup",),
)
def x55_content_hash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import content_hash_dups

    t = load_tables(spark, sf_dir)
    return content_hash_dups(t["documents"], "doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_groups")
    )


# ---------------------------------------------------------------------------
# Rate-limit analytics + backfill planning + approx aggregates
# ---------------------------------------------------------------------------


@register(
    "x51_ratelimit_flags",
    oracle="""
    SELECT event_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3600s,
           CAST(CASE WHEN COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING AND CURRENT ROW) > 5
                THEN 1 ELSE 0 END AS INT) AS over_3600s,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 600 SECONDS PRECEDING AND CURRENT ROW) AS BIGINT) AS n_600s,
           CAST(CASE WHEN COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 600 SECONDS PRECEDING AND CURRENT ROW) > 2
                THEN 1 ELSE 0 END AS INT) AS over_600s
    FROM events ORDER BY event_id LIMIT 500
    """,
    tags=("ratelimit", "window"),
)
def x51_ratelimit_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.ratelimit import (
        RateWindow,
        sliding_window_counts,
    )

    t = load_tables(spark, sf_dir)
    out = sliding_window_counts(
        t["events"], "ts", ["user_id"], windows=(RateWindow(5, 3600), RateWindow(2, 600))
    )
    return (
        out.select("event_id", "n_3600s", "over_3600s", "n_600s", "over_600s")
        .orderBy("event_id")
        .limit(500)
    )


_CURSOR_MS = int(dt.datetime(1995, 2, 10, tzinfo=dt.timezone.utc).timestamp() * 1000)


@register(
    "x52_backfill_plan",
    oracle="""
    SELECT DISTINCT d FROM (
      SELECT DATE'1995-02-10' AS d
      UNION ALL
      SELECT CAST(g AS DATE) AS d
      FROM generate_series(DATE'1995-02-10', DATE'1995-03-31', INTERVAL 1 DAY) t(g)
      WHERE CAST(g AS DATE) NOT IN (SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders)
    ) u ORDER BY d
    """,
    tags=("backfill", "operator"),
)
def x52_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.backfill import plan_backfill_days

    t = load_tables(spark, sf_dir)
    present = t["orders"].selectExpr("CAST(o_orderdate AS DATE) AS d")
    return plan_backfill_days(present, "1995-01-01", "1995-03-31", cursor_ms=_CURSOR_MS)


@register(
    "x56_udaf_sumsq",
    oracle="""
    SELECT user_id, ROUND(SUM(value * value), 4) AS sumsq
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("udf",),
)
def x56_udaf_sumsq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF vs plain-SQL oracle."""
    from aetherium_trader_datapipeline_spark.operators.validate import sum_of_squares

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .agg(F.round(sum_of_squares(F.col("value")), 4).alias("sumsq"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Hash-function-dependent / approximate variants (rows-only for the driver;
# recall- and tolerance-verified vs the exact formulations above in
# tests/test_operators.py). Registered after every oracle-backed entry so
# the driver's hash-verified window is spent on oracle-checkable queries.
# ---------------------------------------------------------------------------


# Exact 2-gram Jaccard pair set with an INTEGER threshold test
# (inter * q >= p * (|a| + |b| - inter)  <=>  J >= p/q) — no float
# boundary, so Spark and DuckDB count the identical pair set. Shingles
# with document frequency > 100 are dropped BEFORE the pair join (x46's
# quadratic-blowup guard: a shingle in f docs yields C(f,2) join rows;
# the uncapped form hit the JVM GC wall on the duplicate-heavy 10×
# replica). Sizes are measured on the same capped set so the Jaccard
# stays internally consistent between engines.
_EXACT_PAIRS_CTE = """
    WITH sh0 AS (
      SELECT DISTINCT doc_id AS id, gram AS sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(string_split(lower(text), ' ')), 1)),
                      i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1])) AS gram
        FROM documents
      ) g
    ),
    freq AS (SELECT sh, COUNT(*) AS df FROM sh0 GROUP BY sh),
    -- df cap scales with the corpus (r7): an absolute 100 collapsed at
    -- sf0.1 (only 250 of 5000 docs kept ANY shingle, sets of size 1,
    -- and the "truth" became docs sharing one rare shingle); GREATEST
    -- keeps sf0.001/sf0.01 behavior bit-identical (cap stays 100 there)
    sh AS (SELECT id, sh0.sh FROM sh0 JOIN freq USING (sh)
           WHERE freq.df <= GREATEST(100,
                 CEIL(0.2 * (SELECT COUNT(*) FROM documents)))),
    sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS a, b.id AS b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
      GROUP BY a.id, b.id
    )
"""


def _exact_jaccard_pairs(docs, p: int, q: int, max_freq: int | None = None):
    """(a, b) doc pairs with exact 2-gram Jaccard >= p/q (integer test),
    over shingles with document frequency <= ``max_freq``.

    ``max_freq`` defaults to GREATEST(100, 0.2 * n_docs) — the r7 fix for
    the scale collapse the absolute cap caused at sf0.1 (see CTE note);
    identical to the old cap at sf0.001/sf0.01."""
    import math

    from aetherium_trader_datapipeline_spark.operators.dedup import _shingles

    if max_freq is None:
        max_freq = max(100, math.ceil(0.2 * docs.count()))
    sh0 = _shingles(docs, "doc_id", "text", 2)
    freq = sh0.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    sh = (
        sh0.join(freq.where(F.col("df") <= max_freq), "sh")
        .select("id", "sh")
        # eager (r14): three readers (sizes + both self-join sides) share
        # the downstream job; lazy risked concurrent recomputation
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # r14: with the df cap at GREATEST(100, 0.2n) the shingle self-join
    # EXPLODES (sf0.1: 256k input rows -> 36.5M joined rows, 10.3M pairs)
    # while its input is a few MB, so AQE coalesces the exchange to ~1
    # task and the explosion runs serial.  Pin the exchange's parallelism
    # by keying it explicitly (cores-derived, scale-adaptive).  Measured
    # 28.2 s -> 2.7 s for the inter stage at sf0.1 on local[32].
    p_join = docs.sparkSession.sparkContext.defaultParallelism * 2
    base = sh.repartition(p_join, "sh")
    inter = (
        base.alias("x")
        .join(base.alias("y"), "sh")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sb")), "b")
        .where(
            F.col("inter") * q >= p * (F.col("sa") + F.col("sb") - F.col("inter"))
        )
        .select("a", "b")
    )


@register(
    "x47_minhash_lsh_dedup",
    oracle=_EXACT_PAIRS_CTE
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok
    FROM inter JOIN sizes sa ON sa.id = inter.a JOIN sizes sb ON sb.id = inter.b
    WHERE inter * 5 >= 1 * (sa.sz + sb.sz - inter)
    """,
    tags=("dedup",),
)
def x47_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production MinHash+LSH (xxhash64) verified by the sketch-summary
    pattern (x53/x187): the candidate set is engine-specific, so the
    hash-verified output is the engine-INDEPENDENT exact-Jaccard >= 0.2
    pair count plus a boolean asserting LSH recalled >= 80% of it
    (measured 100% at sf0.01; the portable twin x129 hash-verifies the
    full pipeline end to end)."""
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    # r14: the count branch and the recall semi-join both consume the
    # exact-pairs frame in one job — without materialization the whole
    # shingle self-join subtree ran twice (guide §2.4); the pair list
    # itself is tiny
    exact = _exact_jaccard_pairs(docs, p=1, q=5).localCheckpoint(eager=True)  # J >= 0.2
    cand = minhash_lsh_candidates(minhash_signatures(docs, "doc_id"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_rec = exact.join(cand, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_rec")
    )
    return n_exact.crossJoin(n_rec).select(
        "n_exact_pairs",
        (F.col("n_rec") * 10 >= F.col("n_exact_pairs") * 8).alias("recall_ok"),
    )


@register(
    "x48_simhash_neardup",
    oracle=_EXACT_PAIRS_CTE
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_truth_pairs, TRUE AS recall_ok
    FROM inter JOIN sizes sa ON sa.id = inter.a JOIN sizes sb ON sb.id = inter.b
    WHERE inter * 10 >= 7 * (sa.sz + sb.sz - inter)
    """,
    tags=("dedup",),
)
def x48_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production SimHash (xxhash64 signatures, 4-chunk pigeonhole, hamming
    <= 16) verified the same way as x47: emit the engine-independent exact
    J >= 0.7 ground-truth pair count plus a boolean asserting simhash
    recovered >= 70% of it (measured 92% at sf0.01; portable twin x130
    hash-verifies signatures and distances exactly)."""
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        simhash_neardup_pairs,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    # r14: same two-consumer materialization as x47 (count + recall join)
    truth = _exact_jaccard_pairs(docs, p=7, q=10).localCheckpoint(eager=True)  # J >= 0.7
    pred = simhash_neardup_pairs(docs, "doc_id", max_hamming=16)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth_pairs"))
    n_hit = truth.join(pred, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return n_truth.crossJoin(n_hit).select(
        "n_truth_pairs",
        (F.col("n_hit") * 10 >= F.col("n_truth_pairs") * 7).alias("recall_ok"),
    )


# Exact global top-20 cosine pairs (q35's oracle CTE) — the ground truth
# both ANN keys are measured against.
_EXACT_TOP20_CTE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), (a, b) -> a + b)) AS nrm
      FROM embeddings
    ),
    top AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(list_zip(a.e, b.e), p -> p[1] * p[2])), (x, y) -> x + y)
                   / (a.nrm * b.nrm), 4) AS sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      ORDER BY sim DESC, a, b LIMIT 20
    )
"""


def _ann_recall_summary(spark, sf_dir, ann_pairs, min_hits: int):
    """(n_exact, top20_mean_sim, recall_ok) vs the exact top-20 pair set."""
    from aetherium_trader_datapipeline_spark.operators.similarity import (
        pairwise_cosine_topk,
    )

    t = load_tables(spark, sf_dir)
    # r14: stats and hits both consume the exact top-k in one job; the
    # block-GEMM subtree behind it is the expensive part and ran twice —
    # materialize the k-row result instead (guide §2.4)
    exact = pairwise_cosine_topk(
        t["embeddings"], id_col="vec_id", vec_col="embedding", k=20
    ).localCheckpoint(eager=True)
    stats = exact.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.round(F.avg("sim"), 4).alias("top20_mean_sim"),
    )
    hits = exact.join(ann_pairs, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return stats.crossJoin(hits).select(
        "n_exact",
        "top20_mean_sim",
        (F.col("n_hits") >= min_hits).alias("recall_ok"),
    )


_ANN_ORACLE = (
    _EXACT_TOP20_CTE
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
           ROUND(AVG(sim), 4) AS top20_mean_sim,
           TRUE AS recall_ok
    FROM top
    """
)


@register("x50_ann_lsh_topk", oracle=_ANN_ORACLE, tags=("similarity",))
def x50_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN, verified by the recall-summary pattern
    (x47/x53): the candidate set depends on the plane seeds, so the
    hash-verified output is the engine-independent exact top-20 stats plus
    a boolean asserting LSH recovered >= 10 of the 20 best pairs
    (measured 13/20 at sf0.01 with 6 planes × 12 tables)."""
    from aetherium_trader_datapipeline_spark.operators.similarity import ann_lsh_topk

    t = load_tables(spark, sf_dir)
    ann = ann_lsh_topk(
        t["embeddings"], "vec_id", "embedding", dim=64, k=20,
        n_planes=6, n_tables=12,
    )
    return _ann_recall_summary(spark, sf_dir, ann.select("a", "b"), min_hits=10)


@register(
    "x63_stateful_ratelimit",
    # The admission recurrence (denied requests leave no window trace) is
    # sequential, but a list-carrying recursive CTE replays it exactly:
    # state = admitted-request timestamps inside the longest window,
    # trimmed and appended per step in row_number order — the same
    # ZREMRANGEBYSCORE/ZCARD/ZADD walk as _admit_kernel (limiter.lua:21-53).
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS tms,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events),
    rec AS (
      SELECT user_id, rn, ts, TRUE AS admitted, [tms] AS hist
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.ts,
             (len(list_filter(r.hist, x -> x > o.tms - 3600000)) < 3
              AND len(list_filter(r.hist, x -> x > o.tms - 600000)) < 1) AS admitted,
             CASE WHEN (len(list_filter(r.hist, x -> x > o.tms - 3600000)) < 3
                        AND len(list_filter(r.hist, x -> x > o.tms - 600000)) < 1)
                  THEN list_append(list_filter(r.hist, x -> x > o.tms - 3600000), o.tms)
                  ELSE list_filter(r.hist, x -> x > o.tms - 3600000) END AS hist
      FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
    SELECT user_id, ts, admitted FROM rec ORDER BY user_id, ts LIMIT 500
    """,
    tags=("ratelimit", "stateful"),
)
def x63_stateful_ratelimit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the applyInPandasWithState R1 admission kernel;
    streaming==batch equivalence in test_streaming.py, and the sequential
    recurrence itself is hash-verified against a recursive-CTE replay."""
    from aetherium_trader_datapipeline_spark.streaming.stateful import (
        RateWindow,
        rate_limit_batch,
    )

    t = load_tables(spark, sf_dir)
    # r14: pin the group-key exchange width so the per-user Python replay
    # spreads across workers instead of one AQE-coalesced task (the x171
    # fix; see queries_ext21)
    p = spark.sparkContext.defaultParallelism * 2
    out = rate_limit_batch(
        t["events"].repartition(p, "user_id"),
        "ts", ["user_id"], windows=(RateWindow(3, 3600), RateWindow(1, 600))
    )
    return out.orderBy("user_id", "ts").limit(500)


@register(
    "x53_approx_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_custs,
           TRUE AS in_tol
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("approx",),
)
def x53_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct count, made hash-verifiable (the x187/x229 sketch
    pattern): the approx estimate itself is engine-specific, so the output
    carries the EXACT count plus a boolean asserting the estimate landed
    within HLL++'s documented ±5% band. The oracle emits exact + TRUE — a
    drifting sketch flips in_tol and fails the value hash."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_custs"),
            F.approx_count_distinct("o_custkey", 0.02).alias("_approx"),
        )
        .select(
            "o_orderstatus",
            "exact_custs",
            (
                F.abs(F.col("_approx") - F.col("exact_custs"))
                <= 0.05 * F.col("exact_custs")
            ).alias("in_tol"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "x54_percentile_approx",
    oracle="""
    SELECT ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 2) AS p50_exact,
           ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 2) AS p90_exact,
           ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 2) AS p99_exact,
           TRUE AS in_tol
    FROM lineitem
    """,
    tags=("approx",),
)
def x54_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL-style approx percentiles next to the exact interpolated ones
    (Spark `percentile` and DuckDB `quantile_cont` share R-type-7
    interpolation). Hash-verified exact values + an in-tolerance flag over
    the approx triple (±1% relative at accuracy=10000)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(F.col("l_extendedprice").cast("double").alias("px"))
    agg = li.agg(
        F.expr("percentile(px, array(0.5, 0.9, 0.99))").alias("exact"),
        F.percentile_approx("px", [0.5, 0.9, 0.99], 10000).alias("approx"),
    )
    within = F.expr(
        "forall(zip_with(exact, approx, (e, a) -> abs(a - e) <= 0.01 * e), x -> x)"
    )
    return agg.select(
        F.round(F.element_at("exact", 1), 2).alias("p50_exact"),
        F.round(F.element_at("exact", 2), 2).alias("p90_exact"),
        F.round(F.element_at("exact", 3), 2).alias("p99_exact"),
        within.alias("in_tol"),
    )
