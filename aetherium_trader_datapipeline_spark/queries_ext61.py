"""Wave 61 (x275–x280): dataset-construction diagnostics for the
LLM-pipeline surface — reproducible sampling, corpus quality signals,
quantization, capacity planning, and LSH tuning.

Extends the reference's data-quality posture (tick validation
`domain/src/tick.rs:27-49`, duplicate suppression `rate_limiting/
limiter.rs:58-60`) to corpus-level instrumentation: each key answers a
question a 100 TB training-data build actually asks (which docs enter the
sample? how degenerate is the text? how novel is each increment? what does
quantization cost? how many bins does the corpus need? how many LSH bands
buy how much recall?).

All six are oracle-paired; x280 is fully EXACT (the portable md5 hash
family makes even the LSH candidate sets engine-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x275: deterministic per-stratum reservoir sample -----------------------
# Reproducible distributed sampling: rank docs inside each language stratum
# by md5(doc_id) — a uniform, engine-portable permutation — and keep the
# first 5. No RNG state, no seed plumbing, identical sample on any cluster
# layout; the per-stratum window is the only shuffle.

_X275_FMT = """
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS rk
      FROM documents
    ) t WHERE rk <= 5
    ORDER BY lang, rk
"""

register_sql(
    "x275_reservoir_sample",
    spark_sql=_X275_FMT.replace("AS VARCHAR", "AS STRING"),
    duckdb_sql=_X275_FMT,
    tags=("sampling", "curation"),
)

# -- x276: per-doc character-level Shannon entropy --------------------------
# Low-entropy docs (repeated chars, boilerplate) are a standard corpus
# quality filter. Chars via 1-char substrings (portable: Spark's
# split(text, '') and DuckDB's string_split differ on empty-separator
# semantics, so both sides index substr over a position sequence).


def _x276_sql(substr_seq: str) -> str:
    return f"""
    WITH chars AS (
      -- length(text) > 0 guards Spark's sequence(1, 0) = [1, 0] DESCENDING
      -- hazard on empty text (DuckDB's range(1, 1) is empty); both engines
      -- now agree that empty docs emit no entropy row.
      SELECT doc_id, {substr_seq} AS ch FROM documents
      WHERE doc_id <= 300 AND length(text) > 0
    ),
    freq AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    tot AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           ROUND(-SUM((c / n) * LN(c / n) / LN(2)), 4) AS entropy_bits
    FROM freq f JOIN tot USING (doc_id)
    GROUP BY f.doc_id, n
    ORDER BY f.doc_id
"""


register_sql(
    "x276_char_entropy",
    spark_sql=_x276_sql(
        "explode(transform(sequence(1, length(text)), i -> substr(text, i, 1)))"
    ),
    duckdb_sql=_x276_sql(
        "unnest(list_transform(range(1, length(text) + 1), i -> text[i:i]))"
    ),
    tags=("text", "quality"),
)

# -- x277: n-gram novelty by ingestion order --------------------------------
# "How much NEW content does each doc add?" — the incremental-dedup
# diagnostic for growing corpora: fraction of a doc's distinct 2-gram
# shingles whose FIRST appearance (min doc_id, doc_id as ingestion order)
# is this doc. Plan: per-doc distinct shingles once (localCheckpoint —
# both aggregations below consume it), then groupBy(sh).min → re-aggregate
# the min-holders by doc, and a small id-keyed join. The naive form (join
# the full shingle stream back to first_seen on the STRING shingle key)
# measured 8.3 s at sf0.1 — hot shingles make that join shuffle-heavy;
# this form touches the wide stream twice but only shuffles doc-keyed
# aggregates.

_X277_DUCK = """
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, gram AS sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(string_split(lower(text), ' ')), 1)),
                      i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1])) AS gram
        FROM documents
      ) g WHERE gram IS NOT NULL
    ),
    first_seen AS (SELECT sh, MIN(id) AS first_id FROM sh GROUP BY sh)
    SELECT s.id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(CASE WHEN f.first_id = s.id THEN 1 END) AS BIGINT) AS n_novel,
           ROUND(COUNT(CASE WHEN f.first_id = s.id THEN 1 END) / CAST(COUNT(*) AS DOUBLE), 4)
             AS novelty
    FROM sh s JOIN first_seen f ON s.sh = f.sh
    GROUP BY s.id ORDER BY s.id LIMIT 300
"""

@register("x277_ngram_novelty", oracle=_X277_DUCK, tags=("dedup", "curation"))
def x277_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import _shingles

    docs = load_tables(spark, sf_dir)["documents"]
    sh = _shingles(docs, "doc_id", "text", 2).localCheckpoint(eager=False)
    n_per_id = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    novel_per_id = (
        sh.groupBy("sh")
        .agg(F.min("id").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        n_per_id.join(novel_per_id, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "n_shingles",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0))
                / F.col("n_shingles").cast("double"),
                4,
            ).alias("novelty"),
        )
        .orderBy("doc_id")
        .limit(300)
    )

# -- x278: int8 embedding quantization --------------------------------------
# Symmetric per-vector int8 quantization (scale = max|x|, q = round(127
# x/scale)) with an integer checksum and the max reconstruction error —
# the storage-planning numbers for serving a quantized ANN index. Map-only:
# every quantity is computed inside the row's array.

_X278_FMT = """
    SELECT vec_id,
           CAST({n_dims} AS BIGINT) AS n_dims,
           CAST({checksum} AS BIGINT) AS q_checksum,
           ROUND({max_err}, 6) AS max_abs_err
    FROM ({base}) v
    ORDER BY vec_id LIMIT 200
"""

_SPARK_BASE = (
    "SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS e, "
    "array_max(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> abs(x))) AS s "
    "FROM embeddings"
)
_DUCK_BASE = (
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, "
    "list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS s "
    "FROM embeddings"
)

register_sql(
    "x278_embedding_quantize_int8",
    spark_sql=_X278_FMT.format(
        base=_SPARK_BASE,
        n_dims="size(e)",
        checksum="aggregate(transform(e, x -> abs(round(127 * x / s))), 0D, (a, b) -> a + b)",
        max_err="array_max(transform(e, x -> abs(round(127 * x / s) * s / 127 - x)))",
    ),
    duckdb_sql=_X278_FMT.format(
        base=_DUCK_BASE,
        n_dims="len(e)",
        checksum="list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(e, x -> abs(round(127 * x / s)))), (a, b) -> a + b)",
        max_err="list_max(list_transform(e, x -> abs(round(127 * x / s) * s / 127 - x)))",
    ),
    tags=("similarity", "quantization"),
)

# -- x279: token-budget histogram -------------------------------------------
# Capacity planning for packing/sharding: docs bucketed by 50-token bands
# (capped at 20+), with the cumulative corpus fraction per band. One
# map-side bucket expression + a 21-row window.

_X279_FMT = """
    WITH b AS (
      SELECT LEAST({ntok} // 50, 20) AS bucket FROM documents
    ),
    h AS (SELECT bucket, COUNT(*) AS n_docs FROM b GROUP BY bucket)
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_docs AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(n_docs) OVER (ORDER BY bucket) AS DOUBLE)
                 / SUM(n_docs) OVER (), 4) AS cum_frac
    FROM h ORDER BY bucket
"""

register_sql(
    "x279_token_budget_histogram",
    spark_sql=_X279_FMT.format(ntok="size(split(text, ' '))").replace("//", "DIV"),
    duckdb_sql=_X279_FMT.format(ntok="len(string_split(text, ' '))"),
    tags=("curation", "histogram"),
)

# -- x280: portable-LSH recall curve ----------------------------------------
# The LSH tuning question answered exactly: for b = 1..4 bands of the
# 16-perm portable MinHash (x129's hash family), how many of the exact
# Jaccard >= 0.5 pairs does the candidate set recall? Both the truth set
# and every candidate set are engine-deterministic, so all three columns
# hash-verify — a parameter-sweep harness, not a tolerance check.

from aetherium_trader_datapipeline_spark.queries_ext14 import (  # noqa: E402
    _NB,
    _NP,
    _X129_CTES,
)

_X280_ORACLE = (
    _X129_CTES
    + """,
    freq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
    -- relative df cap (r7): GREATEST keeps sf0.001/sf0.01 at the old 100
    -- while scaling with the corpus (the absolute cap collapsed at sf0.1)
    shc AS (SELECT id, sh.sh FROM sh JOIN freq USING (sh)
            WHERE freq.df <= GREATEST(100,
                  CEIL(0.2 * (SELECT COUNT(*) FROM documents)))),
    sizes AS (SELECT id, COUNT(*) AS sz FROM shc GROUP BY id),
    inter AS (
      SELECT a.id AS a, b.id AS b, COUNT(*) AS inter
      FROM shc a JOIN shc b ON a.sh = b.sh AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    truth AS (
      SELECT a, b
      FROM inter JOIN sizes sa ON sa.id = inter.a JOIN sizes sb ON sb.id = inter.b
      WHERE inter * 2 >= 1 * (sa.sz + sb.sz - inter)
    ),
    cand AS (
      SELECT DISTINCT x.id AS a, y.id AS b, x.band
      FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.id < y.id
    )
    SELECT CAST(L.n AS BIGINT) AS bands_used,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT t.a, t.b FROM truth t
               JOIN cand c ON t.a = c.a AND t.b = c.b AND c.band < L.n)) AS n_recalled
    FROM (VALUES (1), (2), (3), (4)) L(n)
    ORDER BY bands_used
"""
)


@register("x280_minhash_recall_curve", oracle=_X280_ORACLE, tags=("dedup", "lsh"))
def x280_minhash_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        _portable_band_explode,
    )
    from aetherium_trader_datapipeline_spark.queries_ext import _exact_jaccard_pairs

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    # Truth semantics this key asserts: exact Jaccard >= 1/2 over shingles
    # with document frequency <= 100 — the same rare-shingle cap x47/x48 use
    # (a hot boilerplate shingle shared by thousands of docs carries no
    # near-dup signal but makes the exact self-join quadratic).  The oracle's
    # `shc` CTE applies the identical df cap so both truth sets agree at any
    # duplicate density, not just while max df happens to stay under the cap.
    # The LSH bands stay UNCAPPED in both engines: recall is "of the capped
    # truth pairs, how many does full-shingle LSH surface".
    truth = _exact_jaccard_pairs(docs, p=1, q=2).localCheckpoint(eager=False)
    exploded = _portable_band_explode(
        docs, "doc_id", "text", 2, _NP, _NB
    ).localCheckpoint(eager=False)
    # Never enumerate candidate PAIRS (quadratic in bucket size — the
    # all-pairs form measured 87 s on the duplicate-heavy 10× replica).
    # Only truth pairs matter for recall, so probe bucket co-membership
    # FROM the truth set: truth ⋈ bands(a) ⋈ bands(b) is |truth|×bands
    # rows, linear regardless of bucket skew. min(band) per pair then
    # answers every prefix-length L at once.
    ea = exploded.select(F.col("id").alias("a"), "band", "bk")
    eb = exploded.select(F.col("id").alias("b"), "band", "bk")
    first_shared = (
        truth.join(ea, "a")
        .join(eb, ["b", "band", "bk"])
        .groupBy("a", "b")
        .agg(F.min("band").alias("mb"))
        .localCheckpoint(eager=False)
    )
    out = None
    for L in range(1, _NB + 1):
        n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
        n_rec = first_shared.where(F.col("mb") < L).agg(
            F.count(F.lit(1)).alias("n_recalled")
        )
        row = n_truth.crossJoin(n_rec).select(
            F.lit(L).cast("bigint").alias("bands_used"), "n_truth", "n_recalled"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("bands_used")
