"""Training-data curation operators: benchmark decontamination,
intra-document repetition filtering, domain-mixture sampling, and
sequence packing.

These extend the reference's data-quality surface (tick validation,
`domain/src/tick.rs:27-49`; duplicate suppression, `rate_limiting/
limiter.rs:58-60`) to the document/LLM-pipeline domain: instead of
rejecting malformed ticks we reject contaminated / degenerate / over- or
under-represented documents before they reach a training mix.

Scale design (100 TB):
- decontamination joins the corpus against a *broadcast* benchmark
  shingle set — the benchmark side is small by construction (eval sets,
  not corpora), so no shuffle of the big side ever happens;
- repetition stats are per-row expressions plus one groupBy on
  (doc, gram) — all JVM-side, no UDFs;
- mixture sampling is a hash-threshold filter (no sort, no sampleBy —
  deterministic and reproducible across runs/engines);
- packing is applyInPandas per shard: shards are hash partitions, each
  processed sequentially in one Arrow batch — the only genuinely
  order-dependent step, bounded by shard size not corpus size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.operators.dedup import _shingles


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    gram_size: int = 5,
) -> DataFrame:
    """Per corpus doc: how many of its distinct word-``gram_size``-grams
    appear in the benchmark set (and the contaminated fraction).

    Docs with zero overlap are not emitted — at scale they are the
    overwhelming majority; downstream drops via semi-join on the result.
    """
    tr = _shingles(corpus, id_col, text_col, gram_size)
    be = (
        _shingles(benchmark, id_col, text_col, gram_size)
        .select("sh")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # ONE pass over the corpus shingles: broadcast LEFT join marks hits,
    # a single groupBy counts totals and hits together. The previous
    # two-aggregate + join form derived the (tokenize → gram → explode)
    # shingle stream twice — measured as the r3 x135 wall drift.
    return (
        tr.join(F.broadcast(be), "sh", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("hit_grams"),
        )
        .where(F.col("hit_grams") >= 1)
        .select(
            "id",
            "hit_grams",
            F.round(F.col("hit_grams") / F.col("n_grams"), 4).alias("contamination"),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Gopher-style degenerate-repetition signals per document:
    duplicate-word fraction and most-frequent-bigram fraction."""
    # materialize the split once (see dedup._shingles: inlining it into
    # the lambda re-tokenizes the doc per gram term)
    wsdf = df.select(
        F.col(id_col).alias("id"), F.split(F.lower(F.col(text_col)), " ").alias("ws")
    )
    ws = F.col("ws")
    base = wsdf.select(
        "id",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_distinct"),
    )
    # non-distinct bigrams (repetition is the signal — do NOT dedup)
    n_grams = F.size(ws) - 1
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.expr("array()").cast("array<int>")
    )
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i.cast("int")), F.element_at(ws, (i + 1).cast("int"))
        ),
    )
    top = (
        wsdf.select("id", F.explode(gram).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("tot"))
    )
    return base.join(top, "id").select(
        "id",
        F.round(1 - F.col("n_distinct") / F.col("n_words"), 4).alias("dup_word_frac"),
        F.round(F.col("top_c") / F.col("tot"), 4).alias("top_bigram_frac"),
    )


def domain_mix_sample(
    df: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 0.1,
) -> DataFrame:
    """Deterministic mixture sampling: keep each row iff
    md5-hash-uniform(id) < weight(source).

    ``weights`` is a tiny (source, w) dim — broadcast, never shuffled.
    Hash thresholding (not ``sample()``/``sampleBy()``) makes the result
    reproducible across runs, partitionings, and engines.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )
    return (
        df.join(F.broadcast(weights), on=source_col, how="left")
        .withColumn("w", F.coalesce(F.col("w"), F.lit(default_weight)))
        .where(u < F.col("w"))
        .drop("w")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 200,
    n_shards: int = 8,
) -> DataFrame:
    """Next-fit sequence packing: assign docs (ordered by id within a hash
    shard) to fixed-token-budget packs. A doc larger than the budget gets
    its own pack. Returns (shard, doc_id, tokens, pack_id).

    The sequential greedy runs per shard inside one applyInPandas batch;
    at 100 TB you raise ``n_shards`` to the parallelism you want — packs
    never span shards, so shards are embarrassingly parallel.
    """
    toks = df.select(
        (F.col(id_col) % n_shards).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.lower(F.col(text_col)), " ")).cast("bigint").alias("tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack, fill, out = 0, 0, []
        for t in pdf["tokens"]:
            if fill > 0 and fill + t > budget:
                pack, fill = pack + 1, 0
            fill += int(t)
            out.append(pack)
        pdf["pack_id"] = pd.Series(out, dtype="int64")
        return pdf

    return toks.groupBy("shard").applyInPandas(
        _pack, "shard bigint, doc_id bigint, tokens bigint, pack_id bigint"
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "v",
) -> DataFrame:
    """Add (cluster, dist) = nearest centroid by squared L2.

    Distances are sequential left-folds over the array (same accumulation
    order as a scalar SQL engine), ties broken by smallest centroid id.
    """
    # r13: the expression is built as ONE SQL string per column instead of
    # k×dim py4j-constructed Column objects — semantically identical
    # (repr() of a Python float is the shortest round-tripping decimal, and
    # Spark parses double literals with the same round-to-nearest rule, so
    # every literal is bit-identical), but plan construction drops from
    # ~0.28 s to ~0.01 s per Lloyd iteration (measured sf0.1; the py4j
    # round-trips per literal were the cost, guide §1.2 "per-task work"
    # applied to the driver). Fold shape is unchanged: sequential left-fold
    # per centroid, ties broken by smallest centroid id via array_position.
    def _lit(x: float) -> str:
        v = float(x)
        return f"CAST('{v!r}' AS DOUBLE)" if v != v else f"{v!r}D"

    dists = [
        f"aggregate(zip_with({vec_col}, array({', '.join(_lit(x) for x in c)}), "
        "(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
        for _, c in centroids
    ]
    darr = f"array({', '.join(dists)})"
    # bare int literals: IntegerType, matching the previous F.lit(int(cid))
    cids = f"array({', '.join(str(int(cid)) for cid, _ in centroids)})"
    return df.withColumn("dist", F.expr(f"array_min({darr})")).withColumn(
        "cluster",
        F.expr(
            f"element_at({cids}, cast(array_position({darr}, array_min({darr})) as int))"
        ),
    )


def kmeans_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Lloyd's k-means on an embedding column, fixed iteration count,
    deterministic init (centroids = the ``k`` smallest ids).

    Per iteration: one broadcast-closure assignment pass (no shuffle of
    the big side) + one groupBy producing k rows of per-dim means —
    only k×dim floats ever reach the driver, so the loop is safe at any
    corpus size. Returns final (id, cluster, dist) assignments.
    """
    e = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=False)
    # cast once; iterations re-read the materialized RDD, not parquet.
    # Lazy checkpoint (r13): the init collect below is the first action, so
    # materialization piggybacks on it — one driver job instead of two
    # (guide §1.2: fewer sequential jobs is the lever for iterative loops).
    init = e.orderBy("id").limit(k).collect()
    cents = [(i, list(r["v"])) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = kmeans_assign(e, cents)
        # per-dim means via posexplode + (cluster, dim) partial agg: the
        # 64-wide explode collapses map-side, so the shuffle is k*dim rows;
        # the plan shape is also iteration-invariant, which keeps Catalyst
        # from re-deriving a 64-aggregate plan per round (measured 2.5x)
        upd = (
            assigned.select("cluster", F.posexplode("v").alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(F.avg("x").alias("av"))
            .collect()
        )
        byc: dict[int, dict[int, float]] = {}
        for r in upd:
            byc.setdefault(int(r["cluster"]), {})[int(r["d"])] = r["av"]
        cents = sorted((c, [v[d] for d in range(dim)]) for c, v in byc.items())
    return kmeans_assign(e, cents).select("id", "cluster", "dist")
