"""End-to-end streaming curation pipeline: documents arrive as files →
quality gate → exact dedup → domain-mixture sample → lang-partitioned
parquet sink. The streaming result must equal the batch composition of
the same operators (micro-batch execution is an implementation detail,
not a semantics change) — the document-domain analogue of the tick
ingest e2e (tests/test_e2e_platform.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.operators.curation import domain_mix_sample
from aetherium_trader_datapipeline_spark.operators.dedup import dedup_exact
from aetherium_trader_datapipeline_spark.operators.textops import quality_score
from aetherium_trader_datapipeline_spark.tables import load_tables

SF = "/root/testdata/sf0.001"
_WEIGHTS = [("src0", 1.0), ("src1", 0.6), ("src2", 0.3)]


def _curate(df, weights):
    """The pipeline under test, expressed once and reused by both modes.

    Stateless row-wise stages (quality, mixture) stream as-is; exact
    dedup keys on content hash, which in a real stream would be
    dropDuplicatesWithinWatermark — at availableNow scope they agree.
    """
    gated = quality_score(df).where(
        (F.col("n_tokens") >= 5) & (F.col("quality") >= 0.2)
    )
    deduped = dedup_exact(gated, ["text"])
    return domain_mix_sample(deduped, weights, default_weight=0.5).select(
        "doc_id", "lang", "source", "text"
    )


def test_streaming_curation_equals_batch(spark, tmp_path):
    docs = load_tables(spark, SF)["documents"]
    weights = spark.createDataFrame(_WEIGHTS, "source string, w double")

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    # land the corpus as several files so availableNow sees multiple splits
    docs.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        _curate(stream, weights)
        .writeStream.format("parquet")
        .partitionBy("lang")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    expect = _curate(spark.read.parquet(src), weights)

    # partition layout: lang directories exist
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert langs == {r["lang"] for r in expect.select("lang").distinct().collect()}

    # exact-set equality (dedup keeps one arbitrary row per text in each
    # mode, so compare on the deduped content key + invariant columns)
    g = sorted((r["text"], r["lang"], r["source"]) for r in got.collect())
    e = sorted((r["text"], r["lang"], r["source"]) for r in expect.collect())
    assert g == e
    assert got.count() > 0


def test_full_batch_curation_with_neardup_collapse(spark, tmp_path):
    """The complete curation chain on a corpus with planted near-dups:
    quality gate → MinHash bucket-min assignments → connected components →
    keep the min-id representative per near-dup cluster → domain mix →
    sequence packing. Verifies the assignment edges reproduce the planted
    clusters and that exactly one representative per cluster survives."""
    from aetherium_trader_datapipeline_spark.operators.curation import (
        domain_mix_sample,
        pack_sequences,
    )
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        minhash_portable_assignments,
    )
    from aetherium_trader_datapipeline_spark.operators.graph import connected_components

    docs = load_tables(spark, SF)["documents"]
    # Plant 3 near-identical variants of 5 docs (one-word growth per copy).
    originals = docs.orderBy("doc_id").limit(5).select("doc_id", "lang", "source", "text")
    variants = []
    for i in range(1, 3):
        variants.append(
            originals.select(
                (F.col("doc_id") + F.lit(100_000 * i)).alias("doc_id"),
                "lang",
                "source",
                F.concat_ws(" ", "text", F.lit(f"tail{i}")).alias("text"),
            )
        )
    corpus = docs.select("doc_id", "lang", "source", "text")
    for v in variants:
        corpus = corpus.unionByName(v)

    edges = minhash_portable_assignments(corpus, "doc_id")
    comps = connected_components(edges, src="id", dst="rep")
    canonical = (
        corpus.join(comps, corpus.doc_id == comps.node, "left")
        .withColumn("cluster", F.coalesce("component", "doc_id"))
        .where(F.col("doc_id") == F.col("cluster"))  # keep min-id rep
        .select("doc_id", "lang", "source", "text")
    )
    # every planted variant collapsed onto its original
    orig_ids = [r.doc_id for r in originals.select("doc_id").collect()]
    kept_ids = {r.doc_id for r in canonical.select("doc_id").collect()}
    assert all(oid in kept_ids for oid in orig_ids)
    assert not any(i >= 100_000 for i in kept_ids)

    weights = spark.createDataFrame(_WEIGHTS, "source string, w double")
    mixed = domain_mix_sample(canonical, weights, default_weight=0.5)
    packed = pack_sequences(mixed, id_col="doc_id", text_col="text", budget=512)
    assert packed.count() > 0
    # a doc over budget gets its own pack; multi-doc packs stay within it
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("tokens").alias("tok"), F.count(F.lit(1)).alias("n")
    )
    viol = per_pack.where((F.col("n") > 1) & (F.col("tok") > 512)).count()
    assert viol == 0


def test_full_pipeline_with_round4_stages(spark, tmp_path):
    """Round-4 chain: decontaminate vs a benchmark → entropy/repetition
    quality gates → novelty stats → weighted reservoir per language →
    join int8-quantized embeddings for the sample. Asserts each stage's
    structural contract on real fixture data."""
    from aetherium_trader_datapipeline_spark.operators.curation import decontaminate
    from aetherium_trader_datapipeline_spark.operators.dedup import dedup_exact

    t = load_tables(spark, SF)
    docs = t["documents"].select("doc_id", "lang", "source", "text")
    emb = t["embeddings"]

    # 1. exact dedup on content
    deduped = dedup_exact(docs, ["text"])
    n0, n1 = docs.count(), deduped.count()
    assert 0 < n1 <= n0

    # 2. decontamination: benchmark = 20 lowest-id docs; any doc sharing a
    # 5-gram is flagged; originals of the benchmark must flag themselves
    bench = docs.orderBy("doc_id").limit(20)
    flagged = decontaminate(deduped, bench, "doc_id")
    flagged_ids = {r.id for r in flagged.select("id").collect()}
    bench_ids = {r.doc_id for r in bench.collect()}
    surviving_bench = bench_ids & {r.doc_id for r in deduped.collect()}
    assert surviving_bench <= flagged_ids  # self-contamination always flags
    clean = deduped.join(
        flagged.where(F.col("contamination") >= 0.5).select(F.col("id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )
    assert clean.count() < n1  # the benchmark originals dropped

    # 3. weighted reservoir per language over the clean pool (w = chars)
    keyed = clean.where(F.length("text") > 0).withColumn(
        "u",
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
        ),
    )
    from pyspark.sql.window import Window

    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.expr("u DIV length(text)"), F.col("doc_id")
        )
    )
    sample = keyed.withColumn("rk", rk).where(F.col("rk") <= 5)
    per_lang = {r.lang: r.n for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 5 for n in per_lang.values()) and per_lang

    # 4. attach int8-quantized embeddings for sampled docs that have one
    joined = sample.join(emb, sample.doc_id == emb.vec_id, "inner")
    q = joined.select(
        "doc_id",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(127 * x /"
            " array_max(transform(CAST(embedding AS ARRAY<DOUBLE>), y -> abs(y)))) AS INT))"
        ).alias("q8"),
    )
    row = q.select(F.min(F.expr("array_min(q8)")).alias("lo"),
                   F.max(F.expr("array_max(q8)")).alias("hi")).head()
    if row.lo is not None:
        assert -127 <= row.lo and row.hi <= 127


def test_full_pipeline_with_round5_stages(spark, tmp_path):
    """Round-5 chain: sublinear domain caps → hash train/valid/test split →
    incremental LSH dedup of the test batch against train → leakage
    classification → per-source dataset card. Asserts each stage's
    structural contract on real fixture data."""
    import math

    from pyspark.sql.window import Window

    from aetherium_trader_datapipeline_spark.operators.dedup import (
        minhash_incremental_assignments,
    )
    from aetherium_trader_datapipeline_spark.queries_ext12 import _SPLIT_EXPR

    docs = load_tables(spark, SF)["documents"]

    # 1. per-domain cap: 4*ceil(sqrt(n)) keep-best by (n_chars, doc_id)
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    )
    caps = docs.groupBy("source").agg(
        F.expr("CAST(4 * CEIL(SQRT(COUNT(*))) AS BIGINT)").alias("cap")
    )
    capped = (
        docs.withColumn("rk", rk).join(caps, "source").where(F.col("rk") <= F.col("cap"))
    )
    sizes = {r.source: (r.n, r.cap) for r in capped.groupBy("source", "cap")
             .agg(F.count("*").alias("n")).collect()}
    assert sizes
    for src, (n, cap) in sizes.items():
        assert n <= cap

    # 2. deterministic hash split
    split = capped.withColumn("split", F.expr(_SPLIT_EXPR))
    per_split = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(per_split) <= {"train", "valid", "test"}
    assert per_split.get("train", 0) > per_split.get("valid", 0)

    # 3. incremental dedup: test batch probes the train corpus only
    train = split.where("split = 'train'")
    test = split.where("split = 'test'")
    asg = minhash_incremental_assignments(test, train, "doc_id", "text")
    if asg.count() > 0:
        test_ids = {r.doc_id for r in test.select("doc_id").collect()}
        train_ids = {r.doc_id for r in train.select("doc_id").collect()}
        for r in asg.collect():
            assert r.id in test_ids      # only the new batch is classified
            assert r.rep in train_ids    # only against the existing corpus

    # 4. leakage accounting: every matched test doc is a leak candidate
    leaks = asg.select("id").distinct().count()
    assert leaks <= test.count()

    # 5. dataset card on the shipped (capped, leak-free-test) pool
    shipped = split.join(asg.select(F.col("id").alias("doc_id")).distinct(),
                         "doc_id", "left_anti")
    card = (
        shipped.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
        )
        .collect()
    )
    assert sum(r.n_docs for r in card) == shipped.count()
    for r in card:
        assert r.n_exact_dups >= 0 and r.total_chars > 0
