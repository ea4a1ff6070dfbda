"""Operator-level tests for the curation surface (operators/curation.py):
packing invariants, mixture determinism, decontamination broadcast plan,
k-means convergence behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.operators.curation import (
    decontaminate,
    domain_mix_sample,
    kmeans_embeddings,
    pack_sequences,
    repetition_stats,
)
from aetherium_trader_datapipeline_spark.tables import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return load_tables(spark, SF)


def test_pack_sequences_invariants(spark, tables):
    docs = tables["documents"]
    budget = 200
    packed = pack_sequences(docs, budget=budget, n_shards=8).cache()
    request_unpersist = packed  # unpersisted at the end: a lingering cache
    # entry would substitute InMemoryTableScan into later plan audits
    # every doc appears exactly once
    assert packed.count() == docs.count()
    # no pack exceeds the budget unless it is a single oversized doc
    over = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("tokens").alias("s"), F.count(F.lit(1)).alias("n"))
        .where((F.col("s") > budget) & (F.col("n") > 1))
    )
    assert over.count() == 0
    # pack ids are dense from 0 within each shard
    ids = packed.groupBy("shard").agg(
        F.min("pack_id").alias("lo"),
        F.max("pack_id").alias("hi"),
        F.countDistinct("pack_id").alias("nd"),
    )
    bad = ids.where((F.col("lo") != 0) | (F.col("nd") != F.col("hi") + 1))
    assert bad.count() == 0
    # next-fit is order-greedy: within a shard, pack_id is monotone in doc_id
    w = packed.withColumn(
        "prev",
        F.lag("pack_id").over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "shard"
            ).orderBy("doc_id")
        ),
    )
    assert w.where(F.col("prev") > F.col("pack_id")).count() == 0
    request_unpersist.unpersist()


def test_domain_mix_deterministic_and_bounded(spark, tables):
    docs = tables["documents"]
    weights = spark.createDataFrame([("src0", 1.0), ("src1", 0.0)], "source string, w double")
    kept = domain_mix_sample(docs, weights, default_weight=0.5)
    # w=1.0 keeps everything, w=0.0 keeps nothing
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert kept.where(F.col("source") == "src0").count() == n_src0
    assert kept.where(F.col("source") == "src1").count() == 0
    # deterministic: two runs agree row-for-row
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in domain_mix_sample(docs, weights, default_weight=0.5).select("doc_id").collect())
    assert a == b


def test_decontaminate_broadcasts_benchmark(spark, tables):
    docs = tables["documents"]
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    out = decontaminate(train, bench, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side must not shuffle
    # a doc trivially overlaps itself: run corpus vs corpus, every doc
    # with >= 5 words must self-hit with contamination 1.0
    self_hits = decontaminate(docs, docs, "doc_id")
    n_long = docs.where(F.size(F.split(F.lower("text"), " ")) >= 5).count()
    assert self_hits.where(F.col("contamination") == 1.0).count() == n_long


def test_repetition_stats_bounds(spark, tables):
    docs = tables["documents"]
    st = repetition_stats(docs, "doc_id")
    bad = st.where(
        (F.col("dup_word_frac") < 0)
        | (F.col("dup_word_frac") > 1)
        | (F.col("top_bigram_frac") <= 0)
        | (F.col("top_bigram_frac") > 1)
    )
    assert bad.count() == 0
    assert st.count() == docs.count()


def test_kmeans_partitions_all_points_and_improves(spark, tables):
    emb = tables["embeddings"]
    n = emb.count()
    one = kmeans_embeddings(emb, k=4, iters=1)
    three = kmeans_embeddings(emb, k=4, iters=3)
    assert one.count() == n and three.count() == n
    # Lloyd's monotonically decreases total distortion
    d1 = one.agg(F.sum("dist")).collect()[0][0]
    d3 = three.agg(F.sum("dist")).collect()[0][0]
    assert d3 <= d1 + 1e-9
    # deterministic across runs
    again = kmeans_embeddings(emb, k=4, iters=3)
    assert sorted(map(tuple, three.collect())) == sorted(map(tuple, again.collect()))
