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
