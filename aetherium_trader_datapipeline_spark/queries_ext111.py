"""Wave 111 (x408): successive-approximation progressive JPEG decode.

The last JPEG entropy mode in scope: successive approximation — DC
point transform (arithmetic shift) + raw-bit DC refinement, AC
truncate-toward-zero point transform + the G.1.2.3 refinement protocol
(correction bits on already-significant coefficients interleaved with
run-coded newly-significant ±2^Al values).  This is the scan script
libjpeg-style encoders emit by default, i.e. what "a progressive JPEG
from the wild" almost always is.  After this wave the decode tier's
PIL gates are down to exotic sampling-factor sets, restart intervals,
and arithmetic coding.

Exactness: same split as x405 — the closed-form oracle verifies the
whole pipeline on block-constant fixtures (where SA's refinement path
degenerates to EOBs), and the STRONG check for the refinement bit
protocol is the pytest that decodes random lossy content through both
the SA layout and the baseline layout and demands bit-identical
rasters (identical coefficients, maximally different entropy
arrangements).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

_X408_ORACLE = """
    WITH d AS (
      SELECT doc_id,
             8 * (1 + doc_id % 3) + doc_id % 5 AS w,
             8 * (1 + doc_id % 2) + doc_id % 3 AS h
      FROM documents WHERE doc_id <= 200
    ),
    px AS (
      SELECT doc_id, w, h,
             list_transform(range(0, w * h),
               i -> ((doc_id * 37 + ((i % w) // 8) * 23
                      + ((i // w) // 8) * 41) % 128) * 2) AS v
      FROM d
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS channels,
           CAST(list_sum(v) AS BIGINT) AS px_sum,
           CAST(list_min(v) AS INTEGER) AS px_min,
           CAST(list_max(v) AS INTEGER) AS px_max
    FROM px ORDER BY doc_id
"""


@register(
    "x408_jpeg_sa_progressive_stats",
    oracle=_X408_ORACLE,
    tags=("multimodal", "decode"),
)
def x408_jpeg_sa_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real successive-approximation progressive decode, hash-verified:
    block-constant tiles through the four-scan SA script (DC first,
    AC first, DC refinement, AC refinement) and the multi-scan decoder."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg_progressive_sa,
        image_pixel_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        w = 8 * (1 + d % 3) + d % 5
        h = 8 * (1 + d % 2) + d % 3
        px = bytes(
            ((d * 37 + (x // 8) * 23 + (y // 8) * 41) % 128) * 2
            for y in range(h)
            for x in range(w)
        )
        return encode_jpeg_progressive_sa(w, h, px)

    # r13: fused synth→decode→stats — one MapInPandas, blob stays in the
    # worker (guide §4.1/§8); same encoder/decoder path as before.
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")
