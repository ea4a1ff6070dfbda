"""Wave 110 (x407): progressive COLOR JPEG decode, oracle-verified.

The last step of the r6 decode-tier sweep: three-component progressive
files — one interleaved DC scan (ns=3, per-component predictors) plus
per-component AC band scans with EOB-run coding, the scan structure
real progressive color JPEGs use.  With x382 (baseline 4:4:4 color),
x405 (progressive grayscale), and x406 (4:2:0), the remaining PIL
gates are successive approximation, subsampled progressive, and exotic
sampling factor sets.

Exactness: x382's fixture and closed-form oracle verbatim — the
quantized coefficients are identical between baseline and progressive
layouts, so the same block-constant YCbCr planes and the same BT.601
closed form verify this entropy arrangement end to end; pytest
additionally proves progressive-color-decode ≡ baseline-color-decode
on random lossy content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.queries_ext100 import _X382_ORACLE
from aetherium_trader_datapipeline_spark.tables import load_tables


@register(
    "x407_jpeg_progressive_color_stats",
    oracle=_X382_ORACLE,
    tags=("multimodal", "decode"),
)
def x407_jpeg_progressive_color_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real progressive-color JPEG decode, hash-verified: x382's
    block-constant YCbCr planes through encode_jpeg_progressive_color
    (interleaved DC scan + per-component AC band scans) and the
    multi-scan decoder, reduced to the same integer stats x382's
    closed-form oracle re-derives."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg_progressive_color,
        image_pixel_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        w = 8 * (1 + d % 3) + d % 5
        h = 8 * (1 + d % 2) + d % 3

        def plane(a: int, b: int, c: int) -> bytes:
            return bytes(
                ((d * a + (x // 8) * b + (y // 8) * c) % 128) * 2
                for y in range(h)
                for x in range(w)
            )

        return encode_jpeg_progressive_color(
            w, h, plane(37, 23, 41), plane(29, 19, 31), plane(43, 17, 37)
        )

    # r13: fused synth→decode→stats — one MapInPandas, blob stays in the
    # worker (guide §4.1/§8); same encoder/decoder path as before.
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")
