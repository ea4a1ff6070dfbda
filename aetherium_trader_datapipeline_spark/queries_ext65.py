"""Wave 65 (x289–x290): ORACLE-VERIFIED entropy-coded raster decode.

Closes the r4 verdict's last stubbed decode tier ("JPEG/GIF entropy-coded
raster still gated on PIL"): x289 builds real baseline JFIF files with the
repo's own DCT/Huffman encoder, entropy-decodes them with
``decode_jpeg_pixels`` (canonical Huffman tables rebuilt from each file's
DHT, dequantize, IDCT), and emits integer pixel statistics; x290 does the
same through GIF's variable-width LZW (lossless, so the oracle is simply
the closed-form index image).

Exactness design: JPEG is lossy in general, but a block-constant image
survives the full pipeline bit-exact — a constant 8x8 block has only a DC
coefficient (8*(v-128) under the orthonormal FDCT), and with the flat
quantization step 16 and EVEN pixel values that DC quantizes without
remainder, so dequant + IDCT reproduces v exactly (AC terms are ~1e-13
float noise that rounds away). The fixture therefore makes each 8x8 tile
constant with value ((d*37 + bx*23 + by*41) % 128) * 2, and DuckDB
verifies the ENTIRE encode→Huffman→decode→reduce path arithmetically.
Edge replication keeps partial edge tiles constant too, so non-multiple-
of-8 dimensions round-trip exactly as well. Lossy-content behavior is
tolerance-tested in tests/test_multimodal.py, not here.

Scale posture: same as x281 — synthesis + decode inside one mapInPandas
pass, only fixed-width stats leave the worker; doc_id <= 200 bounds the
pure-Python per-block loops at test SFs (the Arrow plumbing is what
scales, and a production swap-in point would be a vectorized or JVM
decoder behind the same mapInPandas schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# w = 8*(1 + d%3) + d%5 ; h = 8*(1 + d%2) + d%3 (non-multiples of 8 included)
# pixel(d, x, y) = ((d*37 + (x//8)*23 + (y//8)*41) % 128) * 2
_X289_ORACLE = """
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
    "x289_jpeg_pixel_stats",
    headline=True,
    oracle=_X289_ORACLE,
    tags=("multimodal", "decode"),
)
def x289_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline-JPEG entropy decode, hash-verified: synthesize
    block-constant grayscale tiles per doc, run them through the full
    FDCT/quantize/Huffman encoder into genuine JFIF bytes, decode with
    operators.multimodal.decode_jpeg_pixels, reduce to integer stats."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg_baseline,
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
        return encode_jpeg_baseline(w, h, px)

    # r13: fused synth→decode→stats — one MapInPandas instead of two, the
    # JFIF bytes never cross the JVM boundary (guide §4.1/§8).
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")


# -- x290: GIF LZW raster decode ---------------------------------------------
# LZW is lossless, so no exactness trickery is needed: the oracle is just
# the closed-form index image. The identity grayscale palette makes each
# decoded RGB triple (v, v, v), so px_sum = 3 * sum(v) and min/max equal
# the index min/max. Index function reuses x281's pixel formula over a
# single channel; dims avoid multiples of anything so sub-block and
# code-width boundaries vary per doc.

_X290_ORACLE = """
    WITH d AS (
      SELECT doc_id, 5 + doc_id % 9 AS w, 4 + doc_id % 7 AS h
      FROM documents WHERE doc_id <= 200
    ),
    px AS (
      SELECT doc_id, w, h,
             list_transform(range(0, w * h),
               i -> (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256) AS v
      FROM d
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(3 * list_sum(v) AS BIGINT) AS px_sum,
           CAST(list_min(v) AS INTEGER) AS px_min,
           CAST(list_max(v) AS INTEGER) AS px_max
    FROM px ORDER BY doc_id
"""


@register(
    "x290_gif_pixel_stats",
    headline=True,
    oracle=_X290_ORACLE,
    tags=("multimodal", "decode"),
)
def x290_gif_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real GIF LZW decode, hash-verified: synthesize closed-form palette
    indices per doc, LZW-encode them into genuine GIF89a bytes
    (operators.multimodal.encode_gif), decode with decode_gif_pixels
    through the identity grayscale palette, reduce to integer stats."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_gif,
        image_pixel_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        w, h = 5 + d % 9, 4 + d % 7
        idx = bytes(
            (d * 31 + x * 7 + y * 13) % 256 for y in range(h) for x in range(w)
        )
        return encode_gif(w, h, idx)

    # r13: fused synth→decode→stats — one MapInPandas instead of two, the
    # GIF bytes never cross the JVM boundary (guide §4.1/§8).
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")
