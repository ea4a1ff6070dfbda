"""Wave 124 (x445–x446): ORACLE-VERIFIED indexed & interlaced PNG decode.

Closes the PNG tier completely (r6): after x281 proved color types
0/2/6, these two run the remaining real-world layouts end-to-end —
color type 3 (PLTE-mapped indices) and Adam7 interlacing (seven
independently-filtered passes scattered to the spec grid).  As with
x281, the pixels are closed-form functions of doc_id, so DuckDB
verifies the encode→decode→reduce path arithmetically: a wrong palette
lookup, pass offset, or per-pass filter prior fails the value hash.

Scale posture: identical to x281 — blob synthesis + decode inside one
Arrow-batched mapInPandas pass, doc_id <= 200 bounds the pure-Python
pixel loops, only fixed-width stats leave the worker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# palette[i] = ((i*3)%256, (i*5+7)%256, (i*7+13)%256)
# idx(d, x, y) = (d*11 + x*3 + y*5) % 256 ; w = 4 + d%5 ; h = 3 + d%4
_X445_ORACLE = """
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id <= 200
    ),
    px AS (
      SELECT doc_id, w, h,
             list_transform(range(0, w * h * 3), j ->
               CASE j % 3
                 WHEN 0 THEN (((doc_id * 11 + ((j // 3) % w) * 3
                               + (j // (3 * w)) * 5) % 256) * 3) % 256
                 WHEN 1 THEN (((doc_id * 11 + ((j // 3) % w) * 3
                               + (j // (3 * w)) * 5) % 256) * 5 + 7) % 256
                 ELSE (((doc_id * 11 + ((j // 3) % w) * 3
                        + (j // (3 * w)) * 5) % 256) * 7 + 13) % 256
               END) AS v
      FROM d
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(v) AS BIGINT) AS px_sum,
           CAST(list_min(v) AS INTEGER) AS px_min,
           CAST(list_max(v) AS INTEGER) AS px_max
    FROM px ORDER BY doc_id
"""


@register(
    "x445_png_palette_stats",
    oracle=_X445_ORACLE,
    tags=("multimodal", "decode"),
)
def x445_png_palette_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indexed-PNG decode, hash-verified: synthesize closed-form palette
    indices per doc, encode them as genuine color-type-3 PNGs (PLTE +
    cycled filters over the 1-byte index scanlines), decode with
    operators.multimodal.decode_png_pixels (palette-mapped to RGB),
    reduce to integer stats."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_png_palette,
        image_pixel_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)
    palette = [((i * 3) % 256, (i * 5 + 7) % 256, (i * 7 + 13) % 256)
               for i in range(256)]

    def make_blob(d: int) -> bytes:
        w, h = 4 + d % 5, 3 + d % 4
        idx = [(d * 11 + x * 3 + y * 5) % 256 for y in range(h) for x in range(w)]
        return encode_png_palette(w, h, idx, palette)

    # r13: fused synth→decode→stats — one MapInPandas, blob stays in the
    # worker (guide §4.1/§8); same encoder/decoder path as before.
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")


# pixel(d, x, y, c) = (d*29 + x*5 + y*11 + c*19) % 256 ; w = 5 + d%6 ; h = 4 + d%5
_X446_ORACLE = """
    WITH d AS (
      SELECT doc_id, 5 + doc_id % 6 AS w, 4 + doc_id % 5 AS h
      FROM documents WHERE doc_id <= 200
    ),
    px AS (
      SELECT doc_id, w, h,
             list_transform(range(0, w * h * 3),
               j -> (doc_id * 29 + ((j // 3) % w) * 5 + (j // (3 * w)) * 11
                     + (j % 3) * 19) % 256) AS v
      FROM d
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(v) AS BIGINT) AS px_sum,
           CAST(list_min(v) AS INTEGER) AS px_min,
           CAST(list_max(v) AS INTEGER) AS px_max
    FROM px ORDER BY doc_id
"""


@register(
    "x446_png_interlaced_stats",
    oracle=_X446_ORACLE,
    tags=("multimodal", "decode"),
)
def x446_png_interlaced_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adam7-interlaced PNG decode, hash-verified: closed-form RGB
    pixels per doc, encoded into genuine interlace-1 PNGs (seven passes,
    filters cycled within each pass), de-interlaced by
    operators.multimodal.decode_png_pixels, reduced to integer stats.
    Widths 5–10 × heights 4–8 exercise pass shapes where several Adam7
    passes are empty."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_png_interlaced,
        image_pixel_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        w, h = 5 + d % 6, 4 + d % 5
        px = bytes(
            (d * 29 + x * 5 + y * 11 + c * 19) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        return encode_png_interlaced(w, h, px)

    # r13: fused synth→decode→stats — one MapInPandas, blob stays in the
    # worker (guide §4.1/§8); same encoder/decoder path as before.
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")
