"""Wave 109 (x406): 4:2:0 chroma-subsampled JPEG decode, oracle-verified.

Closes the "chroma subsampling" half of the decode residual: x406
round-trips real 4:2:0 baseline JFIF — the four-Y-blocks + Cb + Cr MCU
layout virtually every camera JPEG uses — through the repo's own
subsampling encoder (`encode_jpeg_420`: 2×2 box-mean chroma
downsample) and the generalized MCU decoder (per-component sampling
factors, replication upsample).  The remaining PIL gates are
successive approximation, progressive color, and 4:2:2/exotic
sampling factor sets.

Exactness: the fixture makes Y constant per 8×8 BLOCK but chroma
constant per 16×16 MCU tile — so the box-mean downsample is exact
(mean of a constant), each 8×8 survives the DCT pipeline bit-exactly
(even values, flat-16 quant), and the replication upsample restores
the full-res chroma exactly; the only remaining arithmetic is the
BT.601 conversion, reproduced identically in the DuckDB oracle
(floor(x+0.5) float64 — same doubles, same order).  Y varying at a
FINER granularity than chroma is what actually exercises the sampling
machinery: a decoder that mixed up the MCU block order or the
upsample alignment would scramble Y/chroma alignment and fail the
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# w = 16*(1 + d%2) + d%7 ; h = 16 + d%5  (non-multiples of 16 included)
# y (d,bx8,by8)   = ((d*37 + bx8*23 + by8*41) % 128) * 2    [8x8 tiles]
# cb(d,bx16,by16) = ((d*29 + bx16*19 + by16*31) % 128) * 2  [16x16 tiles]
# cr(d,bx16,by16) = ((d*43 + bx16*17 + by16*37) % 128) * 2
_X406_ORACLE = """
    WITH d AS (
      SELECT doc_id,
             16 * (1 + doc_id % 2) + doc_id % 7 AS w,
             16 + doc_id % 5 AS h
      FROM documents WHERE doc_id <= 200
    ),
    px AS (
      SELECT doc_id, w, h, i,
             CAST(((doc_id * 37 + ((i % w) // 8) * 23
                    + ((i // w) // 8) * 41) % 128) * 2 AS DOUBLE) AS yv,
             CAST(((doc_id * 29 + ((i % w) // 16) * 19
                    + ((i // w) // 16) * 31) % 128) * 2 AS DOUBLE) AS cbv,
             CAST(((doc_id * 43 + ((i % w) // 16) * 17
                    + ((i // w) // 16) * 37) % 128) * 2 AS DOUBLE) AS crv
      FROM d, UNNEST(range(0, w * h)) AS t(i)
    ),
    rgb AS (
      SELECT doc_id, w, h,
             GREATEST(0, LEAST(255, FLOOR(yv + 1.402 * (crv - 128) + 0.5))) AS r,
             GREATEST(0, LEAST(255, FLOOR(yv - 0.344136 * (cbv - 128)
                                          - 0.714136 * (crv - 128) + 0.5))) AS g,
             GREATEST(0, LEAST(255, FLOOR(yv + 1.772 * (cbv - 128) + 0.5))) AS b
      FROM px
    )
    SELECT doc_id,
           CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(SUM(r + g + b) AS BIGINT) AS px_sum,
           CAST(MIN(LEAST(r, g, b)) AS INTEGER) AS px_min,
           CAST(MAX(GREATEST(r, g, b)) AS INTEGER) AS px_max
    FROM rgb GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "x406_jpeg_420_pixel_stats",
    oracle=_X406_ORACLE,
    tags=("multimodal", "decode"),
)
def x406_jpeg_420_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real 4:2:0 baseline-JPEG decode, hash-verified end to end: Y
    varies per 8x8 block, chroma per 16x16 MCU; encode with
    operators.multimodal.encode_jpeg_420, decode with the generalized
    sampling-factor MCU path, reduce to integer stats DuckDB re-derives
    arithmetically."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg_420,
        image_pixel_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        w = 16 * (1 + d % 2) + d % 7
        h = 16 + d % 5

        def plane(a: int, b: int, c: int, tile: int) -> bytes:
            return bytes(
                ((d * a + (x // tile) * b + (y // tile) * c) % 128) * 2
                for y in range(h)
                for x in range(w)
            )

        return encode_jpeg_420(
            w, h,
            plane(37, 23, 41, 8),
            plane(29, 19, 31, 16),
            plane(43, 17, 37, 16),
        )

    # r13: fused synth→decode→stats — one MapInPandas, blob stays in the
    # worker (guide §4.1/§8); same encoder/decoder path as before.
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")
