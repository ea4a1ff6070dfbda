"""Wave 108 (x405): PROGRESSIVE-JPEG raster decode, oracle-verified.

Closes the "progressive JPEG" half of the r5 decode residual: x405
round-trips real SOF2 spectral-selection files — a DC scan plus two AC
band scans with end-of-band RUN coding, the entropy layout that
distinguishes progressive from baseline — through the repo's own
encoder (`encode_jpeg_progressive`) and multi-scan decoder
(`_decode_jpeg_progressive` via `decode_jpeg_pixels`).  The remaining
PIL gates are successive approximation (Ah/Al ≠ 0), progressive color,
and 4:2:0/4:2:2 chroma subsampling.

Exactness: identical to x289's argument — the quantized COEFFICIENTS
of an image are the same in baseline and progressive layouts (only the
entropy arrangement differs), so block-constant even-valued tiles
survive bit-exactly; additionally tests/test_multimodal.py proves
progressive-decode ≡ baseline-decode on random lossy content (same
coefficients ⇒ same pixels, regardless of scan structure).

Scale posture: same as x289 — Arrow-batched mapInPandas, metadata
prune first, doc_id <= 200 bounding the pure-Python scan loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# same dims/pixel function as x289 — the layout (progressive vs
# baseline) is the variable under test, so the fixture is held fixed
_X405_ORACLE = """
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
    "x405_jpeg_progressive_stats",
    oracle=_X405_ORACLE,
    tags=("multimodal", "decode"),
)
def x405_jpeg_progressive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real progressive-JPEG (SOF2 spectral-selection) decode,
    hash-verified: synthesize block-constant grayscale tiles, encode as
    multi-scan progressive files, decode through the multi-scan
    coefficient-accumulation path, reduce to integer stats."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg_progressive,
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
        return encode_jpeg_progressive(w, h, px)

    # r13: fused synth→decode→stats — one MapInPandas, blob stays in the
    # worker (guide §4.1/§8); same encoder/decoder path as before.
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")
