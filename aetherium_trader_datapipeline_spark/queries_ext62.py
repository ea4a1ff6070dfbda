"""Wave 62 (x281–x282): ORACLE-VERIFIED multimodal pixel/sample decode.

Closes the last multimodal gap (r2/r3 verdicts: "pixel/waveform content
paths unexercised"): x281 builds real PNG files (filter types cycled per
row so every spec predictor is exercised), raster-decodes them with the
repo's pure-Python decoder, and emits integer pixel statistics; x282 does
the same through RIFF/WAVE PCM. The pixels/samples are closed-form
functions of doc_id, so DuckDB verifies the ENTIRE encode→decode→reduce
path arithmetically without ever touching a byte stream — a wrong filter
predictor, chunk walk, or sample layout fails the value hash.

Scale posture: blob synthesis and decode run inside one mapInPandas pass
(Arrow batches, bounded memory); only the fixed-width stat columns leave
the worker. doc_id <= 200 keeps the pure-Python per-pixel loops bounded at
test SFs (the decode plumbing, not Python throughput, is what scales).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# pixel(d, x, y, c) = (d*31 + x*7 + y*13 + c*17) % 256 ; w = 4 + d%5 ; h = 3 + d%4
_X281_ORACLE = """
    WITH d AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id <= 200
    ),
    px AS (
      SELECT doc_id, w, h,
             list_transform(range(0, w * h * 3),
               i -> (doc_id * 31 + ((i // 3) % w) * 7 + (i // (3 * w)) * 13
                     + (i % 3) * 17) % 256) AS v
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
    "x281_png_pixel_stats",
    headline=True,
    oracle=_X281_ORACLE,
    tags=("multimodal", "decode"),
)
def x281_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG raster decode, hash-verified: synthesize closed-form RGB
    pixels per doc, encode them into genuine PNGs with CYCLED filter types
    (None/Sub/Up/Average/Paeth — decode must invert all five), decode with
    operators.multimodal.decode_png_pixels, reduce to integer stats."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_png,
        image_pixel_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        w, h = 4 + d % 5, 3 + d % 4
        px = bytes(
            (d * 31 + x * 7 + y * 13 + c * 17) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        return encode_png(w, h, pixels=px, cycle_filters=True)

    # r13: fused synth→decode→stats — one MapInPandas instead of two, the
    # PNG bytes never cross the JVM boundary (guide §4.1/§8).
    return image_pixel_stats_synth(ids, make_blob).orderBy("doc_id")


# sample(d, j) = ((d*7 + j*11) % 65536) - 32768 over interleaved index j;
# n = 50 + d%20 frames, 2 channels, 8 kHz
_X282_ORACLE = """
    WITH d AS (
      SELECT doc_id, 50 + doc_id % 20 AS n
      FROM documents WHERE doc_id <= 200
    ),
    sm AS (
      SELECT doc_id, n,
             list_transform(range(0, n * 2),
               j -> (doc_id * 7 + j * 11) % 65536 - 32768) AS s
      FROM d
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(2 AS INTEGER) AS n_channels,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_sum(s) AS BIGINT) AS s_sum,
           CAST(list_min(s) AS INTEGER) AS s_min,
           CAST(list_max(s) AS INTEGER) AS s_max
    FROM sm ORDER BY doc_id
"""


@register(
    "x282_wav_waveform_stats",
    headline=True,
    oracle=_X282_ORACLE,
    tags=("multimodal", "decode"),
)
def x282_wav_waveform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PCM sample decode, hash-verified: closed-form int16 stereo
    samples → genuine RIFF/WAVE bytes (fmt + LIST + data chunk walk) →
    operators.multimodal.decode_wav_samples → integer stats."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        audio_waveform_stats_synth,
        encode_wav,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        n = 50 + d % 20
        samples = [(d * 7 + j * 11) % 65536 - 32768 for j in range(n * 2)]
        return encode_wav(8000, 2, n, samples=samples)

    # r13: fused synth→decode→stats — one MapInPandas instead of two, the
    # RIFF bytes never cross the JVM boundary (guide §4.1/§8).
    return audio_waveform_stats_synth(ids, make_blob).orderBy("doc_id")
