"""Wave 103 (x390–x392): model-evaluation metrics — calibration,
information value, perceptual difference hash.

x390 — reliability diagram + Expected Calibration Error: the quality
models the curation tier trains (x158) are used as FILTER thresholds,
so their calibration matters more than their AUC.  Predictions/labels
are closed-form deterministic functions of doc_id (the driver compares
engines, not models); confidences are exact 1e-3 rationals, so per-bin
confidence sums ride 1e3-scaled BIGINTs and the only IEEE arithmetic
is the final per-bin division — ECE = Σ n_b·|acc_b − conf_b| / N is
attached per-row via a window sum over the 10 bins (exact integer
numerators).

x391 — Weight-of-Evidence / Information Value of a binned feature
against a binary outcome (the credit-scoring feature screen): 8 width
buckets over o_totalprice vs the order-status outcome.  Counts are
exact; WOE_b = ln((good_b/G)/(bad_b/B)) is per-row IEEE on exact
ratios (identical doubles both engines); the IV accumulates
1e12-quantized per-bin terms so the 8-term float sum cannot reorder
(x321 discipline).

x392 — image difference-hash (dHash): the perceptual near-dup signature
complementing x207's aHash — aHash thresholds on the mean (flat-field
sensitive), dHash on horizontal gradients (illumination-invariant).
Synthesizes closed-form 9×8 grayscale PNGs, decodes with the repo PNG
decoder, emits bit i = (p[y,x] > p[y,x+1]) packed into two 32-bit
halves (BIGINT-safe — no 2^63 sign-bit hazard).  The oracle re-derives
the bits arithmetically from the pixel formula; the PNG decode path is
already pixel-exact (x281).

Scale: x390/x391 are scan + tiny-key groupBys; x392 is the standard
Arrow-batched mapInPandas decode with doc_id <= 200 bounding the
pure-Python loops at test SFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x390: reliability bins + ECE ----------------------------------------------
# conf(d) = ((d*37 + 13) % 1000 + 0.5) / 1000  — exact 1e-3 grid, never
# exactly on a bin edge; label(d) = 1 iff (d*61 + 7) % 1000 < (d*37+13)%1000
# (so accuracy loosely tracks confidence and the diagram is non-trivial).

_X390 = """
    WITH scored AS (
      SELECT doc_id,
             (doc_id * 37 + 13) % 1000 AS conf_mill,
             CASE WHEN (doc_id * 61 + 7) % 1000 < (doc_id * 37 + 13) % 1000
                  THEN 1 ELSE 0 END AS label
      FROM documents
    ),
    binned AS (
      -- {intdiv}: explicit integer division — plain '/' on integers is
      -- float division in DuckDB, and CAST(double AS BIGINT) ROUNDS
      -- there while Spark truncates (bin 9.99 would become 10 vs 9)
      SELECT CAST(conf_mill {intdiv} 100 AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conf_mill) AS BIGINT) AS conf_sum_mill,
             CAST(SUM(label) AS BIGINT) AS n_correct
      FROM scored GROUP BY CAST(conf_mill {intdiv} 100 AS BIGINT)
    )
    SELECT bin, n,
           ROUND((CAST(conf_sum_mill AS DOUBLE) / n + 0.5) / 1000, 6)
             AS mean_conf,
           ROUND(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy,
           -- |acc - conf| in 2x-scaled integer space: conf(d) ends in
           -- .5 mills, so 2*Sum(conf) = 2*conf_sum_mill + n exactly —
           -- no parity caveat, both engines bit-identical
           ROUND(CAST(ABS(2000 * n_correct - 2 * conf_sum_mill - n)
                      AS DOUBLE) / (2000 * n), 6) AS gap,
           ROUND(CAST(SUM(ABS(2000 * n_correct - 2 * conf_sum_mill - n))
                      OVER () AS DOUBLE)
                 / (2000 * SUM(n) OVER ()), 6) AS ece
    FROM binned ORDER BY bin
"""

register_sql(
    "x390_calibration_ece",
    spark_sql=_X390.format(intdiv="DIV"),
    duckdb_sql=_X390.format(intdiv="//"),
    tags=("eval", "stats"),
)

# -- x391: WOE / Information Value ---------------------------------------------

_X391 = """
    WITH base AS (
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS good
      FROM orders
    ),
    per_bin AS (
      SELECT bin,
             CAST(SUM(good) AS BIGINT) AS n_good,
             CAST(SUM(1 - good) AS BIGINT) AS n_bad
      FROM base GROUP BY bin
    ),
    tot AS (
      SELECT bin, n_good, n_bad,
             SUM(n_good) OVER () AS g, SUM(n_bad) OVER () AS b
      FROM per_bin
    ),
    woe AS (
      SELECT bin, n_good, n_bad,
             LN((CAST(n_good AS DOUBLE) / g) / (CAST(n_bad AS DOUBLE) / b))
               AS woe,
             (CAST(n_good AS DOUBLE) / g - CAST(n_bad AS DOUBLE) / b)
               * LN((CAST(n_good AS DOUBLE) / g)
                    / (CAST(n_bad AS DOUBLE) / b)) AS iv_term
      FROM tot WHERE n_good > 0 AND n_bad > 0
    )
    SELECT bin, n_good, n_bad,
           ROUND(woe, 8) AS woe,
           ROUND(CAST(SUM(CAST(FLOOR(iv_term * 1e12) AS BIGINT)) OVER ()
                 AS DOUBLE) / 1e12, 8) AS information_value
    FROM woe ORDER BY bin
"""

register_sql(
    "x391_woe_iv",
    spark_sql=_X391,
    duckdb_sql=_X391,
    tags=("eval", "stats"),
)

# -- x392: image dHash ---------------------------------------------------------
# 9x8 grayscale, pixel(d, x, y) = (d*23 + x*31 + y*17) % 256; bit i
# (i = y*8 + x, x in 0..7) set iff p(y,x) > p(y,x+1).

_X392_ORACLE = """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id <= 200),
    bits AS (
      SELECT doc_id,
             list_transform(range(0, 64),
               i -> CASE WHEN (doc_id * 23 + (i % 8) * 31 + (i // 8) * 17) % 256
                          > (doc_id * 23 + ((i % 8) + 1) * 31 + (i // 8) * 17) % 256
                    THEN 1 ELSE 0 END) AS bit
      FROM d
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 32),
                 i -> bit[i + 1] * (1 << i))) AS BIGINT) AS dhash_lo,
           CAST(list_sum(list_transform(range(0, 32),
                 i -> bit[i + 33] * (1 << i))) AS BIGINT) AS dhash_hi
    FROM bits ORDER BY doc_id
"""


@register(
    "x392_image_dhash",
    oracle=_X392_ORACLE,
    tags=("multimodal", "dedup"),
)
def x392_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference hash over real PNG bytes: synthesize closed-form 9x8
    grayscale tiles, PNG-encode (all filter predictors), decode with
    operators.multimodal.decode_png_pixels, pack horizontal-gradient
    bits into (dhash_lo, dhash_hi)."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def hash_blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            lo_out, hi_out = [], []
            for d in pdf["doc_id"].tolist():
                d = int(d)
                w, h = 9, 8
                px = bytes(
                    c
                    for y in range(h)
                    for x in range(w)
                    for c in ((d * 23 + x * 31 + y * 17) % 256,) * 3
                )
                img = decode_png_pixels(
                    encode_png(w, h, pixels=px, cycle_filters=True)
                )
                arr = np.asarray(img, dtype=np.int64)[:, :, 0]
                bits = (arr[:, :-1] > arr[:, 1:]).astype(np.int64).flatten()
                lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
                hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
                lo_out.append(lo)
                hi_out.append(hi)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "dhash_lo": lo_out, "dhash_hi": hi_out}
            )

    return (
        ids.mapInPandas(hash_blobs, "doc_id bigint, dhash_lo bigint, dhash_hi bigint")
        .orderBy("doc_id")
    )
