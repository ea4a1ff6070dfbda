"""Twenty-second extension wave — audio multimodal decode + the Python
UDTF surface. Both DuckDB hash-verified.

- x173 audio metadata: synthesize genuine RIFF/WAVE containers per doc
  (operators/multimodal.py:encode_wav — fmt + LIST/INFO + data chunks,
  so the parser must walk chunks), decode them with the pure-Python
  chunk walker inside Arrow-batched mapInPandas, and verify the decoded
  (rate, channels, bits, samples, duration) against the generation
  parameters replayed in SQL. Completes the multimodal story: image
  (x142) and audio both run REAL bytes end-to-end in this container;
  raster/waveform decode stays gated on media libraries.
- x174 Python UDTF (Spark 4 ``@udtf`` + LATERAL): the last missing UDF
  tier after row-udf (x40), Arrow udf (x155), pandas_udf (x41/x56),
  applyInPandas (x77/x138), mapInPandas (x142/x173). The UDTF emits
  sliding token windows per document; the oracle replays the exact
  window-start walk arithmetically, so the whole Python table function
  hash-verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x173: real audio (WAV) header decode -----------------------------------

_X173_ORACLE = """
    SELECT doc_id,
           CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS INT) AS sample_rate,
           CAST(doc_id % 2 + 1 AS INT) AS n_channels,
           CAST(16 AS INT) AS bits,
           CAST(n_chars % 400 + 10 AS INT) AS n_samples,
           CAST(((n_chars % 400 + 10) * 1000)
                // (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    ELSE 44100 END) AS BIGINT) AS duration_ms
    FROM documents ORDER BY doc_id LIMIT 200
"""


@register("x173_audio_meta", oracle=_X173_ORACLE, tags=("multimodal", "udf"))
def x173_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_wav,
        extract_audio_meta,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].selectExpr(
        "doc_id",
        "CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 "
        "ELSE 44100 END AS INT) AS rate",
        "CAST(doc_id % 2 + 1 AS INT) AS chans",
        "CAST(n_chars % 400 + 10 AS INT) AS ns",
    )

    def synth(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["blob"] = [
                encode_wav(int(r), int(c), int(n))
                for r, c, n in zip(pdf["rate"], pdf["chans"], pdf["ns"])
            ]
            yield pdf[["doc_id", "blob"]]

    blobs = docs.mapInPandas(synth, schema="doc_id BIGINT, blob BINARY")
    meta = extract_audio_meta(blobs, "blob")
    return (
        meta.select(
            "doc_id", "sample_rate", "n_channels", "bits", "n_samples", "duration_ms"
        )
        .orderBy("doc_id")
        .limit(200)
    )


# -- x174: Python UDTF (table function) over documents ----------------------
#
# Window-start walk: emit start 0, then advance by stride while
# start + win < n — i.e. starts k·stride for k = 0..K with
# K = max(0, ceil((n − win) / stride)). The oracle computes K the same
# way with integer arithmetic, so the UDTF's Python loop is pinned.

_WIN, _STRIDE = 16, 8

_X174_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n
      FROM documents),
    k AS (
      SELECT doc_id, ws, n,
             greatest(0, (n - {_WIN} + {_STRIDE} - 1) // {_STRIDE}) AS kmax
      FROM d),
    w AS (
      SELECT doc_id, ws, n, CAST(t.k AS INT) AS win_idx,
             CAST(t.k * {_STRIDE} AS INT) AS start_tok
      FROM k, LATERAL unnest(generate_series(0, kmax)) AS t(k))
    SELECT doc_id, win_idx, start_tok,
           CAST(least({_WIN}, n - start_tok) AS INT) AS n_toks,
           ws[start_tok + 1] AS first_word,
           ws[least(start_tok + {_WIN}, n)] AS last_word
    FROM w ORDER BY doc_id, win_idx LIMIT 500
"""


@register("x174_python_udtf", oracle=_X174_ORACLE, tags=("udf", "udtf", "text"))
def x174_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="win_idx: int, start_tok: int, n_toks: int, "
        "first_word: string, last_word: string"
    )
    class TokenWindows:
        def eval(self, text: str, win: int, stride: int):
            toks = text.split(" ")
            i = w = 0
            while i < len(toks):
                chunk = toks[i : i + win]
                yield w, i, len(chunk), chunk[0], chunk[-1]
                if i + win >= len(toks):
                    break
                i += stride
                w += 1

    spark.udtf.register("token_windows", TokenWindows)
    load_tables(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.win_idx, t.start_tok, t.n_toks,
               t.first_word, t.last_word
        FROM documents d, LATERAL token_windows(d.text, {_WIN}, {_STRIDE}) t
        ORDER BY doc_id, win_idx LIMIT 500
        """
    )
