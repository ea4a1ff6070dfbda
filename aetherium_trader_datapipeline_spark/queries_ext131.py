"""Wave 131 (x465–x467): classifier audit, watermark sizing, backfill ETA.

x465 — language-ID confusion matrix: the x42 heuristic classifier
(operators/textops.language_id) evaluated against the corpus's lang
labels over ALL documents — per (true, predicted) cell counts plus
per-cell recall share.  x42 proved Spark==oracle on a 200-doc slice;
this aggregates the full corpus, so any divergence in the tail fails
the hash.

x466 — watermark/allowed-lateness sizing: for delays {60, 300, 900,
3600} s, the share of events a Structured Streaming watermark would
drop.  Arrival order is proxied by event_id batches of 1000; the
running high-water mark runs over the BOUNDED batch frame (a global
per-event running max would be a single-partition sort of the whole
stream — the x458 lesson), and each event compares against the
PREVIOUS batch's high-water mark, the same one-batch-stale semantics
Spark's watermark actually has.

x467 — backfill ETA plan: the reference's own operational loop costed
end-to-end — per symbol, missing days from the 30-day spine (G1 gap
detection), expected rows from the symbol's observed rows/day, and two
lower bounds: the rate-limiter floor (one day-fetch per 15 s —
`limiter.rs`'s 1-per-15 s window, the R1 budget) and the throughput
floor at 5000 rows/s; the binding constraint is reported.  Extends P1
(backfill planner, x52) from WHAT to fetch to HOW LONG it takes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

_EN = "'the','a','of','and','to','in','is','it'"
_DE = "'der','die','das','und','ist','nicht','ein','zu'"
_FR = "'le','la','les','et','est','un','une','dans'"
_ES = "'el','los','las','es','un','una','en','que'"

_X465_ORACLE = f"""
    WITH scored AS (
      SELECT lang,
             len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains([{_EN}], w))) AS s_en,
             len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains([{_DE}], w))) AS s_de,
             len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains([{_FR}], w))) AS s_fr,
             len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains([{_ES}], w))) AS s_es,
             regexp_matches(text, '[一-鿿]') AS zh
      FROM documents
    ),
    pred AS (
      SELECT lang,
             CASE WHEN zh THEN 'zh'
                  WHEN s_de > greatest(s_en, s_es, s_fr) THEN 'de'
                  WHEN s_es > greatest(s_en, s_fr) THEN 'es'
                  WHEN s_fr > s_en THEN 'fr'
                  ELSE 'en' END AS pred_lang
      FROM scored
    ),
    cells AS (
      SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY lang, pred_lang
    )
    SELECT lang AS true_lang, pred_lang, n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY lang), 6) AS recall_share
    FROM cells ORDER BY true_lang, pred_lang
"""


@register("x465_langid_confusion", oracle=_X465_ORACLE, tags=("text", "eval"))
def x465_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the x42 language-ID heuristic vs lang labels
    over the full corpus (operators/textops.language_id)."""
    from pyspark.sql.window import Window

    from aetherium_trader_datapipeline_spark.operators.textops import language_id

    docs = load_tables(spark, sf_dir)["documents"]
    cells = (
        language_id(docs)
        .groupBy(F.col("lang").alias("true_lang"), "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("true_lang")
    return (
        cells.withColumn(
            "recall_share",
            F.round(F.col("n").cast("double") / F.sum("n").over(w), 6),
        )
        .orderBy("true_lang", "pred_lang")
    )


# -- x466: watermark sizing ------------------------------------------------------------

_X466 = """
    WITH arr AS (
      SELECT event_id {intdiv} 1000 AS batch, {epoch} AS et FROM events
    ),
    batches AS (
      SELECT batch, CAST(MAX(et) AS BIGINT) AS bmax,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM arr GROUP BY batch
    ),
    -- TWO-LEVEL prefix max (r11): the flat batch grid is |events|/1000
    -- rows — linear through one task.  Level 1 runs PARTITIONED by a
    -- super-batch of 8192 batches; level 2's global band sees only the
    -- |events|/1000/8192 super-batch grid.  hwm_prev = max(prefix max
    -- inside my super-batch, max over all earlier super-batches), with
    -- NULL cases spelled out (GREATEST's NULL handling differs between
    -- engines).
    b2 AS (SELECT batch, batch {intdiv} 8192 AS ck2, bmax, cnt FROM batches),
    in_max AS (
      SELECT batch, ck2, cnt,
             MAX(bmax) OVER (PARTITION BY ck2 ORDER BY batch
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS in_prev
      FROM b2
    ),
    k2p AS (
      SELECT ck2,
             MAX(m) OVER (ORDER BY ck2
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS k_prev
      FROM (SELECT ck2, MAX(bmax) AS m FROM b2 GROUP BY ck2)
    ),
    hwm AS (
      SELECT i.batch, i.cnt,
             CASE WHEN i.in_prev IS NULL THEN p.k_prev
                  WHEN p.k_prev IS NULL THEN i.in_prev
                  WHEN i.in_prev >= p.k_prev THEN i.in_prev
                  ELSE p.k_prev END AS hwm_prev
      FROM in_max i JOIN k2p p ON i.ck2 = p.ck2
    ),
    delays AS (
      SELECT 60 AS w UNION ALL SELECT 300 UNION ALL SELECT 900
      UNION ALL SELECT 3600
    ),
    judged AS (
      SELECT d.w,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN h.hwm_prev IS NOT NULL
                            AND a.et < h.hwm_prev - d.w
                           THEN 1 ELSE 0 END) AS BIGINT) AS dropped
      FROM arr a
      JOIN hwm h ON a.batch = h.batch
      CROSS JOIN delays d
      GROUP BY d.w
    )
    SELECT CAST(w AS BIGINT) AS watermark_delay_s, n AS n_events, dropped,
           ROUND(CAST(dropped AS DOUBLE) / n, 6) AS dropped_share
    FROM judged ORDER BY watermark_delay_s
"""

register_sql(
    "x466_watermark_plan",
    spark_sql=_X466.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X466.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("streaming", "planning"),
)

# -- x467: backfill ETA ------------------------------------------------------------------

_X467 = """
    WITH per_day AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 86400 AS dkey,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id % 10, {epoch} {intdiv} 86400
    ),
    span AS (
      SELECT MIN(dkey) AS d0, MAX(dkey) AS d1 FROM per_day
    ),
    per_sym AS (
      SELECT sym,
             CAST(COUNT(*) AS BIGINT) AS present_days,
             CAST(SUM(cnt) AS BIGINT) AS total_rows
      FROM per_day GROUP BY sym
    )
    SELECT CAST(p.sym AS BIGINT) AS sym,
           CAST(s.d1 - s.d0 + 1 AS BIGINT) AS span_days,
           p.present_days,
           CAST(s.d1 - s.d0 + 1 - p.present_days AS BIGINT) AS missing_days,
           CAST((s.d1 - s.d0 + 1 - p.present_days) * p.total_rows
                {intdiv} p.present_days AS BIGINT) AS est_rows_to_fetch,
           CAST((s.d1 - s.d0 + 1 - p.present_days) * 15 AS BIGINT)
             AS eta_rate_limited_s,
           ROUND(CAST((s.d1 - s.d0 + 1 - p.present_days) * p.total_rows
                      {intdiv} p.present_days AS DOUBLE) / 5000, 2)
             AS eta_throughput_s,
           CASE WHEN (s.d1 - s.d0 + 1 - p.present_days) * 15
                     >= CAST((s.d1 - s.d0 + 1 - p.present_days)
                             * p.total_rows {intdiv} p.present_days
                             AS DOUBLE) / 5000
                THEN 'rate_limiter' ELSE 'throughput' END AS binding_floor
    FROM per_sym p CROSS JOIN span s ORDER BY sym
"""

register_sql(
    "x467_backfill_eta",
    spark_sql=_X467.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X467.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("backfill", "planning"),
)
