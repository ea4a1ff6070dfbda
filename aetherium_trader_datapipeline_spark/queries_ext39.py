"""Thirty-ninth extension wave — model evaluation metrics (the scoring
side of the ML-prep transforms in ext37):

x221 auc          exact tie-corrected ROC-AUC as the integer Mann-Whitney
                  statistic: 2U = Σ_s pos(s)·(2·neg_below(s) + neg(s))
                  stays integral under ties; one final division
x222 calibration  decile reliability table — mean score vs observed
                  positive rate per ntile bucket, floored micro-units
x223 confusion    threshold confusion matrix + precision/recall/F1

"Model score" is the event value (cents), "label" is purchase — the
synthetic but deterministic stand-in; the metric mechanics are what is
verified. Scale shapes: x221 groups to the score support before its
window (like x197's ECDF); x222/x223 are one pass each.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x221: exact ROC-AUC (tie-corrected, integer core) ----------------------

_X221_BODY = """
    WITH s AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    byscore AS (
      SELECT score, CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM s GROUP BY score
    ),
    c AS (
      SELECT score, pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
      FROM byscore
    ),
    agg AS (
      SELECT CAST(SUM(pos * (2 * neg_below + neg)) AS BIGINT) AS u2,
             CAST(SUM(pos) AS BIGINT) AS np, CAST(SUM(neg) AS BIGINT) AS nn
      FROM c
    )
    SELECT np, nn, u2,
           CAST(FLOOR(1e6 * (CAST(u2 AS DOUBLE) / (2.0 * np * nn))) AS BIGINT) AS auc_micro
    FROM agg
"""

register_sql(
    "x221_auc",
    spark_sql=_X221_BODY,
    duckdb_sql=_X221_BODY,
    tags=("ml", "eval"),
)

# -- x222: calibration / reliability deciles --------------------------------

_X222_BODY = """
    WITH s AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    byscore AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY score
    ),
    grid AS (
      -- global-rank offsets over the distinct-score grid (sub-linear
      -- frame per the global-band policy); the r7 rewrite of the r6
      -- NTILE(10) OVER (ORDER BY score, event_id) — a single-partition
      -- sort of every event
      SELECT score,
             SUM(c) OVER (ORDER BY score) - c AS cum_before,
             SUM(c) OVER () AS n_tot
      FROM byscore
    ),
    b AS (
      -- global rank = offset of the score bucket + within-bucket rank;
      -- NTILE(10) reconstructed integer-exactly: the first N%10
      -- buckets hold N DIV 10 + 1 rows, the rest N DIV 10
      SELECT s.y, s.score,
             CAST(CASE
               WHEN g.n_tot {intdiv} 10 = 0 THEN
                 g.cum_before
                 + ROW_NUMBER() OVER (PARTITION BY s.score
                                      ORDER BY s.event_id)
               WHEN g.cum_before
                    + ROW_NUMBER() OVER (PARTITION BY s.score
                                         ORDER BY s.event_id)
                    <= (g.n_tot % 10) * (g.n_tot {intdiv} 10 + 1) THEN
                 (g.cum_before
                  + ROW_NUMBER() OVER (PARTITION BY s.score
                                       ORDER BY s.event_id)
                  + g.n_tot {intdiv} 10)
                 {intdiv} (g.n_tot {intdiv} 10 + 1)
               ELSE
                 g.n_tot % 10
                 + (g.cum_before
                    + ROW_NUMBER() OVER (PARTITION BY s.score
                                         ORDER BY s.event_id)
                    - (g.n_tot % 10) * (g.n_tot {intdiv} 10 + 1)
                    + g.n_tot {intdiv} 10 - 1)
                   {intdiv} (g.n_tot {intdiv} 10)
             END AS BIGINT) AS decile
      FROM s JOIN grid g ON s.score = g.score
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(score) AS BIGINT) AS score_sum_cents,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(FLOOR(1e6 * (CAST(SUM(y) AS DOUBLE) / COUNT(*))) AS BIGINT) AS pos_rate_micro
    FROM b GROUP BY decile ORDER BY decile
"""

register_sql(
    "x222_calibration",
    spark_sql=_X222_BODY.format(intdiv="DIV"),
    duckdb_sql=_X222_BODY.format(intdiv="//"),
    tags=("ml", "eval", "window"),
)

# -- x223: threshold confusion matrix ---------------------------------------

_X223_BODY = """
    WITH s AS (
      SELECT CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS yhat,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    m AS (
      SELECT CAST(SUM(y * yhat) AS BIGINT) AS tp,
             CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
             CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
             CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn
      FROM s
    )
    SELECT tp, fp, fn, tn,
           CAST(FLOOR(1e6 * (CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0))) AS BIGINT) AS precision_micro,
           CAST(FLOOR(1e6 * (CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0))) AS BIGINT) AS recall_micro,
           CAST(FLOOR(1e6 * ((2.0 * tp) / NULLIF(2.0 * tp + fp + fn, 0.0))) AS BIGINT) AS f1_micro
    FROM m
"""

register_sql(
    "x223_confusion",
    spark_sql=_X223_BODY,
    duckdb_sql=_X223_BODY,
    tags=("ml", "eval"),
)
