"""Wave 134 (x474–x476): paired classifier tests, forecast combination,
and queueing-law validation.

x474 — McNemar's paired test: the x42 language-ID heuristic against the
majority-class baseline (predict 'en' always), on the SAME documents —
the b/c discordant-pair counts are exact integers and the continuity-
corrected statistic (|b−c|−1)²/(b+c) is one IEEE expression.  The
right test for "is classifier A better than B on the same data" —
unpaired tests (x268/x358) overstate the variance.

x475 — inverse-MSE forecast combination: per symbol, the last-value
(random-walk) and trailing-mean forecasters are scored on per-minute
returns; the optimal convex combination weight w* = MSE_b/(MSE_a+MSE_b)
and the combined MSE are reported against both singles — the
Bates–Granger result that combinations beat components.  Squared
errors are exact integer products of 1e9-quantized returns.

x476 — Little's law validation, L = λW: user sessions (30-minute
inactivity timeout, the q31 sessionization spine) give arrival rate λ
and mean duration W; time-averaged concurrency L is measured
independently by the x373 plane-sweep (+1/−1 boundary events,
duration-weighted).  The ratio λW/L ≈ 1 validates the pipeline's
sessionization and the sweep against each other — two unrelated
measurements agreeing through a theorem.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x474: McNemar paired test ---------------------------------------------------------

_X474_PRED_DUCK = """
      SELECT lang,
             CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                  WHEN len(list_filter(string_split(lower(text), ' '),
                           w -> list_contains(['der','die','das','und','ist',
                                               'nicht','ein','zu'], w)))
                       > greatest(
                           len(list_filter(string_split(lower(text), ' '),
                               w -> list_contains(['the','a','of','and','to',
                                                   'in','is','it'], w))),
                           len(list_filter(string_split(lower(text), ' '),
                               w -> list_contains(['el','los','las','es','un',
                                                   'una','en','que'], w))),
                           len(list_filter(string_split(lower(text), ' '),
                               w -> list_contains(['le','la','les','et','est',
                                                   'un','une','dans'], w))))
                    THEN 'de'
                  WHEN len(list_filter(string_split(lower(text), ' '),
                           w -> list_contains(['el','los','las','es','un',
                                               'una','en','que'], w)))
                       > greatest(
                           len(list_filter(string_split(lower(text), ' '),
                               w -> list_contains(['the','a','of','and','to',
                                                   'in','is','it'], w))),
                           len(list_filter(string_split(lower(text), ' '),
                               w -> list_contains(['le','la','les','et','est',
                                                   'un','une','dans'], w))))
                    THEN 'es'
                  WHEN len(list_filter(string_split(lower(text), ' '),
                           w -> list_contains(['le','la','les','et','est',
                                               'un','une','dans'], w)))
                       > len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains(['the','a','of','and','to',
                                                 'in','is','it'], w)))
                    THEN 'fr'
                  ELSE 'en' END AS pred_lang
      FROM documents
"""

_X474_BODY = """
    counts AS (
      SELECT
        CAST(SUM(CASE WHEN pred_lang = lang AND 'en' != lang
                      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN pred_lang != lang AND 'en' = lang
                      THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
          AS model_correct,
        CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
          AS baseline_correct,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM preds
    )
    SELECT n, model_correct, baseline_correct, b AS model_only_correct,
           c AS baseline_only_correct,
           CASE WHEN b + c > 0 THEN
             ROUND(POWER(ABS(CAST(b - c AS DOUBLE)) - 1, 2) / (b + c), 4)
           END AS mcnemar_chi2,
           CASE WHEN b + c > 0
                 AND POWER(ABS(CAST(b - c AS DOUBLE)) - 1, 2) / (b + c)
                     > 3.841
                THEN 1 ELSE 0 END AS significant_5pct
    FROM counts
"""

register_sql(
    "x474_mcnemar_paired",
    spark_sql=(
        "WITH preds AS (SELECT lang, pred_lang FROM ("
        + _X474_PRED_DUCK.replace(
            "len(list_filter(string_split(lower(text), ' '),",
            "size(filter(split(lower(text), ' '),",
        ).replace("w -> list_contains([", "w -> array_contains(array(")
        .replace("], w)))", "), w)))")
        .replace("], w)))", "), w)))")
        .replace("regexp_matches(text, '[一-鿿]')", "text rlike '[一-鿿]'")
        + ") p),"
        + _X474_BODY
    ),
    duckdb_sql="WITH preds AS (" + _X474_PRED_DUCK + ")," + _X474_BODY,
    tags=("eval", "stats"),
)

# -- x475: forecast combination ---------------------------------------------------------

_X475 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 60 AS mkey, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    lastpx AS (
      SELECT sym, mkey, px FROM (
        SELECT sym, mkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, mkey
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ticks
      ) t WHERE rn = 1
    ),
    rets AS (
      SELECT sym, mkey,
             CAST(FLOOR(LN(CAST(px AS DOUBLE)
                           / CAST(LAG(px) OVER (PARTITION BY sym
                                                ORDER BY mkey) AS DOUBLE))
                        * 1e9) AS BIGINT) AS r
      FROM lastpx
    ),
    forecasted AS (
      -- forecaster A: last return (random walk); forecaster B:
      -- trailing-20 mean (integer division keeps it exact)
      SELECT sym, r,
             LAG(r) OVER w AS f_a,
             CAST(SUM(r) OVER (PARTITION BY sym ORDER BY mkey
                               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
                  {intdiv} 20 AS BIGINT) AS f_b
      FROM rets WHERE r IS NOT NULL
      WINDOW w AS (PARTITION BY sym ORDER BY mkey)
    ),
    errs AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r - f_a AS DECIMAL(18,0)) * (r - f_a))
                  AS DECIMAL(38,0)) AS sse_a,
             CAST(SUM(CAST(r - f_b AS DECIMAL(18,0)) * (r - f_b))
                  AS DECIMAL(38,0)) AS sse_b,
             CAST(SUM(CAST(r - f_a AS DECIMAL(18,0)) * (r - f_b))
                  AS DECIMAL(38,0)) AS sse_ab
      FROM forecasted WHERE f_a IS NOT NULL AND f_b IS NOT NULL
      GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n,
           ROUND(CAST(sse_a AS DOUBLE) / n / 1e18, 12) AS mse_lastvalue,
           ROUND(CAST(sse_b AS DOUBLE) / n / 1e18, 12) AS mse_trailmean,
           ROUND(CAST(sse_b AS DOUBLE)
                 / (CAST(sse_a AS DOUBLE) + CAST(sse_b AS DOUBLE)), 6)
             AS weight_on_lastvalue,
           -- combined MSE at w*: (w² SSEa + (1-w)² SSEb + 2w(1-w)SSEab)/n
           ROUND((POWER(CAST(sse_b AS DOUBLE)
                        / (CAST(sse_a AS DOUBLE) + sse_b), 2) * sse_a
                  + POWER(CAST(sse_a AS DOUBLE)
                          / (CAST(sse_a AS DOUBLE) + sse_b), 2) * sse_b
                  + 2 * (CAST(sse_b AS DOUBLE)
                         / (CAST(sse_a AS DOUBLE) + sse_b))
                      * (CAST(sse_a AS DOUBLE)
                         / (CAST(sse_a AS DOUBLE) + sse_b))
                      * CAST(sse_ab AS DOUBLE)) / n / 1e18, 12)
             AS mse_combined
    FROM errs WHERE sse_a > 0 AND sse_b > 0 ORDER BY sym
"""

register_sql(
    "x475_forecast_combination",
    spark_sql=_X475.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X475.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("eval", "finance"),
)

# -- x476: Little's law -------------------------------------------------------------------

_X476 = """
    WITH marked AS (
      SELECT user_id, {epoch} AS et,
             CASE WHEN {epoch} - LAG({epoch}) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id)
                       > 1800
                   OR LAG({epoch}) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, sess_id,
             CAST(MIN(et) AS BIGINT) AS s_start,
             CAST(MAX(et) AS BIGINT) + 1 AS s_end
      FROM (
        SELECT user_id, et,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY et
                                      ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
      ) g GROUP BY user_id, sess_id
    ),
    spanargs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
             CAST(SUM(s_end - s_start) AS BIGINT) AS total_dur,
             CAST(MAX(s_end) - MIN(s_start) AS BIGINT) AS span
      FROM sessions
    ),
    bounds AS (
      -- INDEPENDENT concurrency measurement: +1/-1 boundary deltas on a
      -- minute grid (x373's sweep), sampled UNWEIGHTED at boundary
      -- minutes — L = total_dur/span would make the ratio 1 by algebra;
      -- the sampled L actually tests the law (deviation = sampling bias)
      SELECT s_start {intdiv} 60 AS m, 1 AS d FROM sessions
      UNION ALL
      SELECT (s_end + 59) {intdiv} 60 AS m, -1 AS d FROM sessions
    ),
    conc AS (
      SELECT m, SUM(SUM(d)) OVER (ORDER BY m) AS c
      FROM bounds GROUP BY m
    ),
    lsample AS (
      SELECT CAST(SUM(c) AS BIGINT) AS sc, CAST(COUNT(*) AS BIGINT) AS nb
      FROM conc
    )
    SELECT a.n_sessions,
           ROUND(CAST(a.n_sessions AS DOUBLE) / a.span, 9) AS lambda_per_s,
           ROUND(CAST(a.total_dur AS DOUBLE) / a.n_sessions, 4) AS w_mean_s,
           ROUND(CAST(l.sc AS DOUBLE) / l.nb, 6) AS l_sampled,
           ROUND((CAST(a.n_sessions AS DOUBLE) / a.span)
                 * (CAST(a.total_dur AS DOUBLE) / a.n_sessions)
                 / (CAST(l.sc AS DOUBLE) / l.nb), 6) AS littles_law_ratio
    FROM spanargs a CROSS JOIN lsample l
"""

register_sql(
    "x476_littles_law",
    spark_sql=_X476.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X476.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("events", "planning"),
)
