"""Wave 95 (x369–x371): time-decay scores, quantile normalization, bot screen.

x369 — exponential time-decay aggregates: each event's weight halves
every 7 days of age relative to the corpus watermark (max ts — a
corpus-derived anchor, so the query is deterministic and re-runnable,
never wall-clock-dependent).  Decayed count and decayed volume per
symbol are THE feed-ranking/recency primitives; per-event weights are
per-row pow() on exact day ages, quantized to 1e9 before the per-sym
sum (x321 discipline).  At scale this is one scan + one groupBy — the
decay adds zero shuffles.

x370 — quantile normalization of per-symbol daily returns onto the
POOLED return distribution (the cross-sample calibration trick from
bioinformatics, used on features whenever per-group distributions must
be made comparable): each return's within-sym rank maps to the pooled
order statistic at the proportional rank.  Both rank passes are exact
integer windows; the proportional index is exact integer arithmetic
(ceil via (r·N − 1) DIV n + 1); the join is rank-to-rank.  The output
checksums each symbol's normalized series plus its min/max — after
normalization all symbols share the pooled support, which the reader
can see directly.

x371 — behavioral bot screen on the event stream: per user, the
click:view ratio, error share, and inter-event regularity (are the
user's gaps suspiciously uniform? bots time out on schedulers; people
don't), flagging users that trip ≥ 2 of the 3 tests.  All three
signals are exact integer/fixed-point; regularity = the variance of
inter-event gaps in DECIMAL-exact micros, compared against a fraction
of the squared mean gap (dimensionless CV² test, no float sums).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x369: exponential time-decay aggregates -----------------------------------

_X369_FMT = """
    WITH anchor AS (
      SELECT MAX({epoch_us}) AS t_max FROM events
    ),
    weighted AS (
      SELECT e.user_id % 10 AS sym,
             CAST(FLOOR(POW(0.5,
               CAST(a.t_max - {epoch_us} AS DOUBLE) / 1000000 / 86400 / 7)
               * 1e9) AS BIGINT) AS w_fp,
             CAST(FLOOR(POW(0.5,
               CAST(a.t_max - {epoch_us} AS DOUBLE) / 1000000 / 86400 / 7)
               * ABS(e.value) * 1e6) AS BIGINT) AS wv_fp
      FROM events e CROSS JOIN anchor a
      WHERE e.value IS NOT NULL
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(CAST(SUM(CAST(w_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / 1e9, 4) AS decayed_count,
           ROUND(CAST(CAST(SUM(CAST(wv_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / 1e6, 2) AS decayed_volume
    FROM weighted GROUP BY sym ORDER BY sym
"""

register_sql(
    "x369_time_decay_score",
    spark_sql=_X369_FMT.format(epoch_us="unix_micros(e.ts)").replace(
        "MAX(unix_micros(e.ts))", "MAX(unix_micros(ts))"
    ),
    duckdb_sql=_X369_FMT.format(epoch_us="epoch_us(e.ts)").replace(
        "MAX(epoch_us(e.ts))", "MAX(epoch_us(ts))"
    ),
    tags=("finance", "window"),
)

# -- x370: quantile normalization ----------------------------------------------

_X370_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, d, {close_px} AS close_px
      FROM ticks GROUP BY sym, d
    ),
    rets AS (
      SELECT sym, d,
             CAST(FLOOR((CAST(close_px AS DOUBLE)
                         / CAST(LAG(close_px) OVER (PARTITION BY sym ORDER BY d)
                                AS DOUBLE) - 1) * 1e9) AS BIGINT) AS r_fp
      FROM daily
    ),
    valid AS (SELECT sym, d, r_fp FROM rets WHERE r_fp IS NOT NULL),
    ranked AS (
      SELECT sym, d, r_fp,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY r_fp, d) AS r,
             COUNT(*) OVER (PARTITION BY sym) AS n
      FROM valid
    ),
    pooled AS (
      SELECT r_fp AS pooled_fp,
             ROW_NUMBER() OVER (ORDER BY r_fp, sym, d) AS pr,
             COUNT(*) OVER () AS np
      FROM valid
    ),
    mapped AS (
      SELECT k.sym,
             p.pooled_fp
      FROM (
        SELECT sym, ((r * np - 1) {intdiv} n) + 1 AS target_pr
        FROM ranked CROSS JOIN (SELECT MAX(np) AS np FROM pooled) t
      ) k JOIN pooled p ON k.target_pr = p.pr
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(CAST(SUM(CAST(pooled_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
             AS BIGINT) AS norm_checksum_fp,
           CAST(MIN(pooled_fp) AS BIGINT) AS norm_min_fp,
           CAST(MAX(pooled_fp) AS BIGINT) AS norm_max_fp
    FROM mapped GROUP BY sym ORDER BY sym
"""

register_sql(
    "x370_quantile_normalize",
    spark_sql=_X370_FMT.format(
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
        intdiv="DIV",
    ),
    duckdb_sql=_X370_FMT.format(
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
        intdiv="//",
    ),
    tags=("stats", "training"),
)

# -- x371: behavioral bot screen -----------------------------------------------

_X371_FMT = """
    WITH ev AS (
      SELECT user_id, event_type, {epoch_us} AS t
      FROM events
    ),
    gaps AS (
      SELECT user_id,
             t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS g
      FROM ev
    ),
    gap_stats AS (
      SELECT user_id,
             CAST(COUNT(g) AS BIGINT) AS n_gaps,
             CAST(SUM(CAST(g AS DECIMAL(28,0))) AS DECIMAL(38,0)) AS sg,
             CAST(SUM(CAST(g AS DECIMAL(28,0)) * g) AS DECIMAL(38,0)) AS sgg
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id
    ),
    mix AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_ev,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_click,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_view,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_err
      FROM ev GROUP BY user_id
    ),
    scored AS (
      SELECT m.user_id, m.n_ev,
             CASE WHEN m.n_click > 3 * (m.n_view + 1) THEN 1 ELSE 0 END
               AS flag_clicky,
             CASE WHEN m.n_err * 3 > m.n_ev THEN 1 ELSE 0 END AS flag_errors,
             -- CV^2 < 1/4: gap variance under a quarter of squared mean
             -- gap => metronome-regular. Exact integer cross-multiply.
             CASE WHEN g.n_gaps >= 5 AND
                  (g.n_gaps * g.sgg - g.sg * g.sg) * 4 < g.sg * g.sg
                  THEN 1 ELSE 0 END AS flag_regular
      FROM mix m JOIN gap_stats g ON m.user_id = g.user_id
      WHERE m.n_ev >= 10
    )
    SELECT CAST(flag_clicky + flag_errors + flag_regular AS BIGINT) AS n_flags,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN flag_clicky + flag_errors + flag_regular >= 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bot_suspects,
           CAST(MIN(user_id) AS BIGINT) AS min_user
    FROM scored GROUP BY flag_clicky + flag_errors + flag_regular
    ORDER BY n_flags
"""

register_sql(
    "x371_bot_screen",
    spark_sql=_X371_FMT.format(epoch_us="unix_micros(ts)"),
    duckdb_sql=_X371_FMT.format(epoch_us="epoch_us(ts)"),
    tags=("quality", "audit"),
)
