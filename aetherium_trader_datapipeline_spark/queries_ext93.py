"""Wave 93 (x363–x365): correlation matrix, historical VaR, dedup survivorship.

x363 — the pairwise daily-return correlation matrix across symbols: the
input every portfolio/risk calculation starts from.  Returns are
quantized per day (1e9 fixed-point, x321 discipline), the 45 sym pairs
come from a self-join of the TINY daily frame (sym × 30 days — the
corpus-sized work is the daily aggregation, done once), and each pair's
Pearson r uses DECIMAL-exact moment sums (x322's discipline).  Matrix
upper triangle only; diagonal omitted (identically 1).

x364 — historical VaR/ES of the equal-weight portfolio: portfolio
daily return = mean of sym returns per day (exact integer mean of the
quantized returns), VaR95 = the exact 5th-percentile order statistic
via the rank-selection idiom (x343's), expected shortfall = exact mean
of the tail beyond it.  No parametric assumption, no float sums — the
entire estimator is sorting + integer arithmetic, which is the point:
historical VaR on a cluster is a one-window computation, not a Monte
Carlo.

x365 — dedup SURVIVORSHIP by source: after exact content-hash
keep-first dedup (D1's policy), which sources lose the most documents?
A source with low survivorship is re-crawling what others already
supplied — the attribution view of x73's duplicate clusters, and the
table that settles "whose crawl is actually adding data".  One hash
groupBy for winners + one source groupBy for the report.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_DAILY_RETS_FMT = """
    ticks AS (
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
    )
"""

_CLOSE_SPARK = "CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))"
_CLOSE_DUCK = "CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))"

# -- x363: correlation matrix --------------------------------------------------

_X363_FMT = (
    "WITH "
    + _DAILY_RETS_FMT
    + """,
    pairs AS (
      SELECT a.sym AS s1, b.sym AS s2,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(a.r_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(b.r_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(a.r_fp AS DECIMAL(18,0)) * a.r_fp)
                  AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(b.r_fp AS DECIMAL(18,0)) * b.r_fp)
                  AS DECIMAL(38,0)) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(a.r_fp AS DECIMAL(18,0)) * b.r_fp)
                  AS DECIMAL(38,0)) AS DOUBLE) AS sxy
      FROM rets a JOIN rets b ON a.d = b.d AND a.sym < b.sym
      WHERE a.r_fp IS NOT NULL AND b.r_fp IS NOT NULL
      GROUP BY a.sym, b.sym
    )
    SELECT CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
           CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
             AS corr
    FROM pairs ORDER BY s1, s2
"""
)

register_sql(
    "x363_corr_matrix",
    spark_sql=_X363_FMT.format(close_px=_CLOSE_SPARK),
    duckdb_sql=_X363_FMT.format(close_px=_CLOSE_DUCK),
    tags=("finance", "stats"),
)

# -- x364: historical VaR / expected shortfall ---------------------------------

_X364_FMT = (
    "WITH "
    + _DAILY_RETS_FMT
    + """,
    port AS (
      SELECT d,
             CAST(FLOOR(CAST(CAST(SUM(CAST(r_fp AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS DOUBLE) / COUNT(*)) AS BIGINT) AS p_fp
      FROM rets WHERE r_fp IS NOT NULL GROUP BY d
    ),
    ranked AS (
      SELECT p_fp,
             ROW_NUMBER() OVER (ORDER BY p_fp) AS r,
             COUNT(*) OVER () AS n
      FROM port
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           ROUND(CAST(MAX(CASE WHEN r = CAST(CEIL(0.05 * n) AS BIGINT)
                               THEN p_fp END) AS DOUBLE) / 1e9, 8) AS var95,
           ROUND(CAST(CAST(SUM(CASE WHEN r <= CAST(CEIL(0.05 * n) AS BIGINT)
                                    THEN CAST(p_fp AS DECIMAL(18,0)) END)
                 AS DECIMAL(38,0)) AS DOUBLE)
                 / SUM(CASE WHEN r <= CAST(CEIL(0.05 * n) AS BIGINT)
                            THEN 1 ELSE 0 END) / 1e9, 8) AS es95
    FROM ranked
"""
)

register_sql(
    "x364_portfolio_var",
    spark_sql=_X364_FMT.format(close_px=_CLOSE_SPARK),
    duckdb_sql=_X364_FMT.format(close_px=_CLOSE_DUCK),
    tags=("finance", "stats"),
)

# -- x365: dedup survivorship by source ----------------------------------------

_X365 = """
    WITH sig AS (
      SELECT doc_id, source, md5(text) AS h FROM documents
    ),
    winners AS (
      SELECT h, MIN(doc_id) AS keep_id FROM sig GROUP BY h
    ),
    tagged AS (
      SELECT s.source,
             CASE WHEN s.doc_id = w.keep_id THEN 1 ELSE 0 END AS kept
      FROM sig s JOIN winners w ON s.h = w.h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_lost,
           ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 4) AS survivorship
    FROM tagged GROUP BY source ORDER BY source
"""

register_sql(
    "x365_dedup_survivorship",
    spark_sql=_X365,
    duckdb_sql=_X365,
    tags=("dedup", "audit"),
)
