"""Sixtieth extension wave — corpus and process statistics:

x273 zipf fit        Zipf exponent of the token rank-frequency curve:
                     log-log OLS slope over the top-100 tokens (corpus
                     health check — natural text sits near -1)
x274 interarrival cv mean and coefficient of variation of per-user
                     inter-event times (CV ~= 1 is Poisson; >1 bursty —
                     the process-model diagnostic next to x251's Fano)

Scale shapes: x273 reduces to 100 (rank, freq) points before regression;
x274 is one LAG window pass then per-user moments in exact integers.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x273: Zipf exponent -----------------------------------------------------

_X273_FMT = """
    WITH tf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM ({tok_src}) t WHERE tok <> ''
      GROUP BY tok
    ),
    top AS (
      -- LIMIT BEFORE the rank window (TakeOrderedAndProject): the
      -- earlier form ranked the FULL vocabulary grid through one task
      -- (the x442 class).  Rank-within-top-100 under the same total
      -- order equals the global rank for exactly those rows.
      SELECT f, tok FROM tf ORDER BY f DESC, tok LIMIT 100
    ),
    ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS rk FROM top
    ),
    obs AS (
      SELECT CAST(ROUND(LN(CAST(rk AS DOUBLE)), 7) AS DECIMAL(18,7)) AS x,
             CAST(ROUND(LN(CAST(f AS DOUBLE)), 7) AS DECIMAL(18,7)) AS y
      FROM ranked
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM obs
    )
    SELECT n,
           CAST(FLOOR(1e6 * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) AS BIGINT)
             AS zipf_slope_micro
    FROM m
"""

register_sql(
    "x273_zipf_fit",
    spark_sql=_X273_FMT.format(
        tok_src="SELECT explode(split(lower(text), ' ')) AS tok FROM documents"
    ),
    duckdb_sql=_X273_FMT.format(
        tok_src="SELECT UNNEST(string_split(lower(text), ' ')) AS tok FROM documents"
    ),
    tags=("text", "corpus", "regression"),
)

# -- x274: inter-arrival coefficient of variation ---------------------------

_X274_FMT = """
    WITH gaps AS (
      SELECT user_id,
             CAST(es - LAG(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
                  AS BIGINT) AS gap_s
      FROM (SELECT user_id, event_id, {epoch} AS es FROM events) t
    ),
    m AS (
      SELECT user_id, CAST(COUNT(gap_s) AS BIGINT) AS n,
             CAST(SUM(gap_s) AS BIGINT) AS s,
             CAST(SUM(gap_s * gap_s) AS BIGINT) AS ss
      FROM gaps WHERE gap_s IS NOT NULL
      GROUP BY user_id HAVING COUNT(gap_s) > 1
    )
    SELECT user_id, n,
           CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT) AS mean_gap_s,
           CAST(FLOOR(1e6 * (SQRT(GREATEST((CAST(ss AS DOUBLE)
                                            - CAST(s AS DOUBLE) * s / n) / (n - 1), 0.0))
                             / (CAST(s AS DOUBLE) / n))) AS BIGINT) AS cv_micro
    FROM m ORDER BY user_id LIMIT 300
"""

register_sql(
    "x274_interarrival_cv",
    spark_sql=_X274_FMT.format(epoch="unix_seconds(ts)"),
    duckdb_sql=_X274_FMT.format(epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"),
    tags=("stats", "process", "window"),
)
