"""Forty-ninth extension wave — seasonality index and curation dashboard:

x247 seasonal index   day-of-week revenue index: each dow's mean order
                      revenue relative to the overall mean (micro-floored
                      ratio of exact decimal means)
x248 dup rate by source per-source exact-duplicate dashboard: documents
                      sharing an md5 content hash, duplicate rate per
                      source — the curation health metric sliced by origin

Scale shapes: both are one aggregation pass (x248 groups by content hash
first — the q34/x55 exact-dedup shuffle — then rolls up per source).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x247: day-of-week seasonal index ---------------------------------------

_X247_FMT = """
    WITH rev AS (
      SELECT CAST({dow0} AS BIGINT) AS dow,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders
    ),
    by_dow AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s
      FROM rev GROUP BY dow
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, SUM(s) AS ts FROM by_dow)
    SELECT d.dow, d.n,
           CAST(FLOOR(1e6 * ((CAST(d.s AS DOUBLE) / d.n)
                             / (CAST(t.ts AS DOUBLE) / t.tn))) AS BIGINT)
             AS seasonal_index_micro
    FROM by_dow d CROSS JOIN tot t
    ORDER BY d.dow
"""

register_sql(
    "x247_seasonal_index",
    spark_sql=_X247_FMT.format(dow0="WEEKDAY(o_orderdate)"),
    duckdb_sql=_X247_FMT.format(dow0="isodow(o_orderdate) - 1"),
    tags=("calendar", "analytics"),
)

# -- x248: duplicate rate by source -----------------------------------------

_X248_BODY = """
    WITH h AS (
      SELECT source, MD5(text) AS ch FROM documents
    ),
    g AS (
      SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS n
      FROM h GROUP BY source, ch
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_contents,
           CAST(FLOOR(1e6 * (CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n))) AS BIGINT)
             AS dup_rate_micro
    FROM g GROUP BY source ORDER BY source
"""

register_sql(
    "x248_dup_rate_by_source",
    spark_sql=_X248_BODY,
    duckdb_sql=_X248_BODY,
    tags=("curation", "dedup", "quality"),
)
