"""Wave 157 (x540–x542): three-valued logic, factor sorts, dispersion.

x540 — NULL-semantics audit: the ANSI traps, measured side by side on
the same data — `NOT IN` against a list containing NULL (matches
nothing), its `NOT EXISTS` repair, NULL-safe equality (<=> / IS NOT
DISTINCT FROM), and GROUP BY's NULL-as-one-group rule.  Every row is a
count under one semantic, so the table documents that BOTH engines
implement the standard faithfully — the correctness corner every
migration audit re-checks.

x541 — cross-sectional momentum sort (Jegadeesh–Titman shape): each
day, symbols rank by their PRIOR-day return; the long-short spread is
the mean next-day return of the top 3 minus the bottom 3, averaged
over days.  The portfolio-sort counterpart of x493's rank-IC; winner/
loser legs and the t-like ratio all from exact integer daily sums.

x542 — cross-sectional dispersion: the per-day standard deviation of
symbol returns (the "stock picker's market" gauge) with its time-series
mean and trend sign — from exact per-day DECIMAL moments over the
10-symbol cross-section.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x540: NULL semantics -----------------------------------------------------------------

_X540 = """
    WITH probe AS (
      -- o_custkey with planted NULLs: every 100th key masked
      SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                  ELSE o_custkey END AS k,
             o_orderkey
      FROM orders
    ),
    ref AS (
      SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL
                  ELSE c_custkey END AS k
      FROM customer
    )
    SELECT 'a_in_list_with_null' AS semantic,
           CAST((SELECT COUNT(*) FROM probe
                 WHERE k IN (SELECT k FROM ref)) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'b_not_in_list_with_null',
           CAST((SELECT COUNT(*) FROM probe
                 WHERE k NOT IN (SELECT k FROM ref)) AS BIGINT)
    UNION ALL
    SELECT 'c_not_exists_repair',
           CAST((SELECT COUNT(*) FROM probe p
                 WHERE NOT EXISTS (SELECT 1 FROM ref r
                                   WHERE r.k = p.k)) AS BIGINT)
    UNION ALL
    SELECT 'd_null_safe_self_match',
           CAST((SELECT COUNT(*) FROM probe p JOIN probe q
                 ON p.o_orderkey = q.o_orderkey
                 WHERE {nullsafe_eq}) AS BIGINT)
    UNION ALL
    SELECT 'e_group_by_null_groups',
           CAST((SELECT COUNT(*) FROM (
                   SELECT k FROM probe GROUP BY k) g) AS BIGINT)
    ORDER BY semantic
"""

register_sql(
    "x540_null_semantics",
    spark_sql=_X540.format(nullsafe_eq="p.k <=> q.k"),
    duckdb_sql=_X540.format(nullsafe_eq="p.k IS NOT DISTINCT FROM q.k"),
    tags=("ansi", "sql"),
)

# -- x541: momentum sort ------------------------------------------------------------------------

_X541 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 86400 AS dkey,
             ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, dkey,
             CAST(FLOOR(LN(
               CAST(MAX(CASE WHEN rn_last = 1 THEN px END) AS DOUBLE)
               / CAST(MAX(CASE WHEN rn_first = 1 THEN px END) AS DOUBLE))
               * 1e9) AS BIGINT) AS r
      FROM (
        SELECT sym, dkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                  ORDER BY ts DESC, event_id DESC)
                 AS rn_last,
               ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                  ORDER BY ts, event_id) AS rn_first
        FROM ticks
      ) t GROUP BY sym, dkey
    ),
    signals AS (
      SELECT sym, dkey, r,
             LAG(r) OVER (PARTITION BY sym ORDER BY dkey) AS prior_r
      FROM daily
    ),
    ranked AS (
      SELECT dkey, sym, r,
             ROW_NUMBER() OVER (PARTITION BY dkey
                                ORDER BY prior_r DESC, sym) AS mom_rank,
             COUNT(*) OVER (PARTITION BY dkey) AS n_syms
      FROM signals WHERE prior_r IS NOT NULL
    ),
    legs AS (
      SELECT dkey,
             CAST(SUM(CASE WHEN mom_rank <= 3 THEN r ELSE 0 END)
                  AS BIGINT) AS winners,
             CAST(SUM(CASE WHEN mom_rank > n_syms - 3 THEN r ELSE 0 END)
                  AS BIGINT) AS losers
      FROM ranked WHERE n_syms >= 6 GROUP BY dkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(winners) AS DOUBLE) / COUNT(*) / 3 / 1e9, 9)
             AS winner_leg_daily,
           ROUND(CAST(SUM(losers) AS DOUBLE) / COUNT(*) / 3 / 1e9, 9)
             AS loser_leg_daily,
           ROUND(CAST(SUM(winners - losers) AS DOUBLE)
                 / COUNT(*) / 3 / 1e9, 9) AS momentum_spread_daily,
           CASE WHEN SUM(winners - losers) > 0 THEN 'momentum'
                WHEN SUM(winners - losers) < 0 THEN 'reversal'
                ELSE 'flat' END AS regime
    FROM legs
"""

register_sql(
    "x541_momentum_sort",
    spark_sql=_X541.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X541.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)

# -- x542: cross-sectional dispersion --------------------------------------------------------------

_X542 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 86400 AS dkey,
             ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, dkey,
             CAST(FLOOR(LN(
               CAST(MAX(CASE WHEN rn_last = 1 THEN px END) AS DOUBLE)
               / CAST(MAX(CASE WHEN rn_first = 1 THEN px END) AS DOUBLE))
               * 1e9) AS BIGINT) AS r
      FROM (
        SELECT sym, dkey, px,
               ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                  ORDER BY ts DESC, event_id DESC)
                 AS rn_last,
               ROW_NUMBER() OVER (PARTITION BY sym, dkey
                                  ORDER BY ts, event_id) AS rn_first
        FROM ticks
      ) t GROUP BY sym, dkey
    ),
    per_day AS (
      SELECT dkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r) AS BIGINT) AS sr,
             CAST(SUM(CAST(r AS DECIMAL(18,0)) * r) AS DECIMAL(38,0)) AS srr
      FROM daily GROUP BY dkey
    ),
    disp AS (
      SELECT dkey,
             CAST(FLOOR(SQRT(GREATEST(0.0,
               CAST(srr AS DOUBLE) / n
               - POWER(CAST(sr AS DOUBLE) / n, 2)))) AS BIGINT) AS d_fp,
             ROW_NUMBER() OVER (ORDER BY dkey) AS i,
             COUNT(*) OVER () AS nd
      FROM per_day WHERE n > 2
    )
    SELECT CAST(MAX(nd) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(d_fp) AS DOUBLE) / MAX(nd) / 1e9, 9)
             AS mean_dispersion,
           ROUND(CAST(MAX(d_fp) AS DOUBLE) / 1e9, 9) AS max_dispersion,
           -- first-half vs second-half trend sign, exact integer sums
           CASE WHEN SUM(CASE WHEN i * 2 > nd THEN d_fp ELSE 0 END)
                     > SUM(CASE WHEN i * 2 <= nd THEN d_fp ELSE 0 END)
                THEN 'rising' ELSE 'falling' END AS dispersion_trend
    FROM disp
"""

register_sql(
    "x542_cs_dispersion",
    spark_sql=_X542.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X542.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("finance", "stats"),
)
