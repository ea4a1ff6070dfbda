"""Fortieth extension wave — temporal correctness and OLAP ratios:

x224 scd2 pit        point-in-time dimension lookup: a daily query spine
                     per key joined to x193-style SCD2 validity ranges —
                     the leakage-free "feature as known at time T" join a
                     training pipeline needs
x225 revenue share   contribution analysis (ratio-to-report): per-nation
                     revenue share of total, exact decimal sums
x226 new_vs_returning daily new (first-seen) vs returning actives and the
                     cumulative distinct-user curve — all integers

Scale shapes: x224 is an equi-join on the key with the range predicate as
a post-join filter (validity ranges per key are few — the SCD2 contract);
x225/x226 are single aggregation passes with tiny window inputs.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x224: point-in-time (AS OF) dimension lookup ---------------------------

_X224_FMT = """
    WITH ch AS (
      SELECT user_id, ts, event_id, event_type AS attr,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id, attr,
             CASE WHEN prev IS NULL OR prev <> attr THEN 1 ELSE 0 END AS chg
      FROM marked_src
    ),
    grp AS (
      SELECT user_id, ts, attr,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM marked
    ),
    scd AS (
      SELECT user_id, g, MIN(attr) AS attr, MIN(ts) AS valid_from
      FROM grp GROUP BY user_id, g
    ),
    scd2 AS (
      SELECT user_id, attr, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY g) AS valid_to
      FROM scd
    ),
    bounds AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, {gen_days} AS day FROM bounds
    ),
    pit AS (
      SELECT s.user_id, s.day, d.attr
      FROM spine s JOIN scd2 d
        ON s.user_id = d.user_id
       AND CAST(s.day AS TIMESTAMP) >= d.valid_from
       AND (d.valid_to IS NULL OR CAST(s.day AS TIMESTAMP) < d.valid_to)
    )
    SELECT user_id, CAST(day AS DATE) AS day, attr
    FROM pit ORDER BY user_id, day LIMIT 500
"""


def _x224(gen_days: str) -> str:
    # the marked CTE reads from ch; alias indirection keeps one shared body
    return _X224_FMT.replace("marked_src", "ch").format(gen_days=gen_days)


register_sql(
    "x224_scd2_pit",
    spark_sql=_x224("explode(sequence(d0, d1, interval 1 day))"),
    duckdb_sql=_x224("unnest(generate_series(d0, d1, INTERVAL 1 DAY))"),
    tags=("warehouse", "temporal", "join"),
)

# -- x225: contribution analysis (ratio-to-report) --------------------------

_X225_BODY = """
    WITH rev AS (
      SELECT n.n_name,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS r
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name,
           CAST(ROUND(CAST(r AS DOUBLE), 2) AS DOUBLE) AS revenue,
           CAST(FLOOR(1e6 * (CAST(r AS DOUBLE) / CAST(SUM(r) OVER () AS DOUBLE)))
                AS BIGINT) AS share_micro
    FROM rev ORDER BY revenue DESC, n_name
"""

register_sql(
    "x225_revenue_share",
    spark_sql=_X225_BODY,
    duckdb_sql=_X225_BODY,
    tags=("olap", "window"),
)

# -- x226: daily new vs returning actives -----------------------------------

_X226_BODY = """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    f AS (
      SELECT user_id, day,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) = 1
                  THEN 1 ELSE 0 END AS is_new
      FROM d
    ),
    byday AS (
      SELECT day, CAST(SUM(is_new) AS BIGINT) AS new_users,
             CAST(SUM(1 - is_new) AS BIGINT) AS returning_users
      FROM f GROUP BY day
    )
    SELECT day, new_users, returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_distinct_users
    FROM byday ORDER BY day
"""

register_sql(
    "x226_new_vs_returning",
    spark_sql=_X226_BODY,
    duckdb_sql=_X226_BODY,
    tags=("analytics", "window"),
)
