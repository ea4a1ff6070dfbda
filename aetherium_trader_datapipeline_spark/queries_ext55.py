"""Fifty-fifth extension wave — reconciliation and session quality:

x261 table checksum   order-free whole-table checksum: SUM of md5-derived
                      row hashes over the key columns — the primitive for
                      reconciling a table across engines/copies without
                      moving data (this repo's oracle gate, reduced to
                      one number)
x262 bounce rate      per-user session islands (30-minute gaps) rolled up
                      to single-event-session ("bounce") rate

Scale shapes: x261 is one scan + one aggregate (hash per row is
map-side); x262 is one window pass keyed by user then two rollups.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_SPARK_HEX8 = "CAST(CONV(SUBSTRING(MD5({x}), 1, 8), 16, 10) AS BIGINT)"
_DUCK_HEX8 = "('0x' || SUBSTRING(MD5({x}), 1, 8))::BIGINT"

# -- x261: order-free table checksum ----------------------------------------

_X261_FMT = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({h}) AS BIGINT) AS checksum
    FROM (
      SELECT {hx} AS {h_alias}
      FROM lineitem
    ) t
"""


def _x261(hex8: str) -> str:
    row = (
        "CONCAT(CAST(l_orderkey AS STRING), '|', CAST(l_linenumber AS STRING), "
        "'|', CAST(l_partkey AS STRING), '|', CAST(l_suppkey AS STRING))"
    )
    return _X261_FMT.format(h="h", hx=hex8.format(x=row), h_alias="h")


register_sql(
    "x261_table_checksum",
    spark_sql=_x261(_SPARK_HEX8),
    duckdb_sql=_x261(_DUCK_HEX8).replace("AS STRING", "AS VARCHAR").replace(
        "CONCAT(", "CONCAT("
    ),
    tags=("reconciliation", "agg"),
)

# -- x262: session bounce rate ----------------------------------------------

_X262_FMT = """
    WITH e AS (
      SELECT user_id, {epoch} AS es,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    gaps AS (
      SELECT user_id, rn, es,
             CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY rn) > 1800
                   OR LAG(es) OVER (PARTITION BY user_id ORDER BY rn) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM e
    ),
    sess AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY rn
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    ),
    per_sess AS (
      SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           CAST(FLOOR(1e6 * (CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                             / COUNT(*))) AS BIGINT) AS bounce_rate_micro
    FROM per_sess GROUP BY user_id
    ORDER BY user_id LIMIT 300
"""

register_sql(
    "x262_bounce_rate",
    spark_sql=_X262_FMT.format(epoch="unix_seconds(ts)"),
    duckdb_sql=_X262_FMT.format(epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"),
    tags=("sessions", "window"),
)
