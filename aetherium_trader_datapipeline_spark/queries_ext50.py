"""Fiftieth extension wave — concentration, SLA, and dispersion metrics:

x249 hhi             Herfindahl-Hirschman revenue concentration per
                     nation (Σ share² over suppliers) — exact decimal
                     revenue, one floored-micro ratio per supplier
x250 ship latency    exact p50/p90/p99 of order→ship lag per priority
                     (rank-pick, no approx percentiles)
x251 burstiness      Fano factor (variance/mean) of per-hour event counts
                     per user — the overdispersion diagnostic for
                     rate-limit and capacity sizing
x252 set jaccard     exact pairwise Jaccard between event-type audiences
                     — the ground truth the x229 HLL algebra estimates

Scale shapes: all reduce to small keyed aggregates before any window;
x252's pair space is C(|event types|, 2) = 10 rows.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x249: Herfindahl concentration -----------------------------------------

_X249_BODY = """
    WITH rev AS (
      SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS r
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    tot AS (
      SELECT nk, SUM(r) AS tr, CAST(COUNT(*) AS BIGINT) AS n_supp
      FROM rev GROUP BY nk
    ),
    sh AS (
      SELECT r.nk, t.n_supp,
             CAST(r.r AS DOUBLE) / CAST(t.tr AS DOUBLE) AS share
      FROM rev r JOIN tot t ON r.nk = t.nk
    )
    SELECT nk AS nationkey, CAST(MAX(n_supp) AS BIGINT) AS n_suppliers,
           CAST(FLOOR(1e6 * SUM(share * share)) AS BIGINT) AS hhi_micro
    FROM sh GROUP BY nk ORDER BY nk
"""

register_sql(
    "x249_hhi",
    spark_sql=_X249_BODY,
    duckdb_sql=_X249_BODY,
    tags=("olap", "concentration"),
)

# -- x250: order→ship latency percentiles -----------------------------------

_X250_FMT = """
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             CAST({dd} AS BIGINT) AS days,
             l.l_orderkey AS okey, l.l_linenumber AS lnum
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    r AS (
      SELECT priority, days,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY days, okey, lnum) AS rk,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM lag
    )
    SELECT priority, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.50 * n) AS BIGINT) THEN days END) AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.90 * n) AS BIGINT) THEN days END) AS BIGINT) AS p90_days,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.99 * n) AS BIGINT) THEN days END) AS BIGINT) AS p99_days
    FROM r GROUP BY priority ORDER BY priority
"""

register_sql(
    "x250_ship_latency",
    spark_sql=_X250_FMT.format(dd="DATEDIFF(l.l_shipdate, o.o_orderdate)"),
    duckdb_sql=_X250_FMT.format(dd="datediff('day', o.o_orderdate, l.l_shipdate)"),
    tags=("sla", "window"),
)

# -- x251: Fano-factor burstiness -------------------------------------------

_X251_FMT = """
    WITH hourly AS (
      SELECT user_id, {hourkey} AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, {hourkey}
    ),
    m AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS ss
      FROM hourly GROUP BY user_id
    )
    SELECT user_id, n_hours, s AS n_events,
           CAST(FLOOR(1e6 * (((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_hours)
                              / (n_hours - 1))
                             / (CAST(s AS DOUBLE) / n_hours))) AS BIGINT) AS fano_micro
    FROM m WHERE n_hours > 1
    ORDER BY user_id LIMIT 300
"""

register_sql(
    "x251_burstiness",
    spark_sql=_X251_FMT.format(hourkey="CAST(FLOOR(unix_seconds(ts) / 3600) AS BIGINT)"),
    duckdb_sql=_X251_FMT.format(hourkey="CAST(FLOOR(epoch(ts) / 3600) AS BIGINT)"),
    tags=("stats", "capacity"),
)

# -- x252: exact audience Jaccard -------------------------------------------

_X252_BODY = """
    WITH au AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sz AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM au GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS ta, b.event_type AS tb, CAST(COUNT(*) AS BIGINT) AS ni
      FROM au a JOIN au b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT i.ta, i.tb, i.ni AS n_intersection,
           sa.n + sb.n - i.ni AS n_union,
           CAST(FLOOR(1e6 * (CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni))) AS BIGINT)
             AS jaccard_micro
    FROM inter i
    JOIN sz sa ON i.ta = sa.event_type
    JOIN sz sb ON i.tb = sb.event_type
    ORDER BY i.ta, i.tb
"""

register_sql(
    "x252_set_jaccard_exact",
    spark_sql=_X252_BODY,
    duckdb_sql=_X252_BODY,
    tags=("stats", "sets", "join"),
)
