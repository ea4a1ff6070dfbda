"""Forty-third extension wave — embedding diagnostics and stream-disorder
analytics (the measurement side of watermark/window configuration):

x231 cluster cohesion  per-label mean squared distance to the label
                       centroid, computed entirely in exact DECIMAL after
                       6-dp quantization (float partial-sum order can
                       never touch the result)
x232 order disorder    Spearman rank correlation between arrival order
                       (event_id) and event-time order per key — 1.0 means
                       in-order; the drop quantifies stream disorder
x233 lateness quantiles per-key exact p50/p99 of event-time lateness
                       behind the running maximum — the number you size
                       withWatermark() with

Scale shapes: x231 is posexplode + two (label, dim)-keyed aggregations.
x232/x233 are window passes keyed by entity; quantiles come from exact
rank positions, not approx sketches.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x231: within-cluster cohesion ------------------------------------------

_X231_FMT = """
    WITH dims AS (
      SELECT label, vec_id, d.pos AS p,
             CAST(ROUND(CAST(d.x AS DOUBLE), 6) AS DECIMAL(12,6)) AS xq
      FROM ({dim_src}) d
    ),
    cent AS (
      SELECT label, p,
             CAST(ROUND(CAST(SUM(xq) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(12,6)) AS cq
      FROM dims GROUP BY label, p
    ),
    dist AS (
      SELECT d.label, d.vec_id,
             SUM((d.xq - c.cq) * (d.xq - c.cq)) AS d2
      FROM dims d JOIN cent c ON d.label = c.label AND d.p = c.p
      GROUP BY d.label, d.vec_id
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(FLOOR(1e6 * (CAST(SUM(d2) AS DOUBLE) / COUNT(*))) AS BIGINT)
             AS mean_d2_micro
    FROM dist GROUP BY label ORDER BY label
"""

register_sql(
    "x231_cluster_cohesion",
    spark_sql=_X231_FMT.format(
        dim_src=(
            "SELECT label, vec_id, posexplode(embedding) AS (pos, x) FROM embeddings"
        )
    ),
    duckdb_sql=_X231_FMT.format(
        dim_src=(
            "SELECT label, vec_id, CAST(u.i - 1 AS BIGINT) AS pos, u.x FROM embeddings, "
            "LATERAL (SELECT UNNEST(embedding) AS x, "
            "GENERATE_SUBSCRIPTS(embedding, 1) AS i) u"
        )
    ),
    tags=("embedding", "curation"),
)

# -- x232: arrival-vs-event-time Spearman -----------------------------------

_X232_BODY = """
    WITH r AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rk_arr,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk_time
      FROM events
    ),
    agg AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((rk_arr - rk_time) * (rk_arr - rk_time)) AS BIGINT) AS sum_d2
      FROM r GROUP BY user_id
    )
    SELECT user_id, n, sum_d2,
           CAST(FLOOR(1e6 * (1.0 - (6.0 * sum_d2)
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * n - 1)))) AS BIGINT)
             AS spearman_micro
    FROM agg WHERE n > 1 ORDER BY user_id LIMIT 300
"""

register_sql(
    "x232_order_disorder",
    spark_sql=_X232_BODY,
    duckdb_sql=_X232_BODY,
    tags=("streaming", "stats", "window"),
)

# -- x233: lateness quantiles (watermark sizing) ----------------------------

_X233_FMT = """
    WITH a AS (
      SELECT user_id, event_id, {epoch} AS es,
             MAX({epoch}) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS mx
      FROM events
    ),
    l AS (SELECT user_id, event_id, mx - es AS late FROM a),
    r AS (
      SELECT user_id, late,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY late, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM l
    )
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(MAX(late) AS BIGINT) AS max_late_s,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.50 * n) AS BIGINT) THEN late END) AS BIGINT) AS p50_late_s,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(0.99 * n) AS BIGINT) THEN late END) AS BIGINT) AS p99_late_s
    FROM r GROUP BY user_id ORDER BY user_id LIMIT 300
"""

register_sql(
    "x233_lateness_quantiles",
    spark_sql=_X233_FMT.format(epoch="unix_seconds(ts)"),
    duckdb_sql=_X233_FMT.format(epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"),
    tags=("streaming", "window"),
)
