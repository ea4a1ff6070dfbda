"""Forty-fifth extension wave — operational calendar/bitmap/Pareto
analytics:

x236 business days   business-day (Mon-Fri) lag between order and ship
                     dates per priority — closed-form whole-weeks + day-of
                     -week remainder arithmetic, all integer
x237 hour coverage   per-user 24-bit hour-of-day activity bitmap via
                     BIT_OR aggregation + popcount — the bitwise-aggregate
                     rollup pattern (mergeable, fixed width)
x238 pareto 80/20    smallest part-count prefix covering 80% of revenue —
                     cumulative-share crossing over the ranked parts

Scale shapes: x236/x238 aggregate per part/order first; x237's bitmap is
one BIGINT per user whatever the event count (the mergeable fixed-width
summary posture, like the HLL registers).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x236: business-day lag --------------------------------------------------
# bdays between d0 (exclusive) and d1 (inclusive), Mon-Fri: whole weeks
# contribute 5 each; the remainder walks day-of-week slots. dow shim: 0=Mon
# here (Spark weekday(); DuckDB isodow-1) so the remainder CASE is shared.

_X236_FMT = """
    WITH lg AS (
      SELECT o.o_orderpriority AS priority, l.l_orderkey AS okey,
             l.l_linenumber AS lnum,
             CAST({datediff} AS BIGINT) AS cal_days,
             CAST({dow0} AS BIGINT) AS dow0
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    rem AS (
      SELECT priority, okey, lnum, MAX(cal_days) AS cal_days,
             CAST(SUM(CASE WHEN i.i < cal_days % 7
                            AND ((dow0 + 1 + i.i) % 7) < 5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS rem_bdays
      FROM lg CROSS JOIN {seq7} i
      GROUP BY priority, okey, lnum
    ),
    b AS (
      SELECT priority,
             5 * CAST(FLOOR(cal_days / 7.0) AS BIGINT) + rem_bdays AS bdays
      FROM rem
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bdays) AS BIGINT) AS total_bdays,
           CAST(FLOOR(1e3 * (CAST(SUM(bdays) AS DOUBLE) / COUNT(*))) AS BIGINT)
             AS mean_bdays_milli
    FROM b GROUP BY priority ORDER BY priority
"""

register_sql(
    "x236_business_days",
    spark_sql=_X236_FMT.format(
        datediff="DATEDIFF(l.l_shipdate, o.o_orderdate)",
        dow0="WEEKDAY(o.o_orderdate)",
        seq7="(SELECT explode(sequence(0, 6)) AS i)",
    ),
    duckdb_sql=_X236_FMT.format(
        datediff="datediff('day', o.o_orderdate, l.l_shipdate)",
        dow0="isodow(o.o_orderdate) - 1",
        seq7="(SELECT UNNEST(generate_series(0, 6)) AS i)",
    ),
    tags=("calendar", "join"),
)

# -- x237: hour-of-day coverage bitmap --------------------------------------

_X237_FMT = """
    WITH h AS (
      SELECT user_id,
             {shl} AS bit
      FROM events
    ),
    bm AS (
      SELECT user_id, BIT_OR(bit) AS hours_bitmap FROM h GROUP BY user_id
    )
    SELECT user_id, CAST(hours_bitmap AS BIGINT) AS hours_bitmap,
           CAST({popcnt} AS BIGINT) AS hours_active
    FROM bm ORDER BY user_id LIMIT 300
"""

register_sql(
    "x237_hour_coverage",
    spark_sql=_X237_FMT.format(
        shl="SHIFTLEFT(CAST(1 AS BIGINT), CAST(HOUR(ts) AS INT))",
        popcnt="BIT_COUNT(hours_bitmap)",
    ),
    duckdb_sql=_X237_FMT.format(
        shl="(CAST(1 AS BIGINT) << CAST(EXTRACT(hour FROM ts) AS INT))",
        popcnt="BIT_COUNT(hours_bitmap)",
    ),
    tags=("bitwise", "agg"),
)

# -- x238: Pareto 80/20 ------------------------------------------------------

_X238_BODY = """
    WITH pr AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    bounds AS (SELECT MIN(r) AS lo, MAX(r) AS hi FROM pr),
    chunked AS (
      -- value-range chunking (x198/x498 family): ck ascends as r
      -- DESCENDS, so (ck, r DESC, pk) is the original total order; the
      -- rank/cumsum windows run PARTITIONED by the <=1000-chunk id
      -- instead of pushing every part through one task (the x442 class)
      SELECT p.pk, p.r,
             CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST(FLOOR(CAST(b.hi - p.r AS DOUBLE) * 1000
                                        / CAST(b.hi - b.lo AS DOUBLE))
                                  AS BIGINT), CAST(999 AS BIGINT)) END AS ck
      FROM pr p CROSS JOIN bounds b
    ),
    wrk AS (
      SELECT ck, pk, r,
             ROW_NUMBER() OVER (PARTITION BY ck ORDER BY r DESC, pk) AS r_in,
             SUM(r) OVER (PARTITION BY ck ORDER BY r DESC, pk
                          ROWS UNBOUNDED PRECEDING) AS cum_in
      FROM chunked
    ),
    per_chunk AS (
      SELECT ck, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(r) AS DECIMAL(38,4)) AS src
      FROM chunked GROUP BY ck
    ),
    offs AS (
      -- prefix offsets over the <=1000-row chunk grid; global rank and
      -- cumulative revenue reconstruct exactly (DECIMAL addition)
      SELECT ck,
             COALESCE(SUM(c) OVER (ORDER BY ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS BIGINT)) AS cnt_off,
             COALESCE(SUM(src) OVER (ORDER BY ck
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(38,4))) AS rev_off,
             SUM(src) OVER () AS tot_r,
             SUM(c) OVER () AS n_parts
      FROM per_chunk
    ),
    ranked AS (
      SELECT w.pk, w.r,
             o.cnt_off + w.r_in AS rk,
             o.rev_off + w.cum_in AS cum_r,
             o.tot_r, o.n_parts
      FROM wrk w JOIN offs o ON w.ck = o.ck
    ),
    hit AS (
      -- explicit BIGINT: DuckDB's window SUM widens to HUGEINT
      SELECT CAST(MIN(rk) AS BIGINT) AS k_parts,
             CAST(MAX(n_parts) AS BIGINT) AS n_parts
      FROM ranked WHERE CAST(cum_r AS DOUBLE) >= 0.8 * CAST(tot_r AS DOUBLE)
    )
    SELECT k_parts, n_parts,
           CAST(FLOOR(1e6 * (CAST(k_parts AS DOUBLE) / n_parts)) AS BIGINT)
             AS part_fraction_micro
    FROM hit
"""

register_sql(
    "x238_pareto_8020",
    spark_sql=_X238_BODY,
    duckdb_sql=_X238_BODY,
    tags=("olap", "window"),
)
