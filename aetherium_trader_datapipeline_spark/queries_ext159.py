"""Wave 159 (x546–x548): business decompositions & index numbers.

x546 — merchandise return rates across the star schema: lineitem
return flags rolled up through customer → nation, with revenue at
risk — the returns dashboard cut the x81–x110 shapes never produce.

x547 — mix-shift decomposition: the overall purchase-rate change
between the first and second half-month split EXACTLY into mix effect
(segment weights moved) and rate effect (within-segment rates moved)
via the standard two-term identity Δ = Σ w₁(r₂−r₁) + Σ r₁(w₂−w₁) +
interaction — the "why did the topline move" table; every term an
exact integer cross-product over counts.

x548 — price index numbers: Laspeyres (base-weighted), Paasche
(current-weighted) and Fisher (geometric mean) indices between the two
half-months, from per-part mean prices and quantities in exact DECIMAL
sums — the index-number machinery behind every inflation series,
exercised on the part catalog.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x546: return rate by nation --------------------------------------------------------------

_X546 = """
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS returned_lines,
           ROUND(CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS return_rate,
           ROUND(CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                               THEN CAST(l.l_extendedprice
                                         AS DECIMAL(18,2))
                               ELSE 0 END) AS DOUBLE), 2)
             AS revenue_at_risk
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY nation
"""

register_sql(
    "x546_return_rate_by_nation",
    spark_sql=_X546,
    duckdb_sql=_X546,
    tags=("warehouse", "join"),
)

# -- x547: mix-shift decomposition ------------------------------------------------------------------

_X547 = """
    WITH halves AS (
      SELECT event_type,
             CASE WHEN {day} <= 15 THEN 1 ELSE 2 END AS half,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events
    ),
    seg AS (
      -- segment = user cohort by id band; rate = purchase share inside
      SELECT CASE WHEN {day} <= 15 THEN 1 ELSE 2 END AS half,
             user_id % 4 AS segment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM events
      GROUP BY CASE WHEN {day} <= 15 THEN 1 ELSE 2 END, user_id % 4
    ),
    tot AS (
      SELECT half, CAST(SUM(n) AS BIGINT) AS n_half
      FROM seg GROUP BY half
    ),
    shaped AS (
      SELECT s.segment,
             MAX(CASE WHEN s.half = 1 THEN CAST(s.n AS DOUBLE) / t.n_half
                 END) AS w1,
             MAX(CASE WHEN s.half = 2 THEN CAST(s.n AS DOUBLE) / t.n_half
                 END) AS w2,
             MAX(CASE WHEN s.half = 1 THEN CAST(s.k AS DOUBLE) / s.n END)
               AS r1,
             MAX(CASE WHEN s.half = 2 THEN CAST(s.k AS DOUBLE) / s.n END)
               AS r2
      FROM seg s JOIN tot t ON s.half = t.half
      GROUP BY s.segment
    ),
    terms AS (
      -- 1e12-quantized per-segment terms so the 4-row sums are exact
      SELECT segment,
             CAST(FLOOR(w1 * (r2 - r1) * 1e12) AS BIGINT) AS rate_fp,
             CAST(FLOOR(r1 * (w2 - w1) * 1e12) AS BIGINT) AS mix_fp,
             CAST(FLOOR((w2 - w1) * (r2 - r1) * 1e12) AS BIGINT)
               AS interaction_fp,
             w1, w2, r1, r2
      FROM shaped
    )
    SELECT CAST(segment AS BIGINT) AS segment,
           ROUND(r1, 6) AS rate_h1, ROUND(r2, 6) AS rate_h2,
           ROUND(w1, 6) AS weight_h1, ROUND(w2, 6) AS weight_h2,
           ROUND(rate_fp / 1e12, 9) AS rate_effect,
           ROUND(mix_fp / 1e12, 9) AS mix_effect,
           ROUND(CAST(SUM(rate_fp + mix_fp + interaction_fp) OVER ()
                      AS DOUBLE) / 1e12, 9) AS total_delta
    FROM terms ORDER BY segment
"""

register_sql(
    "x547_mix_shift_decomposition",
    spark_sql=_X547.format(day="dayofmonth(ts)"),
    duckdb_sql=_X547.format(day="CAST(EXTRACT(day FROM ts) AS BIGINT)"),
    tags=("events", "stats"),
)

# -- x548: price indices ---------------------------------------------------------------------------

_X548 = """
    WITH priced AS (
      SELECT l_partkey,
             CASE WHEN {month} <= 6 THEN 0 ELSE 1 END AS period,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS q,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM lineitem
      GROUP BY l_partkey, CASE WHEN {month} <= 6 THEN 0 ELSE 1 END
    ),
    both_periods AS (
      SELECT p0.l_partkey,
             CAST(p0.q AS DOUBLE) AS q0, CAST(p1.q AS DOUBLE) AS q1,
             CAST(p0.rev AS DOUBLE) / CAST(p0.q AS DOUBLE) AS price0,
             CAST(p1.rev AS DOUBLE) / CAST(p1.q AS DOUBLE) AS price1
      FROM priced p0 JOIN priced p1
        ON p0.l_partkey = p1.l_partkey
       AND p0.period = 0 AND p1.period = 1
      WHERE p0.q > 0 AND p1.q > 0
    ),
    sums AS (
      -- the four index numerator/denominator sums, 1e6-quantized per
      -- part before summation
      SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(CAST(FLOOR(price1 * q0 * 1e6) AS BIGINT))
                  AS BIGINT) AS p1q0,
             CAST(SUM(CAST(FLOOR(price0 * q0 * 1e6) AS BIGINT))
                  AS BIGINT) AS p0q0,
             CAST(SUM(CAST(FLOOR(price1 * q1 * 1e6) AS BIGINT))
                  AS BIGINT) AS p1q1,
             CAST(SUM(CAST(FLOOR(price0 * q1 * 1e6) AS BIGINT))
                  AS BIGINT) AS p0q1
      FROM both_periods
    )
    SELECT n_parts,
           ROUND(CAST(p1q0 AS DOUBLE) / p0q0, 6) AS laspeyres,
           ROUND(CAST(p1q1 AS DOUBLE) / p0q1, 6) AS paasche,
           ROUND(SQRT((CAST(p1q0 AS DOUBLE) / p0q0)
                      * (CAST(p1q1 AS DOUBLE) / p0q1)), 6) AS fisher
    FROM sums
"""

register_sql(
    "x548_price_indices",
    spark_sql=_X548.format(month="month(l_shipdate)"),
    duckdb_sql=_X548.format(
        month="CAST(EXTRACT(month FROM l_shipdate) AS BIGINT)"
    ),
    tags=("warehouse", "stats"),
)
