"""Wave 105 (x397–x400): association rules, compaction planning,
expected shortfall, drawdown duration.

x397 — association rules over per-(user, day) event-kind baskets:
support / confidence / lift for every ordered kind pair with minimum
support.  The retail market-basket classic applied to behavioral event
data (which kinds co-occur in a user-day?); distinct from x165's
TRANSITION matrix (temporal adjacency) — this is set co-occurrence.
Counts are exact integers off two groupBys and one self-join on the
basket key; ratios are per-row IEEE, rounded.

x398 — small-file compaction planner: given a file manifest (synthesized
per (orderdate-month, shard) from lineitem sizes — the real input would
be a parquet listing), assign files to 128 MB target bins via
running-sum fill (cumulative bytes DIV target within each partition) and
report per-bin file counts/bytes and the small-file reduction factor.
The OPTIMIZE/compaction planning pass every lakehouse runs; pure window
arithmetic, integer-exact.

x399 — expected shortfall (CVaR 95): the mean of the worst 5% of
per-minute returns, selected by exact integer rank (k = ceil(n/20),
the floor convention documented in-query), summed as 1e9-quantized
BIGINTs.  The coherent tail-risk measure that x103's median and x65's
percentiles don't cover — ES is what margin models actually use.

x400 — drawdown DURATION: the longest time-underwater spell per symbol
(ticks since the running maximum last changed), the temporal companion
to x182's max-drawdown DEPTH.  Running max + gaps-and-islands on the
at-peak flag, all integer/DECIMAL-exact.

All four are scan + window/groupBy shapes; nothing shuffles wider than
its grouping key.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x397: association rules ----------------------------------------------------

_X397 = """
    WITH baskets AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type AS kind
      FROM events WHERE event_type IS NOT NULL
    ),
    n_baskets AS (
      SELECT COUNT(*) AS nb FROM (SELECT DISTINCT user_id, d FROM baskets)
    ),
    kind_supp AS (
      SELECT kind, CAST(COUNT(*) AS BIGINT) AS supp
      FROM baskets GROUP BY kind
    ),
    pair_supp AS (
      SELECT a.kind AS kind_a, b.kind AS kind_b,
             CAST(COUNT(*) AS BIGINT) AS supp_ab
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.d = b.d AND a.kind <> b.kind
      GROUP BY a.kind, b.kind
    )
    SELECT p.kind_a, p.kind_b, p.supp_ab,
           sa.supp AS supp_a, sb.supp AS supp_b,
           ROUND(CAST(p.supp_ab AS DOUBLE) / nb.nb, 6) AS support,
           ROUND(CAST(p.supp_ab AS DOUBLE) / sa.supp, 6) AS confidence,
           ROUND(CAST(p.supp_ab AS DOUBLE) * nb.nb
                 / (CAST(sa.supp AS DOUBLE) * sb.supp), 6) AS lift
    FROM pair_supp p
    JOIN kind_supp sa ON sa.kind = p.kind_a
    JOIN kind_supp sb ON sb.kind = p.kind_b
    CROSS JOIN n_baskets nb
    WHERE p.supp_ab * 100 >= nb.nb
    ORDER BY kind_a, kind_b
"""

register_sql(
    "x397_association_rules",
    spark_sql=_X397,
    duckdb_sql=_X397,
    tags=("analytics", "join"),
)

# -- x398: compaction planner ---------------------------------------------------
# file manifest: one "file" per (month, l_orderkey % 8) with size = sum
# of row widths (integer bytes); target bin = 128 MB (scaled down 1000x
# for the fixture: 131072 bytes) per partition (month).

_X398_FMT = """
    WITH manifest AS (
      SELECT {month_of} AS part, l_orderkey % 8 AS shard,
             CAST(SUM(16 + l_quantity) AS BIGINT) AS bytes
      FROM lineitem GROUP BY 1, 2
    ),
    planned AS (
      SELECT part, shard, bytes,
             CAST((SUM(bytes) OVER (PARTITION BY part ORDER BY shard
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - bytes) {intdiv} 131072 AS BIGINT) AS bin
      FROM manifest
    )
    SELECT part, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes
    FROM planned GROUP BY part, bin
    ORDER BY part, bin
"""

register_sql(
    "x398_compaction_plan",
    spark_sql=_X398_FMT.format(
        month_of="date_format(o_orderdate, 'yyyy-MM')", intdiv="DIV"
    ).replace("FROM lineitem", "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"),
    duckdb_sql=_X398_FMT.format(
        month_of="strftime(o_orderdate, '%Y-%m')", intdiv="//"
    ).replace("FROM lineitem", "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"),
    tags=("ops", "window"),
)

# -- x399: expected shortfall (CVaR 95) ----------------------------------------

_X399 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    rets AS (
      SELECT sym,
             CAST(FLOOR((CAST(px AS DOUBLE)
                         / CAST(LAG(px) OVER (PARTITION BY sym
                             ORDER BY ts, event_id) AS DOUBLE) - 1) * 1e9)
                  AS BIGINT) AS r_nano
      FROM ticks
    ),
    ranked AS (
      SELECT sym, r_nano,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY r_nano) AS rk,
             COUNT(*) OVER (PARTITION BY sym) AS n
      FROM rets WHERE r_nano IS NOT NULL
    )
    -- worst k = floor(n/20) returns (5% tail, floor convention; k >= 1
    -- guaranteed at every driver SF)
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(MAX(n) AS BIGINT) AS n_rets,
           CAST(COUNT(*) AS BIGINT) AS k_tail,
           ROUND(CAST(CAST(SUM(CAST(r_nano AS DECIMAL(18,0)))
                 AS DECIMAL(38,0)) AS DOUBLE) / COUNT(*) / 1e9, 8)
             AS es_95,
           ROUND(CAST(MAX(r_nano) AS DOUBLE) / 1e9, 8) AS var_95
    FROM ranked WHERE rk * 20 <= n
    GROUP BY sym ORDER BY sym
"""

register_sql(
    "x399_expected_shortfall",
    spark_sql=_X399,
    duckdb_sql=_X399,
    tags=("finance", "risk"),
)

# -- x400: drawdown duration ----------------------------------------------------

_X400 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    runmax AS (
      SELECT sym, ts, event_id, px,
             MAX(px) OVER (PARTITION BY sym ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM ticks
    ),
    flagged AS (
      SELECT sym,
             CASE WHEN px < peak THEN 1 ELSE 0 END AS under,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY sym,
                   CASE WHEN px < peak THEN 1 ELSE 0 END
                   ORDER BY ts, event_id) AS grp
      FROM runmax
    ),
    spells AS (
      SELECT sym, grp, CAST(COUNT(*) AS BIGINT) AS spell_len
      FROM flagged WHERE under = 1 GROUP BY sym, grp
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_spells,
           CAST(MAX(spell_len) AS BIGINT) AS longest_underwater,
           CAST(SUM(spell_len) AS BIGINT) AS total_underwater
    FROM spells GROUP BY sym ORDER BY sym
"""

register_sql(
    "x400_drawdown_duration",
    spark_sql=_X400,
    duckdb_sql=_X400,
    tags=("finance", "window"),
)
