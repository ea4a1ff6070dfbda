"""Twenty-seventh extension wave — financial time-series analytics over the
tick-shaped `events` table (user_id ≈ instrument, value ≈ price), the
reference's own domain (docs/…系統設計文件.md K-bar/replay workloads are the
ingest side; these are the research queries run on top of that data).

All five are pure Spark SQL — window functions and one join, no UDFs — so
Catalyst plans them and whole-stage codegen runs them. Hash-stability
discipline (same as queries.py): every float accumulation happens in
DECIMAL (exact, order-free), per-row double math (LN, /, ROUND) is
IEEE-identical across engines, and unbounded float MIN/MAX are order-free
by definition. Scale shape: everything partitions by instrument
(PARTITION BY user_id → one hash exchange, then per-key sequential window
work); the beta/market join broadcasts the tiny per-hour market relation.

x182 max drawdown        running-peak window + order-free MIN of p/peak-1
x183 realized volatility LAG log-returns, decimal moment sums
x184 beta vs market      per-hour returns joined to the equal-weight index
x185 lead-lag xcorr      top-2 instruments, integer hour-key offset join
x186 bollinger bands     trailing-20 decimal moment sums + breach flag
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x182: maximum drawdown per instrument ---------------------------------
# peak is a running decimal MAX (exact); drawdown p/peak-1 is one per-row
# double division; the final MIN over doubles is order-independent.

_X182_BODY = """
    WITH px AS (
      SELECT user_id, ts, event_id, CAST(value AS DECIMAL(14,4)) AS p FROM events
      WHERE value > 0
    ),
    runs AS (
      SELECT user_id, p,
             MAX(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS peak
      FROM px
    )
    SELECT user_id,
           ROUND(MIN(CAST(p AS DOUBLE) / CAST(peak AS DOUBLE) - 1), 6) AS max_drawdown,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(CAST(MAX(peak) AS DOUBLE), 4) AS peak_px
    FROM runs GROUP BY user_id
    ORDER BY max_drawdown, user_id LIMIT 200
"""

register_sql(
    "x182_max_drawdown",
    headline=True,
    spark_sql=_X182_BODY,
    duckdb_sql=_X182_BODY,
    tags=("finance", "window"),
)

# -- x183: realized volatility ---------------------------------------------
# Log returns are per-row double math (LAG + / + LN), quantized to 7 dp and
# accumulated as exact decimal moment sums; the sample-variance combine at
# the end is a handful of double ops on exact inputs — engine-identical.

_X183_BODY = """
    WITH rets AS (
      SELECT user_id,
             CAST(ROUND(LN(value / LAG(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id)), 7) AS DECIMAL(18,7)) AS r
      FROM events WHERE value > 0
    )
    SELECT user_id,
           CAST(COUNT(r) AS BIGINT) AS n_rets,
           ROUND(SQRT((CAST(SUM(r * r) AS DOUBLE)
                       - CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE) / COUNT(r))
                      / (COUNT(r) - 1)), 6) AS vol,
           ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(r), 6) AS mean_ret
    FROM rets WHERE r IS NOT NULL
    GROUP BY user_id HAVING COUNT(r) > 1
    ORDER BY user_id LIMIT 200
"""

register_sql(
    "x183_realized_vol",
    spark_sql=_X183_BODY,
    duckdb_sql=_X183_BODY,
    tags=("finance", "window"),
)

# -- x184: beta vs the equal-weight market ---------------------------------
# Hour key is integer epoch//3600 (dialects differ only in the epoch
# accessor). Per-hour last price picks MAX_BY(value, event_id) — a total
# order, so deterministic. The market return is the cross-sectional mean,
# re-quantized to DECIMAL(18,7) so the covariance sums stay exact.
#
# r13: the Spark side attaches the market mean with a window PARTITION BY h
# over the non-null returns instead of the original GROUP BY h + self-join
# (kept as the DuckDB oracle): CTE inlining re-ran the whole
# scan→groupBy(user,h)→LAG subtree for the mkt branch (plan showed 2 parquet
# scans + 2 Window passes; guide §2.4 "remove shuffles outright"). SUM(r)
# and COUNT(*) over the hour partition equal mkt's aggregates exactly (both
# run over the same non-null row set, DECIMAL sums are order-free), and the
# inner join on h matched every non-null row, so the row set is unchanged.
# Partition size = instruments per hour — the same bound the old GROUP BY h
# had. Plan after: 1 scan, 4 exchanges (was 2 scans, 6 exchanges).

_X184_FMT = """
    WITH hp AS (
      SELECT user_id, {hourkey} AS h, MAX_BY(value, event_id) AS px
      FROM events WHERE value > 0 GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, h,
             CAST(ROUND(px / NULLIF(LAG(px) OVER (PARTITION BY user_id ORDER BY h), 0) - 1, 7)
                  AS DECIMAL(19,7)) AS r
      FROM hp
    ),
    mkt AS (
      SELECT h, CAST(ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*), 7) AS DECIMAL(19,7)) AS mr
      FROM r WHERE r IS NOT NULL GROUP BY h
    ),
    j AS (
      SELECT r.user_id, r.r, m.mr FROM r JOIN mkt m ON r.h = m.h WHERE r.r IS NOT NULL
    ),
    a AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r * mr) AS DOUBLE) AS sxy,
             CAST(SUM(r) AS DOUBLE) AS sx, CAST(SUM(mr) AS DOUBLE) AS sy,
             CAST(SUM(mr * mr) AS DOUBLE) AS syy
      FROM j GROUP BY user_id
    )
    SELECT user_id, n, ROUND((n * sxy - sx * sy) / (n * syy - sy * sy), 6) AS beta
    FROM a WHERE n > 10
    ORDER BY user_id LIMIT 200
"""

_X184_SPARK = """
    WITH hp AS (
      SELECT user_id, {hourkey} AS h, MAX_BY(value, event_id) AS px
      FROM events WHERE value > 0 GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, h,
             CAST(ROUND(px / NULLIF(LAG(px) OVER (PARTITION BY user_id ORDER BY h), 0) - 1, 7)
                  AS DECIMAL(19,7)) AS r
      FROM hp
    ),
    j AS (
      SELECT user_id, r,
             CAST(ROUND(CAST(SUM(r) OVER (PARTITION BY h) AS DOUBLE)
                        / COUNT(*) OVER (PARTITION BY h), 7) AS DECIMAL(19,7)) AS mr
      FROM r WHERE r IS NOT NULL
    ),
    a AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r * mr) AS DOUBLE) AS sxy,
             CAST(SUM(r) AS DOUBLE) AS sx, CAST(SUM(mr) AS DOUBLE) AS sy,
             CAST(SUM(mr * mr) AS DOUBLE) AS syy
      FROM j GROUP BY user_id
    )
    SELECT user_id, n, ROUND((n * sxy - sx * sy) / (n * syy - sy * sy), 6) AS beta
    FROM a WHERE n > 10
    ORDER BY user_id LIMIT 200
"""

register_sql(
    "x184_beta",
    spark_sql=_X184_SPARK.format(hourkey="CAST(FLOOR(unix_seconds(ts) / 3600) AS BIGINT)"),
    duckdb_sql=_X184_FMT.format(hourkey="CAST(FLOOR(epoch(ts) / 3600) AS BIGINT)"),
    headline=True,
    tags=("finance", "join"),
)

# -- x185: lead-lag cross-correlation --------------------------------------
# The two most active instruments (rank computed in-query — no fixture
# constants, so the key is well-defined at every SF), hourly returns,
# Pearson correlation at offsets -2..2 hours via an integer hour-key join.

_X185_FMT = """
    WITH counts AS (
      SELECT user_id, COUNT(*) AS nev FROM events GROUP BY user_id
    ),
    top2 AS (
      SELECT user_id, rk FROM (
        SELECT user_id, ROW_NUMBER() OVER (ORDER BY nev DESC, user_id) AS rk FROM counts
      ) ranked WHERE rk <= 2
    ),
    hp AS (
      SELECT t.rk, {hourkey} AS h, MAX_BY(e.value, e.event_id) AS px
      FROM events e JOIN top2 t ON e.user_id = t.user_id
      WHERE e.value > 0 GROUP BY 1, 2
    ),
    r AS (
      SELECT rk, h,
             CAST(ROUND(px / NULLIF(LAG(px) OVER (PARTITION BY rk ORDER BY h), 0) - 1, 7)
                  AS DECIMAL(19,7)) AS r
      FROM hp
    ),
    lags AS (SELECT CAST(l AS BIGINT) AS lag FROM (VALUES (-2), (-1), (0), (1), (2)) AS t(l)),
    j AS (
      SELECT g.lag, a.r AS ra, b.r AS rb
      FROM r a JOIN lags g ON a.rk = 1
      JOIN r b ON b.rk = 2 AND b.h = a.h + g.lag
      WHERE a.r IS NOT NULL AND b.r IS NOT NULL
    ),
    agg AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ra * rb) AS DOUBLE) AS sab,
             CAST(SUM(ra) AS DOUBLE) AS sa, CAST(SUM(rb) AS DOUBLE) AS sb,
             CAST(SUM(ra * ra) AS DOUBLE) AS saa, CAST(SUM(rb * rb) AS DOUBLE) AS sbb
      FROM j GROUP BY lag
    )
    SELECT lag, n,
           ROUND((n * sab - sa * sb)
                 / (SQRT(n * saa - sa * sa) * SQRT(n * sbb - sb * sb)), 6) AS xcorr
    FROM agg WHERE n > 2
    ORDER BY lag
"""

register_sql(
    "x185_lead_lag_corr",
    spark_sql=_X185_FMT.format(hourkey="CAST(FLOOR(unix_seconds(e.ts) / 3600) AS BIGINT)"),
    duckdb_sql=_X185_FMT.format(hourkey="CAST(FLOOR(epoch(e.ts) / 3600) AS BIGINT)"),
    tags=("finance", "join"),
)

# -- x186: Bollinger bands + breach flag -----------------------------------
# Trailing-20 moment sums in decimal (exact under any frame evaluation
# order); mid/σ derived per-row in doubles. Emits only full frames.

_X186_BODY = """
    WITH px AS (
      SELECT user_id, ts, event_id, CAST(value AS DECIMAL(14,4)) AS p FROM events
    ),
    w AS (
      SELECT user_id, event_id, p,
             SUM(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s,
             SUM(p * p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s2,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n
      FROM px
    ),
    b AS (
      SELECT user_id, event_id, CAST(p AS DOUBLE) AS px,
             CAST(s AS DOUBLE) / n AS mid,
             SQRT(GREATEST((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                           / (n - 1), 0)) AS sd
      FROM w WHERE n = 20
    )
    SELECT user_id, event_id, ROUND(px, 4) AS px,
           ROUND(mid, 4) AS mid,
           ROUND(mid - 2 * sd, 4) AS lo,
           ROUND(mid + 2 * sd, 4) AS hi,
           CAST(CASE WHEN px > mid + 2 * sd OR px < mid - 2 * sd THEN 1 ELSE 0 END AS INT) AS breach
    FROM b ORDER BY user_id, event_id LIMIT 500
"""

register_sql(
    "x186_bollinger",
    spark_sql=_X186_BODY,
    duckdb_sql=_X186_BODY,
    tags=("finance", "window"),
)
