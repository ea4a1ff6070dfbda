"""Wave 86 (x342–x344): robust statistics — MAD screens, winsorized means,
Theil–Sen slopes.

Classical moments (x59) shatter under the fat tails both domains here
actually have (tick data: x317 measured excess kurtosis; web text:
Zipf everything), so the robust family is pipeline equipment, not
garnish:

x342 — median-absolute-deviation outlier screen per symbol: flag ticks
with |px − median| > 5·MAD.  Both medians are exact order statistics
(MEDIAN over DECIMAL micro-prices — engine-exact selection, the x103
idiom), two grouped aggregates = two shuffles of a shrinking frame.
The honest punchline at this fixture: a uniform price distribution has
MAD ≈ range/4, so the screen flags ~nothing — the calibration a user
needs before trusting it on real fat-tailed feeds.

x343 — winsorized AND trimmed means of order totalprice per priority:
rank windows give the exact p5/p95 boundary ranks; winsorizing clamps
beyond-boundary values to the boundary ORDER STATISTIC (a selection,
engine-exact), trimming drops them; integer-cent sums throughout.  One
sort per group serves both estimators.

x344 — Theil–Sen slope (median of all pairwise slopes) of each
symbol's daily closes: the robust trend line a single flash-crash day
cannot hijack, next to the OLS forms (x101/x316).  The pair join is
bounded by the CALENDAR (30 daily closes → ≤435 pairs/sym), not by
tick volume — the n² that matters never touches row counts, which is
why the exact estimator is affordable at any corpus scale.  Slopes are
per-row doubles; the median is a selection over ≤435 of them.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x342: MAD outlier screen --------------------------------------------------

_X342 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym,
             CAST(ROUND((100 + (value - FLOOR(value)) * 10) * 1000000, 0)
               AS BIGINT) AS px_micro
      FROM events WHERE value IS NOT NULL
    ),
    med AS (
      SELECT sym, CAST(MEDIAN(px_micro) AS BIGINT) AS med_px
      FROM ticks GROUP BY sym
    ),
    dev AS (
      SELECT t.sym, t.px_micro, m.med_px,
             ABS(t.px_micro - m.med_px) AS adev
      FROM ticks t JOIN med m ON t.sym = m.sym
    ),
    mad AS (
      SELECT sym, CAST(MEDIAN(adev) AS BIGINT) AS mad_px
      FROM dev GROUP BY sym
    )
    SELECT d.sym,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(MAX(d.med_px) AS BIGINT) AS median_px_micro,
           CAST(MAX(m.mad_px) AS BIGINT) AS mad_micro,
           CAST(SUM(CASE WHEN d.adev > 5 * m.mad_px THEN 1 ELSE 0 END)
             AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.sym = m.sym
    GROUP BY d.sym ORDER BY d.sym
"""

register_sql(
    "x342_mad_outliers",
    spark_sql=_X342,
    duckdb_sql=_X342,
    tags=("quality", "stats"),
)

# -- x343: winsorized + trimmed means ------------------------------------------
# Boundary ranks: lo = ceil(0.05 n), hi = floor(0.95 n) + 1 exclusive.
# Clamp values are the order statistics AT the boundary ranks (exact
# selections carried by window max/min over rank predicates).

_X343 = """
    WITH cents AS (
      SELECT o_orderpriority AS prio,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders
    ),
    ranked AS (
      SELECT prio, v,
             ROW_NUMBER() OVER (PARTITION BY prio ORDER BY v, 1) AS r,
             COUNT(*) OVER (PARTITION BY prio) AS n
      FROM cents
    ),
    bounds AS (
      SELECT prio,
             MAX(CASE WHEN r = CAST(CEIL(0.05 * n) AS BIGINT) THEN v END) AS lo_v,
             MAX(CASE WHEN r = n - CAST(CEIL(0.05 * n) AS BIGINT) + 1 THEN v END)
               AS hi_v
      FROM ranked GROUP BY prio
    ),
    joined AS (
      SELECT r.prio, r.v, r.r, r.n, b.lo_v, b.hi_v
      FROM ranked r JOIN bounds b ON r.prio = b.prio
    )
    SELECT prio,
           CAST(MAX(n) AS BIGINT) AS n,
           ROUND(CAST(CAST(SUM(CAST(LEAST(GREATEST(v, lo_v), hi_v)
                 AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS DOUBLE)
                 / MAX(n) / 100, 4) AS winsorized_mean,
           ROUND(CAST(CAST(SUM(CASE WHEN v >= lo_v AND v <= hi_v
                                    THEN CAST(v AS DECIMAL(18,0)) END)
                 AS DECIMAL(38,0)) AS DOUBLE)
                 / SUM(CASE WHEN v >= lo_v AND v <= hi_v THEN 1 ELSE 0 END)
                 / 100, 4) AS trimmed_mean
    FROM joined GROUP BY prio ORDER BY prio
"""

register_sql(
    "x343_winsorized_mean",
    spark_sql=_X343,
    duckdb_sql=_X343,
    tags=("stats", "window"),
)

# -- x344: Theil-Sen daily trend -----------------------------------------------

_X344_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, d, {close_px} AS close_px
      FROM ticks GROUP BY sym, d
    ),
    slopes AS (
      SELECT a.sym,
             (CAST(b.close_px AS DOUBLE) - CAST(a.close_px AS DOUBLE))
               / {days_diff} AS slope
      FROM daily a JOIN daily b ON a.sym = b.sym AND a.d < b.d
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(MEDIAN(slope), 8) AS theil_sen_slope
    FROM slopes GROUP BY sym ORDER BY sym
"""

register_sql(
    "x344_theil_sen",
    spark_sql=_X344_FMT.format(
        close_px="CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
        days_diff="DATEDIFF(b.d, a.d)",
    ),
    duckdb_sql=_X344_FMT.format(
        close_px="CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
        days_diff="DATEDIFF('day', a.d, b.d)",
    ),
    tags=("finance", "stats"),
)
