"""Wave 104 (x393–x396): daily-bar volatility & tick-size estimators.

Range-based volatility — the OHLC complement to wave 101's trade-only
spread tier.  A daily high/low pair carries ~5× the variance
information of a close-to-close return (Parkinson 1980), and these
estimators are what a desk runs when it has bars but not ticks:

x393 — Parkinson: σ²_P = (1/(4·ln 2))·mean(ln(H/L)²).
x394 — Garman-Klass: σ²_GK = mean(½·ln(H/L)² − (2ln2−1)·ln(C/O)²),
adding the open/close information to the range.
x395 — Corwin-Schultz (2012) high-low spread: β from two consecutive
days' squared log-ranges, γ from the two-day envelope's squared
log-range, α = (√(2β)−√β)/(3−2√2) − √(γ/(3−2√2)), S = 2(eᵅ−1)/(1+eᵅ)
— the bid-ask spread recovered from bars alone, the OHLC cousin of
x384's Roll estimator.  Negative α (common in quiet samples) is
clamped at 0 per the paper's recommendation.

x396 — effective-tick / price-clustering profile: the share of prices
landing on 10/100/1000/10000-micro grids.  A real price feed clusters
on its tick grid; uniform shares ≈ 1/10 per level, so excess share
reveals the effective tick size — pure integer modular counts, the
cheapest data-quality probe for a price column.

Exactness: OHLC selections are DECIMAL-exact min/max/first/last; each
per-day (or per-day-pair) log term is ONE IEEE expression on exact
inputs, quantized to a 1e12-scaled BIGINT before any cross-day mean
(x321 discipline), so aggregation order cannot perturb results.  The
final estimator formulas are per-row scalars.  All four ride one
(sym, day) aggregation of the tick scan — the same OHLCV shuffle shape
as q32/x153.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_DAILY_FMT = """
    ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, CAST(ts AS DATE) AS d,
             CAST(MAX(px) AS DOUBLE) AS h,
             CAST(MIN(px) AS DOUBLE) AS l,
             CAST({open_px} AS DOUBLE) AS o,
             CAST({close_px} AS DOUBLE) AS c
      FROM ticks GROUP BY sym, CAST(ts AS DATE)
    )
"""

_SPARK_OC = {
    "open_px": "CAST(min_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
    "close_px": "CAST(max_by(px, struct(ts, event_id)) AS DECIMAL(18,6))",
}
_DUCK_OC = {
    "open_px": "CAST(first(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
    "close_px": "CAST(last(px ORDER BY ts, event_id) AS DECIMAL(18,6))",
}

# -- x393: Parkinson ------------------------------------------------------------

_X393_TAIL = """
    , terms AS (
      SELECT sym,
             CAST(FLOOR(LN(h / l) * LN(h / l) * 1e12) AS BIGINT) AS t_fp
      FROM daily WHERE l > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(CAST(SUM(CAST(t_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                 AS DOUBLE) / COUNT(*) / 1e12 / (4 * LN(2)), 10)
             AS parkinson_var
    FROM terms GROUP BY sym ORDER BY sym
"""

register_sql(
    "x393_parkinson_vol",
    spark_sql="WITH " + _DAILY_FMT.format(**_SPARK_OC) + _X393_TAIL,
    duckdb_sql="WITH " + _DAILY_FMT.format(**_DUCK_OC) + _X393_TAIL,
    tags=("finance", "volatility"),
)

# -- x394: Garman-Klass ---------------------------------------------------------

_X394_TAIL = """
    , terms AS (
      SELECT sym,
             CAST(FLOOR((0.5 * LN(h / l) * LN(h / l)
                         - (2 * LN(2) - 1) * LN(c / o) * LN(c / o)) * 1e12)
                  AS BIGINT) AS t_fp
      FROM daily WHERE l > 0 AND o > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(CAST(SUM(CAST(t_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                 AS DOUBLE) / COUNT(*) / 1e12, 10) AS garman_klass_var
    FROM terms GROUP BY sym ORDER BY sym
"""

register_sql(
    "x394_garman_klass_vol",
    spark_sql="WITH " + _DAILY_FMT.format(**_SPARK_OC) + _X394_TAIL,
    duckdb_sql="WITH " + _DAILY_FMT.format(**_DUCK_OC) + _X394_TAIL,
    tags=("finance", "volatility"),
)

# -- x395: Corwin-Schultz high-low spread --------------------------------------

_X395_TAIL = """
    , pairs AS (
      SELECT sym,
             h, l,
             LAG(h) OVER (PARTITION BY sym ORDER BY d) AS h0,
             LAG(l) OVER (PARTITION BY sym ORDER BY d) AS l0
      FROM daily
    ),
    terms AS (
      SELECT sym,
             CAST(FLOOR((LN(h0 / l0) * LN(h0 / l0)
                         + LN(h / l) * LN(h / l)) * 1e12) AS BIGINT) AS beta_fp,
             CAST(FLOOR(LN(GREATEST(h, h0) / LEAST(l, l0))
                        * LN(GREATEST(h, h0) / LEAST(l, l0)) * 1e12)
                  AS BIGINT) AS gamma_fp
      FROM pairs WHERE h0 IS NOT NULL AND l0 > 0 AND l > 0
    ),
    m AS (
      SELECT sym,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(CAST(SUM(CAST(beta_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) / COUNT(*) / 1e12 AS beta,
             CAST(CAST(SUM(CAST(gamma_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) / COUNT(*) / 1e12 AS gamma
      FROM terms GROUP BY sym
    ),
    alpha AS (
      SELECT sym, n_pairs, beta, gamma,
             GREATEST(0.0,
               (SQRT(2 * beta) - SQRT(beta)) / (3 - 2 * SQRT(2.0))
               - SQRT(gamma / (3 - 2 * SQRT(2.0)))) AS a
      FROM m
    )
    SELECT CAST(sym AS BIGINT) AS sym, n_pairs,
           ROUND(beta, 10) AS beta,
           ROUND(gamma, 10) AS gamma,
           ROUND(2 * (EXP(a) - 1) / (1 + EXP(a)), 8) AS cs_spread
    FROM alpha ORDER BY sym
"""

register_sql(
    "x395_corwin_schultz",
    spark_sql="WITH " + _DAILY_FMT.format(**_SPARK_OC) + _X395_TAIL,
    duckdb_sql="WITH " + _DAILY_FMT.format(**_DUCK_OC) + _X395_TAIL,
    tags=("finance", "microstructure"),
)

# -- x396: effective-tick / price-clustering profile ---------------------------

_X396 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym,
             CAST(ROUND((100 + (value - FLOOR(value)) * 10) * 1000000, 0)
                  AS BIGINT) AS px_micro
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT sym,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN px_micro % 10 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS on_10,
             CAST(SUM(CASE WHEN px_micro % 100 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS on_100,
             CAST(SUM(CASE WHEN px_micro % 1000 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS on_1000,
             CAST(SUM(CASE WHEN px_micro % 10000 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS on_10000
      FROM ticks GROUP BY sym
    )
    SELECT sym, n, on_10, on_100, on_1000, on_10000,
           ROUND(CAST(on_10 AS DOUBLE) / n, 6) AS share_10,
           ROUND(CAST(on_100 AS DOUBLE) / n, 6) AS share_100,
           -- implied effective tick: the coarsest grid holding > 2x its
           -- uniform expectation (integer comparison: 10*on_k > 2*n)
           CASE WHEN on_10000 * 10000 > 2 * n * 1000 THEN 10000
                WHEN on_1000 * 1000 > 2 * n * 100 THEN 1000
                WHEN on_100 * 100 > 2 * n * 10 THEN 100
                WHEN on_10 * 10 > 2 * n THEN 10
                ELSE 1 END AS implied_tick_micro
    FROM counts ORDER BY sym
"""

register_sql(
    "x396_effective_tick",
    spark_sql=_X396,
    duckdb_sql=_X396,
    tags=("finance", "quality"),
)
