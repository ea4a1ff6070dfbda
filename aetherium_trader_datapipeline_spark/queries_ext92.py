"""Wave 92 (x360–x362): timeout sweep, power-law fit, seasonal anomalies.

x360 — sessionization TIMEOUT sensitivity: session counts under gap
thresholds 60 s–3600 s, from ONE lag pass.  The identity that makes the
sweep free: sessions(t) per user = 1 + #(gaps > t), so after one sorted
gap computation every threshold is a conditional count — the x348 sweep
pattern applied to the sessionizer's one free parameter.  Choosing a
timeout from a single run is folklore; this is the evidence table.

x361 — discrete power-law exponent via the Hill/MLE estimator
α ≈ 1 + n / Σ ln(f/(fmin−½)) over token frequencies ≥ fmin: the
quantitative companion to the Zipf rank plot (x273) and the Heaps curve
(x306) — natural text sits near α ≈ 2; big departures flag synthetic
or boilerplate-heavy corpora.  Per-token log terms are quantized to
1e9 fixed-point before the cross-token sum (x340's discipline); the
estimate itself is one exact division on two scalars.

x362 — seasonal-baseline anomaly detection: per-symbol HOUR-OF-DAY
volume baselines (mean + variance over the 30-day history, DECIMAL-
exact), then each (sym, day, hour) cell is flagged when its volume
exceeds baseline + 3σ.  This is the operational "is today weird for
3 pm?" monitor — the seasonal upgrade of the flat 3-sigma stream
operator (anomaly.py), sharing its integer discipline: all moments
exact, the only doubles are per-cell threshold comparisons.  Leave-one-
out baselines (excluding the judged day) keep a single huge spike from
masking itself — the same leakage argument as x325, applied to ops.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x360: session timeout sweep -----------------------------------------------

_X360_FMT = """
    WITH ev AS (
      SELECT user_id, {epoch_us} AS t
      FROM events
    ),
    gaps AS (
      SELECT user_id,
             t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS gap_us
      FROM ev
    ),
    users AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ev),
    sweep AS (
      SELECT CAST(thr_s AS BIGINT) AS thr_s,
             CAST(SUM(CASE WHEN g.gap_us > CAST(thr_s AS BIGINT) * 1000000
                           THEN 1 ELSE 0 END)
               AS BIGINT) AS n_breaks
      FROM gaps g CROSS JOIN (VALUES (60), (300), (900), (1800), (3600)) v(thr_s)
      WHERE g.gap_us IS NOT NULL
      GROUP BY thr_s
    )
    SELECT s.thr_s,
           CAST(u.n_users + s.n_breaks AS BIGINT) AS n_sessions,
           s.n_breaks,
           ROUND(CAST(u.n_users + s.n_breaks AS DOUBLE) / u.n_users, 4)
             AS sessions_per_user
    FROM sweep s CROSS JOIN users u ORDER BY s.thr_s
"""

register_sql(
    "x360_session_timeout_sweep",
    spark_sql=_X360_FMT.format(epoch_us="unix_micros(ts)"),
    duckdb_sql=_X360_FMT.format(epoch_us="epoch_us(ts)"),
    tags=("sessionize", "audit"),
)

# -- x361: power-law MLE on token frequencies ----------------------------------

_X361_FMT = """
    WITH toks AS (
      SELECT tok FROM (
        SELECT {unnest_tok} AS tok FROM documents
      ) t WHERE tok <> ''
    ),
    freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY tok
    ),
    tail AS (
      SELECT f FROM freq WHERE f >= 5
    ),
    terms AS (
      SELECT CAST(FLOOR(LN(CAST(f AS DOUBLE) / 4.5) * 1e9) AS BIGINT) AS lt
      FROM tail
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tail_tokens,
           ROUND(1 + CAST(COUNT(*) AS DOUBLE)
                 / (CAST(CAST(SUM(CAST(lt AS DECIMAL(18,0))) AS DECIMAL(38,0))
                         AS DOUBLE) / 1e9), 4) AS alpha_mle
    FROM terms
"""

register_sql(
    "x361_powerlaw_mle",
    spark_sql=_X361_FMT.format(unnest_tok="explode(split(lower(text), ' '))"),
    duckdb_sql=_X361_FMT.format(unnest_tok="unnest(string_split(lower(text), ' '))"),
    tags=("textops", "stats"),
)

# -- x362: seasonal-baseline anomaly flags -------------------------------------
# Leave-one-out baseline per (sym, hour): mean/var over the OTHER days'
# cells. Sums are DECIMAL-exact; LOO mean/var from (S - x), (Q - x²).

_X362_FMT = """
    WITH cells AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d, {hour_of} AS h,
             CAST(SUM(CAST(ABS(value) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS vol
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id % 10, CAST(ts AS DATE), {hour_of}
    ),
    base AS (
      SELECT sym, h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vol) AS DECIMAL(38,6)) AS s,
             CAST(SUM(vol * vol) AS DECIMAL(38,6)) AS q
      FROM cells GROUP BY sym, h
    ),
    judged AS (
      SELECT c.sym, c.d, c.h, c.vol, b.n,
             (CAST(b.s AS DOUBLE) - CAST(c.vol AS DOUBLE)) / (b.n - 1) AS loo_mean,
             (CAST(b.q AS DOUBLE) - CAST(c.vol AS DOUBLE) * CAST(c.vol AS DOUBLE))
               / (b.n - 1)
               - POW((CAST(b.s AS DOUBLE) - CAST(c.vol AS DOUBLE)) / (b.n - 1), 2)
               AS loo_var
      FROM cells c JOIN base b ON c.sym = b.sym AND c.h = b.h
      WHERE b.n > 1
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(CASE WHEN CAST(vol AS DOUBLE)
                              > loo_mean + 3 * SQRT(GREATEST(loo_var, 0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM judged GROUP BY sym ORDER BY sym
"""

register_sql(
    "x362_seasonal_anomaly",
    spark_sql=_X362_FMT.format(hour_of="HOUR(ts)"),
    duckdb_sql=_X362_FMT.format(hour_of="CAST(extract('hour' FROM ts) AS INT)"),
    tags=("quality", "finance"),
)
