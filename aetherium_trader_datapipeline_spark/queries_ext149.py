"""Wave 149 (x516–x518): reliability engineering, queueing SLOs, and
behavioral entropy rate.

x516 — Weibull fit by median-rank regression on the inter-error gaps
(the failure-time series the reference's supervision loop observes):
ln(−ln(1−F̂)) against ln(t) with Bernard's median-rank approximation
F̂ = (i−0.3)/(n+0.4); the slope is the Weibull shape (β < 1 infant
mortality, β ≈ 1 memoryless, β > 1 wear-out) and the MTBF follows.
Exact rank selection; per-point logs 1e9-quantized into the x101
linreg moments.

x517 — M/M/1 wait-time SLOs: measured arrival rate λ per event type,
service rates at utilizations {0.5, 0.8}; the p95 sojourn
−ln(0.05)/(μ−λ) and queue length λ²/(μ(μ−λ)) — the capacity table for
sizing a consumer against the measured stream.  Closed form over exact
counts.

x518 — Markov entropy rate of user behavior: the event-type transition
chain (x165's transitions) with empirical state frequencies as the
stationary weights, H = −Σ_i π̂_i Σ_j p_ij ln p_ij — how predictable
the next action is (bits/event); the session-structure counterpart of
x471's character-level entropy.  Per-cell terms 1e12-quantized over a
25-cell sum.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x516: Weibull median-rank regression -----------------------------------------------------

_X516 = """
    WITH ets AS (
      -- The inter-error gap multiset (consecutive pairs in (ts,event_id)
      -- order, zero gaps dropped by et > prev_et) equals the multiset of
      -- consecutive DISTINCT epoch-second diffs: a run of equal ets
      -- contributes exactly one transition to the next distinct value.
      -- That lets the sequence scan drop the global LAG over the raw
      -- event stream (single task over the whole table — the x442
      -- class): adjacent diffs run per-day in parallel, and only the
      -- O(days) per-day bounds cross one task for boundary handoff.
      SELECT DISTINCT {epoch} AS et
      FROM events WHERE event_type = 'error'
    ),
    bucketed AS (SELECT et, et {intdiv} 86400 AS b FROM ets),
    intra AS (
      SELECT et - LAG(et) OVER (PARTITION BY b ORDER BY et) AS len
      FROM bucketed
    ),
    day_bounds AS (
      SELECT b, MIN(et) AS first_et, MAX(et) AS last_et
      FROM bucketed GROUP BY b
    ),
    crossb AS (
      SELECT first_et - LAG(last_et) OVER (ORDER BY b) AS len
      FROM day_bounds
    ),
    gaps AS (
      SELECT CAST(len AS BIGINT) AS t
      FROM (SELECT len FROM intra WHERE len IS NOT NULL
            UNION ALL
            SELECT len FROM crossb WHERE len IS NOT NULL) u
    ),
    ranked AS (
      SELECT t,
             ROW_NUMBER() OVER (ORDER BY t) AS i,
             COUNT(*) OVER () AS n
      FROM gaps
    ),
    pts AS (
      -- x = ln t ; y = ln(-ln(1 - (i-0.3)/(n+0.4))), both 1e9-quantized
      SELECT CAST(FLOOR(LN(CAST(t AS DOUBLE)) * 1e9) AS BIGINT) AS x,
             CAST(FLOOR(LN(-LN(1 - (i - 0.3) / (n + 0.4))) * 1e9)
                  AS BIGINT) AS y
      FROM ranked
    ),
    moms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(18,0)) * y) AS DECIMAL(38,0)) AS sxy
      FROM pts
    )
    SELECT n AS n_failures,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS weibull_shape,
           -- scale: exp(-intercept/shape), intercept = (Sy - b*Sx)/n
           ROUND(EXP(-((CAST(sy AS DOUBLE)
                        - (CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE))
                          * CAST(sx AS DOUBLE)) / n / 1e9)
                     / (CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE))), 2)
             AS weibull_scale_s,
           CASE WHEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) < 0.95
                  THEN 'infant_mortality'
                WHEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) > 1.05
                  THEN 'wear_out'
                ELSE 'memoryless' END AS failure_regime
    FROM moms WHERE n * sxx - sx * sx > 0
"""

register_sql(
    "x516_weibull_reliability",
    spark_sql=_X516.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X516.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("stats", "streaming"),
)

# -- x517: M/M/1 wait SLOs ----------------------------------------------------------------------

_X517 = """
    WITH traffic AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX({epoch}) - MIN({epoch}) AS BIGINT) AS span_s
      FROM events GROUP BY event_type
    ),
    utils AS (
      SELECT CAST(0.5 AS DOUBLE) AS rho
      UNION ALL SELECT CAST(0.8 AS DOUBLE)
    )
    SELECT t.event_type, u.rho AS target_utilization,
           ROUND(CAST(t.n AS DOUBLE) / t.span_s, 6) AS lambda_per_s,
           ROUND(CAST(t.n AS DOUBLE) / t.span_s / u.rho, 6)
             AS required_mu_per_s,
           -- M/M/1 p95 sojourn: -ln(0.05)/(mu - lambda)
           ROUND(-LN(0.05)
                 / (CAST(t.n AS DOUBLE) / t.span_s / u.rho
                    - CAST(t.n AS DOUBLE) / t.span_s), 4)
             AS p95_sojourn_s,
           -- mean queue length Lq = rho^2/(1-rho)
           ROUND(u.rho * u.rho / (1 - u.rho), 4) AS mean_queue_len
    FROM traffic t CROSS JOIN utils u
    ORDER BY t.event_type, target_utilization
"""

register_sql(
    "x517_mm1_wait_slo",
    spark_sql=_X517.format(epoch="unix_seconds(ts)"),
    duckdb_sql=_X517.format(epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"),
    tags=("planning", "streaming"),
)

# -- x518: Markov entropy rate --------------------------------------------------------------------

_X518 = """
    WITH hops AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS a,
             event_type AS b
      FROM events
    ),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM hops WHERE a IS NOT NULL GROUP BY a, b
    ),
    rows_ AS (
      SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM cells GROUP BY a
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    terms AS (
      -- pi_hat(a) * p(b|a) * -ln p(b|a), one IEEE expr per cell,
      -- 1e12-quantized over the <=25-cell sum
      SELECT CAST(FLOOR(-(CAST(r.ra AS DOUBLE) / t.n)
                        * (CAST(c.c AS DOUBLE) / r.ra)
                        * LN(CAST(c.c AS DOUBLE) / r.ra) * 1e12)
                  AS BIGINT) AS h_fp
      FROM cells c JOIN rows_ r ON c.a = r.a CROSS JOIN tot t
    )
    SELECT ROUND(CAST(SUM(h_fp) AS DOUBLE) / 1e12, 6)
             AS entropy_rate_nats,
           ROUND(CAST(SUM(h_fp) AS DOUBLE) / 1e12 / LN(2.0), 6)
             AS entropy_rate_bits,
           ROUND(LN(5.0), 6) AS max_possible_nats
    FROM terms
"""

register_sql(
    "x518_markov_entropy_rate",
    spark_sql=_X518,
    duckdb_sql=_X518,
    tags=("events", "stats"),
)
