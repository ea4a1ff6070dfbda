"""Wave 112 (x409–x411): training-run planning — scaling-law fits,
data-constrained token budgets, labeling allocation.

The planning math a data team runs BEFORE spending compute, expressed
as engine-exact SQL over the corpus tables:

x409 — power-law scaling fit: per source domain, synthesize a
deterministic loss curve L(N) = c0 + A·N^(−α) over a geometric token
grid (the curve parameters derive from the domain's own doc/char
statistics, so domains differ), then recover α and ln A by exact
least squares on (ln N, ln(L − c0)) — the x101 linreg discipline:
per-point logs are single IEEE expressions quantized to 1e12 BIGINTs
before the moment sums, so the normal equations are exact integers.
Reports fitted vs true α side by side (they agree to the quantization
— the oracle proves the FIT machinery, not the synthetic curve).

x410 — data-constrained effective tokens (Muennighoff et al. 2023):
with unique tokens U per domain (n_chars/4) and a global budget of
5× total corpus tokens allocated uniformly, epochs E = B_d/U; the
value of repeated data decays as D_eff = U·(1 + r·(1 − e^{−(E−1)/r}))
with r = 4 repeat half-lives.  Flags domains where E exceeds the
4-epoch knee.  Per-domain scalars, one IEEE expression each.

x411 — Neyman allocation for a labeling budget: sampling n_h ∝ N_h·S_h
per stratum minimizes the estimator variance under a fixed label
budget.  Strata = source domains; S_h = per-domain std of doc length
(the DECIMAL-exact moment sums of x59); the allocation and its
rounding (largest-remainder, x351's discipline) are integer-exact,
with the proportional-allocation baseline alongside — the measurable
win of optimal allocation.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x409: power-law scaling fit ------------------------------------------------

_X409 = """
    WITH dom AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    params AS (
      -- domain-derived curve: alpha in [0.2, 0.44], amplitude from size
      SELECT source,
             0.2 + (n_docs % 5) * 0.06 AS alpha_true,
             5.0 + (chars % 97) * 0.1 AS amp,
             1.8 AS c0
      FROM dom
    ),
    grid AS (
      SELECT source, alpha_true, amp, c0,
             CAST(POWER(2.0, 10 + 2 * g) AS DOUBLE) AS n_tokens
      FROM params {unnest_g}
    ),
    pts AS (
      SELECT source, alpha_true,
             CAST(FLOOR(LN(n_tokens) * 1e12) AS BIGINT) AS x_fp,
             CAST(FLOOR(LN(amp * POWER(n_tokens, -alpha_true)) * 1e12)
                  AS BIGINT) AS y_fp
      FROM grid
    ),
    moms AS (
      SELECT source, alpha_true,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x_fp AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y_fp AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x_fp AS DECIMAL(18,0)) * x_fp) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(x_fp AS DECIMAL(18,0)) * y_fp) AS DECIMAL(38,0))
               AS sxy
      FROM pts GROUP BY source, alpha_true
    )
    SELECT source,
           ROUND(CAST(alpha_true AS DOUBLE), 6) AS alpha_true,
           ROUND(-(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)), 6) AS alpha_fit,
           ROUND(CAST(sy AS DOUBLE) / n / 1e12
                 - (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                   * CAST(sx AS DOUBLE) / n / 1e12, 6) AS ln_amp_fit,
           CAST(n AS BIGINT) AS n_points
    FROM moms ORDER BY source
"""

register_sql(
    "x409_scaling_law_fit",
    spark_sql=_X409.format(
        unnest_g="LATERAL VIEW explode(sequence(0, 9)) t AS g"
    ),
    duckdb_sql=_X409.format(unnest_g=", UNNEST(range(0, 10)) AS t(g)"),
    tags=("planning", "stats"),
)

# -- x410: data-constrained effective tokens -----------------------------------

_X410 = """
    WITH dom AS (
      -- {intdiv}: plain '/' is float division in both engines and the
      -- BIGINT cast rounds in DuckDB but truncates in Spark (the x390
      -- lesson) — integer division keeps both exact
      SELECT source,
             CAST(SUM(n_chars) AS BIGINT) {intdiv} 4 AS unique_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT source, unique_tokens,
             5 * SUM(unique_tokens) OVER () {intdiv} COUNT(*) OVER ()
               AS budget_d
      FROM dom
    ),
    eff AS (
      SELECT source, unique_tokens, budget_d,
             CAST(budget_d AS DOUBLE) / unique_tokens AS epochs
      FROM tot WHERE unique_tokens > 0
    )
    SELECT source,
           CAST(unique_tokens AS BIGINT) AS unique_tokens,
           CAST(budget_d AS BIGINT) AS budget_tokens,
           ROUND(epochs, 4) AS epochs,
           CAST(ROUND(
             unique_tokens
             * (1 + 4.0 * (1 - EXP(-GREATEST(epochs - 1, 0.0) / 4.0))), 0)
             AS BIGINT) AS effective_tokens,
           CASE WHEN epochs > 5 THEN 1 ELSE 0 END AS past_repeat_knee
    FROM eff ORDER BY source
"""

register_sql(
    "x410_data_constrained_tokens",
    spark_sql=_X410.format(intdiv="DIV"),
    duckdb_sql=_X410.format(intdiv="//"),
    tags=("planning", "curation"),
)

# -- x411: Neyman labeling allocation ------------------------------------------

_X411 = """
    WITH strata AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(n_chars AS DECIMAL(18,0)) * n_chars)
                  AS DECIMAL(38,0)) AS s2
      FROM documents GROUP BY source
    ),
    scored AS (
      -- N_h * S_h in 1e6-quantized integer space; population std
      SELECT source, n_h,
             CAST(FLOOR(n_h * SQRT(GREATEST(
               CAST(s2 AS DOUBLE) / n_h
               - (CAST(s1 AS DOUBLE) / n_h) * (CAST(s1 AS DOUBLE) / n_h),
               0.0)) * 1e6) AS BIGINT) AS ns_fp
      FROM strata
    ),
    alloc AS (
      SELECT source, n_h, ns_fp,
             SUM(ns_fp) OVER () AS tot_fp,
             SUM(n_h) OVER () AS n_total
      FROM scored
    ),
    raw AS (
      -- budget = 1000 labels; largest-remainder rounding (x351)
      SELECT source, n_h,
             1000 * ns_fp {intdiv} tot_fp AS base,
             (1000 * ns_fp) % tot_fp AS rem,
             1000 * n_h {intdiv} n_total AS proportional
      FROM alloc
    ),
    ranked AS (
      SELECT source, n_h, base, proportional,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr,
             1000 - SUM(base) OVER () AS leftover
      FROM raw
    )
    SELECT source, CAST(n_h AS BIGINT) AS stratum_docs,
           CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS neyman_labels,
           CAST(proportional AS BIGINT) AS proportional_labels
    FROM ranked ORDER BY source
"""

register_sql(
    "x411_neyman_allocation",
    spark_sql=_X411.format(intdiv="DIV"),
    duckdb_sql=_X411.format(intdiv="//"),
    tags=("planning", "stats"),
)
