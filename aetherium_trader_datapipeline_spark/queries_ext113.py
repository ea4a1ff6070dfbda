"""Wave 113 (x412–x414): classical two-sample / independence tests.

The drift-detection battery PSI (x320) belongs to: before retraining on
a new corpus slice, a data team asks "did the distribution move?" with
a test that carries a p-value, not just a divergence score.

x412 — two-sample Kolmogorov–Smirnov: per source domain, split docs by
alternating doc_id blocks ((doc_id DIV 20) % 2 — plain parity is
perfectly correlated with source in the fixture layout) and compare the n_chars distributions.  D is computed
EXACTLY as max|c1·n2 − c2·n1| over the merged value grid (integer cross
products; the division by n1·n2 happens once at the end), so the oracle
hash works on integers, not float CDF steps.  The 5% rejection line is
the asymptotic c(α)·sqrt((n1+n2)/(n1·n2)) with c(0.05)=1.358.

x413 — Mann–Whitney U with tie-averaged ranks: 2×avg-rank of a tied
block is the integer (2·cum_before + t + 1), so rank sums stay in
BIGINT; U = (2R1 − n1(n1+1))/2 is exact (the numerator is provably
even).  The normal approximation uses the tie-corrected variance
n1·n2/12·((n+1) − Σ(t³−t)/(n(n−1))) — Σ(t³−t) is an exact integer sum.

x414 — chi-square independence of (source × lang): each PRESENT cell's
contribution (o·N − r·c)²/(N·r·c) is one IEEE expression over exact
integers, 1e9-quantized before the cross-cell sum; ABSENT (o=0) cells
contribute e = r·c/N each, folded in per source in closed form
r·(N − Σ_present c)/N — no dims cross join (a BNLJ whose build side
grows with dimension cardinality; the plan audit bans that shape).
Cramér's V normalizes by min(R−1, C−1).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x412: two-sample KS on per-source n_chars ----------------------------------

_X412 = """
    WITH s AS (
      SELECT source, n_chars AS v, (doc_id {intdiv} 20) % 2 AS grp
      FROM documents
    ),
    cells AS (
      SELECT source, v,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM s GROUP BY source, v
    ),
    cum AS (
      SELECT source,
             SUM(a) OVER (PARTITION BY source ORDER BY v) AS ca,
             SUM(b) OVER (PARTITION BY source ORDER BY v) AS cb,
             SUM(a) OVER (PARTITION BY source) AS n1,
             SUM(b) OVER (PARTITION BY source) AS n2
      FROM cells
    )
    SELECT source,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(MAX(ABS(ca * n2 - cb * n1)) AS BIGINT) AS d_num,
           ROUND(CAST(MAX(ABS(ca * n2 - cb * n1)) AS DOUBLE)
                 / CAST(n1 AS DOUBLE) / n2, 6) AS ks_d,
           CASE WHEN CAST(MAX(ABS(ca * n2 - cb * n1)) AS DOUBLE)
                     / CAST(n1 AS DOUBLE) / n2
                     > 1.358 * SQRT((CAST(n1 AS DOUBLE) + n2) / (CAST(n1 AS DOUBLE) * n2))
                THEN 1 ELSE 0 END AS reject_5pct
    FROM cum WHERE n1 > 0 AND n2 > 0
    GROUP BY source, n1, n2 ORDER BY source
"""

register_sql(
    "x412_ks_two_sample",
    spark_sql=_X412.format(intdiv="DIV"),
    duckdb_sql=_X412.format(intdiv="//"),
    tags=("stats", "drift"),
)

# -- x413: Mann–Whitney U with tie-averaged ranks -------------------------------

_X413 = """
    WITH s AS (
      SELECT source, n_chars AS v, (doc_id {intdiv} 20) % 2 AS grp
      FROM documents
    ),
    cells AS (
      SELECT source, v,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM s GROUP BY source, v
    ),
    ranked AS (
      SELECT source, a, t,
             SUM(t) OVER (PARTITION BY source ORDER BY v) - t AS cum_before,
             SUM(a) OVER (PARTITION BY source) AS n1,
             SUM(t) OVER (PARTITION BY source) AS n
      FROM cells
    ),
    sums AS (
      -- 2*R1 = sum over group-A members of (2*cum_before + t + 1)
      SELECT source, n1, n, n - n1 AS n2,
             CAST(SUM(a * (2 * cum_before + t + 1)) AS BIGINT) AS r1_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
      FROM ranked GROUP BY source, n1, n
    )
    SELECT source,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST((r1_x2 - n1 * (n1 + 1)) {intdiv} 2 AS BIGINT) AS u1,
           CASE WHEN tie_cubes < n * n * n - n THEN
             ROUND((CAST((r1_x2 - n1 * (n1 + 1)) {intdiv} 2 AS DOUBLE)
                    - CAST(n1 AS DOUBLE) * n2 / 2)
                   / SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
                          * ((n + 1) - CAST(tie_cubes AS DOUBLE)
                                       / (CAST(n AS DOUBLE) * (n - 1)))), 6)
           END AS z_score
    FROM sums WHERE n1 > 0 AND n2 > 0 ORDER BY source
"""

register_sql(
    "x413_mannwhitney_u",
    spark_sql=_X413.format(intdiv="DIV"),
    duckdb_sql=_X413.format(intdiv="//"),
    tags=("stats", "drift"),
)

# -- x414: chi-square independence of source × lang -----------------------------

_X414 = """
    WITH obs AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY source, lang
    ),
    ctot AS (
      SELECT lang, CAST(SUM(o) AS BIGINT) AS ctot FROM obs GROUP BY lang
    ),
    rtot AS (
      SELECT source, CAST(SUM(o) AS BIGINT) AS rtot,
             CAST(SUM(SUM(o)) OVER () AS BIGINT) AS ntot
      FROM obs GROUP BY source
    ),
    cellchi AS (
      -- present cells only: (o*N - r*c)^2 / (N*r*c) as ONE IEEE
      -- expression over exact ints, 1e9-quantized.  Absent (o=0) cells
      -- contribute e = r*c/N each; summed per source in closed form
      -- below instead of materializing a dims cross join (which would
      -- be a BNLJ whose build side grows with the dimension count).
      SELECT o.source,
             CAST(FLOOR(
               POWER(CAST(o.o * r.ntot - r.rtot * c.ctot AS DOUBLE), 2)
               / (CAST(r.ntot AS DOUBLE) * r.rtot * c.ctot) * 1e9)
               AS BIGINT) AS chi_fp,
             c.ctot
      FROM obs o
      JOIN rtot r ON o.source = r.source
      JOIN ctot c ON o.lang = c.lang
    ),
    per_source AS (
      SELECT source,
             CAST(SUM(chi_fp) AS BIGINT) AS present_fp,
             CAST(SUM(ctot) AS BIGINT) AS ctot_present
      FROM cellchi GROUP BY source
    ),
    tot AS (
      -- missing-cell mass per source: Σ_{absent langs} r*c/N
      --   = r * (N - Σ_present ctot) / N, one IEEE expression
      SELECT p.source,
             CAST(p.present_fp
                  + CAST(FLOOR(CAST(r.rtot AS DOUBLE)
                               * (r.ntot - p.ctot_present) / r.ntot * 1e9)
                         AS BIGINT) AS BIGINT) AS src_fp,
             CAST(SUM(p.present_fp
                      + CAST(FLOOR(CAST(r.rtot AS DOUBLE)
                                   * (r.ntot - p.ctot_present) / r.ntot
                                   * 1e9) AS BIGINT))
                  OVER () AS BIGINT) AS all_fp
      FROM per_source p JOIN rtot r ON p.source = r.source
    ),
    meta AS (
      -- distincts over the collapsed (source, lang) tuple grid, not the
      -- raw docs: the multi-COUNT(DISTINCT) plans as a 3x row EXPAND of
      -- its input, and the grid is contingency-table-sized (r12)
      SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS nc,
             CAST(SUM(c) AS BIGINT) AS n
      FROM (SELECT source, lang, COUNT(*) AS c
            FROM documents GROUP BY source, lang) tg
    )
    SELECT t.source,
           ROUND(t.src_fp / 1e9, 6) AS chi2_contrib,
           ROUND(t.all_fp / 1e9, 6) AS chi2_total,
           CAST((m.nr - 1) * (m.nc - 1) AS BIGINT) AS dof,
           ROUND(SQRT(t.all_fp / 1e9
                      / (CAST(m.n AS DOUBLE)
                         * LEAST(m.nr - 1, m.nc - 1))), 6) AS cramers_v
    FROM tot t CROSS JOIN meta m ORDER BY t.source
"""

register_sql(
    "x414_chi2_independence",
    spark_sql=_X414,
    duckdb_sql=_X414,
    tags=("stats", "drift"),
)
