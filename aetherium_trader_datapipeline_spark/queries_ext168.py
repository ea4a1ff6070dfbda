"""Wave 168 (x570–x572): survey-design, privacy-distance, and
unseen-mass estimators.

x570 — intra-cluster correlation + design effect: the number a
sampling plan needs BEFORE choosing user-level (cluster) sampling over
event-level sampling (x332/x411 pick strata; this prices the cluster
shortcut).  One-way ANOVA decomposition over user clusters on the
purchase indicator — per-cluster sums are exact integers, the
S_c²/n_c terms are 1e9-quantized before the cross-cluster sum, and
the unequal-size correction m0 = (N − Σn_c²/N)/(k−1) is the standard
Kish form.  DEFF = 1 + (m0−1)·ICC and the effective sample size N/DEFF
are what the plan actually consumes.

x571 — t-closeness over the ordinal sensitive attribute: for each
customer-nation QI group, the ordered-EMD between the group's
order-priority distribution and the global one:
EMD = Σ_i |cum_g(i)/n_g − cum(i)/N| / (k−1).  Each cumulative
difference keeps the integer numerator |cum_g·N − cum·n_g| (the
rational-cross-product trick from x412), so the hash is exact.
Extends the release-audit ladder k-anonymity (x312) → l-diversity
(x330) with the distance tier.

x572 — Good–Turing frequency spectrum over word BIGRAM types (the
unigram vocabulary of the synthetic corpus is closed — no type occurs
≤10 times, an empty spectrum): N_r = number of bigram types occurring
exactly r times; the Turing discount r* = (r+1)·N_{r+1}/N_r for
r ≤ 10 and the unseen-probability mass p0 = N_1/N.  The spectrum join
is a self left-join on r+1 (gaps at high r yield NULL r*, as the
estimator requires).  The smoothing counterpart of Heaps' law (x306)
and exactly the discount a KN/Katz bigram LM (x156) would consume.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x570: ICC + design effect for user-cluster sampling -------------------------

_X570 = """
    WITH ev AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    clusters AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(y) AS BIGINT) AS s_c
      FROM ev GROUP BY user_id
    ),
    tots AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_c) AS BIGINT) AS n,
             CAST(SUM(s_c) AS BIGINT) AS s,
             CAST(SUM(n_c * n_c) AS BIGINT) AS sum_nsq,
             -- sum over clusters of S_c^2/n_c, 1e9-quantized per term
             CAST(SUM(CAST(FLOOR(CAST(s_c AS DOUBLE) * s_c / n_c * 1e9)
                           AS BIGINT)) AS BIGINT) AS ssb_fp
      FROM clusters
    ),
    anova AS (
      -- y is 0/1 so sum(y^2) = s; SST = s - s^2/n
      SELECT k, n, s,
             ssb_fp / 1e9 - CAST(s AS DOUBLE) * s / n AS ssb,
             CAST(s AS DOUBLE) - ssb_fp / 1e9 AS ssw,
             (CAST(n AS DOUBLE) - CAST(sum_nsq AS DOUBLE) / n) / (k - 1)
               AS m0
      FROM tots
    ),
    est AS (
      SELECT k, n, m0,
             ssb / (k - 1) AS msb,
             ssw / (n - k) AS msw
      FROM anova
    )
    SELECT k AS n_clusters, n AS n_events,
           ROUND(m0, 6) AS avg_cluster_size,
           ROUND((msb - msw) / (msb + (m0 - 1) * msw), 6) AS icc,
           ROUND(1 + (m0 - 1) * (msb - msw) / (msb + (m0 - 1) * msw), 6)
             AS deff,
           CAST(FLOOR(CAST(n AS DOUBLE)
                      / (1 + (m0 - 1) * (msb - msw)
                             / (msb + (m0 - 1) * msw))) AS BIGINT)
             AS effective_n
    FROM est
"""

register_sql(
    "x570_design_effect_icc",
    spark_sql=_X570,
    duckdb_sql=_X570,
    tags=("sampling", "stats"),
)

# -- x571: t-closeness of order priority within customer nations -----------------

_X571 = """
    WITH joined AS (
      SELECT c.c_nationkey AS nation,
             CAST(SUBSTRING(o.o_orderpriority, 1, 1) AS BIGINT) AS sens
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    pern AS (
      -- the sensitive attribute is the FIXED 5-level o_orderpriority
      -- ordinal ('1-URGENT'..'5-LOW'), so the dense (nation x level)
      -- grid is a fixed-arity pivot — one groupBy, no grid join. The
      -- r6 form cross-joined two keyed aggregates (distinct nations x
      -- per-level totals): bounded in fact (25 x 5) but planned as a
      -- BNLJ the audit cannot prove bounded (VERDICT r6 ask #1).
      SELECT nation,
             CAST(SUM(CASE WHEN sens = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN sens = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN sens = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
             CAST(SUM(CASE WHEN sens = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
             CAST(SUM(CASE WHEN sens = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
             CAST(COUNT(*) AS BIGINT) AS n_g
      FROM joined GROUP BY nation
    ),
    gdist AS (
      -- scalar aggregate: the global distribution + the count of levels
      -- actually present (matches the r6 grid, which spanned only
      -- globally present levels)
      SELECT CAST(SUM(c1) AS BIGINT) AS g1, CAST(SUM(c2) AS BIGINT) AS g2,
             CAST(SUM(c3) AS BIGINT) AS g3, CAST(SUM(c4) AS BIGINT) AS g4,
             CAST(SUM(c5) AS BIGINT) AS g5,
             CAST(SUM(n_g) AS BIGINT) AS n_tot,
             CAST(CASE WHEN SUM(c1) > 0 THEN 1 ELSE 0 END
                + CASE WHEN SUM(c2) > 0 THEN 1 ELSE 0 END
                + CASE WHEN SUM(c3) > 0 THEN 1 ELSE 0 END
                + CASE WHEN SUM(c4) > 0 THEN 1 ELSE 0 END
                + CASE WHEN SUM(c5) > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS k_levels
      FROM pern
    ),
    emd AS (
      -- integer numerator sum over present levels: |cum_g*N - cum*n_g|;
      -- a globally absent level contributed no grid row in the r6 form,
      -- so gate each term on its global count
      SELECT p.nation, p.n_g, g.n_tot, g.k_levels,
             CASE WHEN g.g1 > 0 THEN ABS(p.c1 * g.n_tot - g.g1 * p.n_g)
                  ELSE 0 END
           + CASE WHEN g.g2 > 0 THEN ABS(
                 (p.c1 + p.c2) * g.n_tot - (g.g1 + g.g2) * p.n_g)
                  ELSE 0 END
           + CASE WHEN g.g3 > 0 THEN ABS(
                 (p.c1 + p.c2 + p.c3) * g.n_tot
                 - (g.g1 + g.g2 + g.g3) * p.n_g) ELSE 0 END
           + CASE WHEN g.g4 > 0 THEN ABS(
                 (p.c1 + p.c2 + p.c3 + p.c4) * g.n_tot
                 - (g.g1 + g.g2 + g.g3 + g.g4) * p.n_g) ELSE 0 END
           + CASE WHEN g.g5 > 0 THEN ABS(
                 (p.c1 + p.c2 + p.c3 + p.c4 + p.c5) * g.n_tot
                 - (g.g1 + g.g2 + g.g3 + g.g4 + g.g5) * p.n_g)
                  ELSE 0 END AS num
      FROM pern p CROSS JOIN gdist g
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(n_g AS BIGINT) AS group_size,
           ROUND(CAST(num AS DOUBLE)
                 / (CAST(n_g AS DOUBLE) * n_tot * (k_levels - 1)), 6)
             AS t_closeness,
           ROUND(MAX(CAST(num AS DOUBLE)
                     / (CAST(n_g AS DOUBLE) * n_tot * (k_levels - 1)))
                 OVER (), 6) AS max_t,
           CASE WHEN CAST(num AS DOUBLE)
                     / (CAST(n_g AS DOUBLE) * n_tot * (k_levels - 1))
                     < 0.2
                THEN 1 ELSE 0 END AS passes_t02
    FROM emd ORDER BY nation
"""

register_sql(
    "x571_t_closeness",
    spark_sql=_X571,
    duckdb_sql=_X571,
    tags=("privacy",),
)

# -- x572: Good–Turing frequency spectrum ----------------------------------------

_X572_FMT = """
    WITH words AS (
      SELECT w FROM ({words}) t WHERE w != ''
    ),
    types AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM words GROUP BY w
    ),
    spectrum AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM types GROUP BY r
    ),
    tot AS (
      SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens,
             CAST(SUM(n_r) AS BIGINT) AS n_types,
             CAST(MAX(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT)
               AS n1
      FROM spectrum
    )
    SELECT s.r, s.n_r,
           s1.n_r AS n_r_plus1,
           CASE WHEN s1.n_r IS NOT NULL THEN
             ROUND((CAST(s.r AS DOUBLE) + 1) * s1.n_r / s.n_r, 6)
           END AS r_star,
           ROUND(CAST(t.n1 AS DOUBLE) / t.n_tokens, 6) AS p0_unseen,
           t.n_tokens, t.n_types
    FROM spectrum s
    LEFT JOIN spectrum s1 ON s1.r = s.r + 1
    CROSS JOIN tot t
    WHERE s.r <= 10
    ORDER BY s.r
"""

_WORDS_SPARK = """
      -- size(ws) >= 2 guard: for a 1-token document Spark's
      -- sequence(1, 0) is the DESCENDING [1, 0] (ws[-1] indexing —
      -- NULL-filtered in non-ANSI mode, an error under ANSI) while
      -- DuckDB's generate_series(1, 0) is empty; filter the short
      -- documents out before the explode so both engines agree
      SELECT concat(ws[i - 1], ' ', ws[i]) AS w
      FROM (SELECT ws
            FROM (SELECT split(lower(text), ' ') AS ws FROM documents)
            WHERE size(ws) >= 2) d
      LATERAL VIEW explode(sequence(1, size(ws) - 1)) t AS i
      WHERE ws[i - 1] != '' AND ws[i] != ''
"""
_WORDS_DUCK = """
      SELECT ws[i] || ' ' || ws[i + 1] AS w
      FROM (SELECT string_split(lower(text), ' ') AS ws FROM documents) d,
      LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE ws[i] != '' AND ws[i + 1] != ''
"""

register_sql(
    "x572_good_turing",
    spark_sql=_X572_FMT.format(words=_WORDS_SPARK),
    duckdb_sql=_X572_FMT.format(words=_WORDS_DUCK),
    tags=("text", "curation"),
)
