"""Wave 155 (x534–x536): multi-rater agreement and the ANOVA family.

x534 — Fleiss' kappa for three raters on the embeddings labels (the
true label, the x423 hash-corrupted rater, and a second corruption with
a different hash): per-item agreement P_i = (Σ_j n_ij² − r)/(r(r−1)) is
an exact rational with r = 3, so ΣP_i stays integer-scaled; chance
agreement from exact category marginals.  Generalizes x423 (Cohen, two
raters) to the panel setting.

x535 — two-way ANOVA on value ~ event_type × 6-hour block: main-effect
and interaction sums of squares from DECIMAL-exact cell moments (the
unbalanced-design Type-I decomposition computed in the standard
cell-mean form), F statistics against the 5% critical values.  The
factorial workhorse missing between x268 (two-group t) and x453's
many-group corrections.

x536 — Levene/Brown–Forsythe variance-homogeneity test (the ANOVA
assumption x535 leans on): one-way ANOVA on |x − group mean| with
group means from exact moments and the absolute deviations
1e6-quantized — heteroscedasticity flagged before trusting pooled
variances.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x534: Fleiss' kappa -----------------------------------------------------------------

_X534 = """
    WITH rated AS (
      SELECT e.vec_id,
             e.label AS r1,
             CASE WHEN ((e.vec_id * 2654435761) {intdiv} 2048) % 10 < 2
                  THEN (e.label + 1) % k.n_classes ELSE e.label END AS r2,
             CASE WHEN ((e.vec_id * 40503) {intdiv} 512) % 10 < 3
                  THEN (e.label + 2) % k.n_classes ELSE e.label END AS r3
      FROM embeddings e
      CROSS JOIN (SELECT CAST(COUNT(DISTINCT label) AS BIGINT)
                    AS n_classes FROM embeddings) k
    ),
    per_item AS (
      -- n_ij counts per item: with 3 raters, sum over categories of
      -- n_ij^2 is 9 (all agree), 5 (two agree), 3 (all differ)
      SELECT vec_id,
             CASE WHEN r1 = r2 AND r2 = r3 THEN 9
                  WHEN r1 = r2 OR r2 = r3 OR r1 = r3 THEN 5
                  ELSE 3 END AS sum_nij_sq
      FROM rated
    ),
    agreement AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             -- P_i = (sum_nij_sq - 3) / 6 ; sum in integer sixths
             CAST(SUM(sum_nij_sq - 3) AS BIGINT) AS p_sixths
      FROM per_item
    ),
    marginals AS (
      SELECT CAST(SUM(c * c) AS DECIMAL(38,0)) AS sum_pj_sq_num,
             CAST(SUM(c) AS BIGINT) AS total_ratings
      FROM (
        SELECT cat, CAST(COUNT(*) AS BIGINT) AS c FROM (
          SELECT r1 AS cat FROM rated
          UNION ALL SELECT r2 FROM rated
          UNION ALL SELECT r3 FROM rated
        ) allr GROUP BY cat
      ) m
    )
    SELECT a.n_items,
           ROUND(CAST(a.p_sixths AS DOUBLE) / 6 / a.n_items, 6)
             AS observed_agreement,
           ROUND(CAST(m.sum_pj_sq_num AS DOUBLE)
                 / (CAST(m.total_ratings AS DOUBLE) * m.total_ratings), 6)
             AS chance_agreement,
           ROUND((CAST(a.p_sixths AS DOUBLE) / 6 / a.n_items
                  - CAST(m.sum_pj_sq_num AS DOUBLE)
                    / (CAST(m.total_ratings AS DOUBLE) * m.total_ratings))
                 / (1 - CAST(m.sum_pj_sq_num AS DOUBLE)
                        / (CAST(m.total_ratings AS DOUBLE)
                           * m.total_ratings)), 6) AS fleiss_kappa
    FROM agreement a CROSS JOIN marginals m
"""

register_sql(
    "x534_fleiss_kappa",
    spark_sql=_X534.format(intdiv="DIV"),
    duckdb_sql=_X534.format(intdiv="//"),
    tags=("eval", "stats"),
)

# -- x535: two-way ANOVA -----------------------------------------------------------------------

_X535 = """
    WITH obs AS (
      SELECT event_type AS fa, {hour} {intdiv} 6 AS fb,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT fa, fb, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(y AS DECIMAL(18,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM obs GROUP BY fa, fb
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sy) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(syy) AS DECIMAL(38,0)) AS syy,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(COUNT(DISTINCT fa) AS BIGINT) AS a_lv,
             CAST(COUNT(DISTINCT fb) AS BIGINT) AS b_lv
      FROM cells
    ),
    ssq AS (
      SELECT t.n, t.n_cells, t.a_lv, t.b_lv,
             -- total SS and cell (model) SS, exact-moment expressions
             CAST(t.syy AS DOUBLE) - CAST(t.sy AS DOUBLE) * t.sy / t.n
               AS ss_total,
             (SELECT SUM(CAST(c.sy AS DOUBLE) * c.sy / c.n) FROM cells c)
               - CAST(t.sy AS DOUBLE) * t.sy / t.n AS ss_cells,
             (SELECT SUM(CAST(a.sy AS DOUBLE) * a.sy / a.n) FROM (
                SELECT fa, CAST(SUM(n) AS BIGINT) AS n,
                       CAST(SUM(sy) AS DECIMAL(38,0)) AS sy
                FROM cells GROUP BY fa) a)
               - CAST(t.sy AS DOUBLE) * t.sy / t.n AS ss_a,
             (SELECT SUM(CAST(b.sy AS DOUBLE) * b.sy / b.n) FROM (
                SELECT fb, CAST(SUM(n) AS BIGINT) AS n,
                       CAST(SUM(sy) AS DECIMAL(38,0)) AS sy
                FROM cells GROUP BY fb) b)
               - CAST(t.sy AS DOUBLE) * t.sy / t.n AS ss_b
      FROM tot t
    )
    SELECT n AS n_obs,
           ROUND(ss_a / 1e12, 4) AS ss_event_type,
           ROUND(ss_b / 1e12, 4) AS ss_hour_block,
           ROUND((ss_cells - ss_a - ss_b) / 1e12, 4) AS ss_interaction,
           ROUND((ss_total - ss_cells) / 1e12, 4) AS ss_residual,
           ROUND((ss_a / (a_lv - 1))
                 / ((ss_total - ss_cells) / (n - n_cells)), 4) AS f_event,
           ROUND((ss_b / (b_lv - 1))
                 / ((ss_total - ss_cells) / (n - n_cells)), 4) AS f_hour,
           ROUND(((ss_cells - ss_a - ss_b)
                  / ((a_lv - 1) * (b_lv - 1)))
                 / ((ss_total - ss_cells) / (n - n_cells)), 4)
             AS f_interaction
    FROM ssq
"""

register_sql(
    "x535_two_way_anova",
    spark_sql=_X535.format(intdiv="DIV", hour="hour(ts)"),
    duckdb_sql=_X535.format(
        intdiv="//", hour="CAST(EXTRACT(hour FROM ts) AS BIGINT)"
    ),
    tags=("stats", "experiment"),
)

# -- x536: Levene / Brown-Forsythe -------------------------------------------------------------

_X536 = """
    WITH obs AS (
      SELECT event_type AS grp, CAST(FLOOR(value * 1e6) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    gmeans AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy
      FROM obs GROUP BY grp
    ),
    devs AS (
      -- z = |y - group mean|, 1e6-quantized single IEEE per row
      SELECT o.grp,
             CAST(FLOOR(ABS(o.y - CAST(g.sy AS DOUBLE) / g.n)) AS BIGINT)
               AS z
      FROM obs o JOIN gmeans g ON o.grp = g.grp
    ),
    zstats AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(z AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sz,
             CAST(SUM(CAST(z AS DECIMAL(18,0)) * z) AS DECIMAL(38,0)) AS szz
      FROM devs GROUP BY grp
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sz) AS DECIMAL(38,0)) AS sz,
             CAST(SUM(szz) AS DECIMAL(38,0)) AS szz,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM zstats
    ),
    ss AS (
      SELECT t.n, t.k,
             (SELECT SUM(CAST(z.sz AS DOUBLE) * z.sz / z.n) FROM zstats z)
               - CAST(t.sz AS DOUBLE) * t.sz / t.n AS ss_between,
             CAST(t.szz AS DOUBLE)
               - (SELECT SUM(CAST(z.sz AS DOUBLE) * z.sz / z.n)
                  FROM zstats z) AS ss_within
      FROM tot t
    )
    SELECT n AS n_obs, k AS n_groups,
           ROUND((ss_between / (k - 1)) / (ss_within / (n - k)), 4)
             AS levene_w,
           CASE WHEN (ss_between / (k - 1)) / (ss_within / (n - k)) > 2.37
                THEN 1 ELSE 0 END AS heteroscedastic_5pct
    FROM ss
"""

register_sql(
    "x536_levene_test",
    spark_sql=_X536,
    duckdb_sql=_X536,
    tags=("stats", "experiment"),
)
