"""Wave 166 (x564–x566): the three classical nonparametric tests the
battery still lacked — k-group ranks, paired ranks, and binary
repeated measures.  Completes the family around Mann-Whitney (x413),
KS (x412), chi-square (x414), ANOVA/Levene (x535/x536).

x564 — Kruskal–Wallis H across the five order priorities on order
value.  Tie-averaged ranks use the same integer 2×rank-sum identity as
x413 (2R_g = Σ a_g·(2·cum_before + t + 1) over the value grid), and H
is assembled from per-group deviation contributions
12·n_g·(r̄_g − (N+1)/2)²/(N(N+1)) — dividing by N(N+1) INSIDE each
group term keeps the quantized magnitudes bounded at any scale (the
raw ΣR²/n form overflows BIGINT quantization at the 100× replica).
Tie correction 1 − Σ(t³−t)/(N³−N) in a single IEEE expression.

x565 — Wilcoxon signed-rank on paired per-customer spend: odd- vs
even-month order totals in exact integer cents (FLOOR(price·100) per
order, BIGINT sums), zero diffs dropped per the classical procedure.
2W⁺ stays integer through the tie-block identity on the |d| grid; the
normal approximation carries the tie-corrected variance
n(n+1)(2n+1)/24 − Σ(t³−t)/48.

x566 — Cochran's Q for k=3 related binary treatments (did the user
purchase on day 5 / 15 / 25 of the month — day-based purchase
indicators, chosen because any-event indicators degenerate to all-ones
rows and a zero denominator).  The algebra is kept
fully integer with the identity
Q = (k−1)(k·ΣC_j² − N²) / (k·ΣR_i − ΣR_i²) — only the final division
is IEEE.  dof = k−1 = 2, 5% critical value 5.991.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x564: Kruskal-Wallis H across order priorities ------------------------------

_X564 = """
    WITH s AS (
      SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders
    ),
    cells AS (
      SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS a
      FROM s GROUP BY grp, v
    ),
    vals AS (
      SELECT v, CAST(SUM(a) AS BIGINT) AS t FROM cells GROUP BY v
    ),
    ranked AS (
      SELECT v, t,
             SUM(t) OVER (ORDER BY v) - t AS cum_before,
             SUM(t) OVER () AS n,
             SUM(t * t * t - t) OVER () AS tie_cubes
      FROM vals
    ),
    rsums AS (
      -- 2*R_g per group: exact integer rank sums over the value grid
      SELECT c.grp,
             CAST(SUM(c.a) AS BIGINT) AS n_g,
             CAST(SUM(c.a * (2 * r.cum_before + r.t + 1)) AS BIGINT)
               AS r_x2,
             MAX(r.n) AS n,
             MAX(r.tie_cubes) AS tie_cubes
      FROM cells c JOIN ranked r ON c.v = r.v
      GROUP BY c.grp
    ),
    contrib AS (
      -- 12*n_g*(rbar - (N+1)/2)^2 / (N(N+1)), quantized to 1e9ths;
      -- the inner division bounds the magnitude at any replica scale
      SELECT grp, n_g, n, tie_cubes,
             ROUND(CAST(r_x2 AS DOUBLE) / (2 * n_g), 6) AS mean_rank,
             CAST(FLOOR(
               12.0 * n_g
               * POWER(CAST(r_x2 AS DOUBLE) / (2 * n_g)
                       - (CAST(n AS DOUBLE) + 1) / 2, 2)
               / (CAST(n AS DOUBLE) * (n + 1)) * 1e9) AS BIGINT) AS h_fp
      FROM rsums
    )
    SELECT grp, n_g, mean_rank,
           ROUND(SUM(h_fp) OVER () / 1e9, 6) AS h,
           ROUND(SUM(h_fp) OVER () / 1e9
                 / (1.0 - CAST(tie_cubes AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n * n - n)), 6)
             AS h_tie_corrected,
           CAST(COUNT(*) OVER () - 1 AS BIGINT) AS dof,
           CASE WHEN SUM(h_fp) OVER () / 1e9
                     / (1.0 - CAST(tie_cubes AS DOUBLE)
                              / (CAST(n AS DOUBLE) * n * n - n))
                     > 9.488
                THEN 1 ELSE 0 END AS reject_5pct
    FROM contrib ORDER BY grp
"""

register_sql(
    "x564_kruskal_wallis",
    spark_sql=_X564,
    duckdb_sql=_X564,
    tags=("stats",),
)

# -- x565: Wilcoxon signed-rank on paired per-customer spend ---------------------

_X565 = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) % 2 = 1
                           THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS odd_cents,
             CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) % 2 = 0
                           THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS even_cents
      FROM orders GROUP BY o_custkey
    ),
    diffs AS (
      SELECT ABS(odd_cents - even_cents) AS ad,
             CASE WHEN odd_cents > even_cents THEN 1 ELSE 0 END AS pos
      FROM spend WHERE odd_cents != even_cents
    ),
    cells AS (
      SELECT ad, ad {intdiv} 8192 AS ck2,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(SUM(pos) AS BIGINT) AS a_pos
      FROM diffs GROUP BY ad
    ),
    -- TWO-LEVEL rank offsets (r11, x557 family): distinct |cent-diff|
    -- values are entity-scaled in the worst case (<= customers), so the
    -- tie-rank cumsum must not run through one unpartitioned window.
    -- Level 1 is partitioned by an 8192-value super-bucket; the global
    -- band sees only the super-bucket grid.
    lvl1 AS (
      SELECT ad, ck2, t, a_pos,
             SUM(t) OVER (PARTITION BY ck2 ORDER BY ad) - t AS cin
      FROM cells
    ),
    lvl2 AS (
      SELECT ck2,
             COALESCE(SUM(s2) OVER (ORDER BY ck2
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS coff2,
             SUM(s2) OVER () AS n
      FROM (SELECT ck2, CAST(SUM(t) AS BIGINT) AS s2
            FROM cells GROUP BY ck2)
    ),
    ranked AS (
      SELECT l1.t, l1.a_pos,
             l2.coff2 + l1.cin AS cum_before,
             l2.n
      FROM lvl1 l1 JOIN lvl2 l2 ON l1.ck2 = l2.ck2
    ),
    sums AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(a_pos * (2 * cum_before + t + 1)) AS BIGINT)
               AS w_plus_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cubes
      FROM ranked
    )
    SELECT n AS n_pairs,
           w_plus_x2,
           ROUND(CAST(w_plus_x2 AS DOUBLE) / 2, 1) AS w_plus,
           ROUND((CAST(w_plus_x2 AS DOUBLE) / 2
                  - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24.0
                        - CAST(tie_cubes AS DOUBLE) / 48.0), 6) AS z_score,
           CASE WHEN ABS((CAST(w_plus_x2 AS DOUBLE) / 2
                          - CAST(n AS DOUBLE) * (n + 1) / 4)
                         / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1)
                                / 24.0
                                - CAST(tie_cubes AS DOUBLE) / 48.0)) > 1.96
                THEN 1 ELSE 0 END AS reject_5pct
    FROM sums
"""

register_sql(
    "x565_wilcoxon_signed_rank",
    spark_sql=_X565.format(intdiv="DIV"),
    duckdb_sql=_X565.format(intdiv="//"),
    tags=("stats",),
)

# -- x566: Cochran's Q over three related binary treatments ----------------------

_X566 = """
    WITH rows_ AS (
      -- three related binary treatments: did the user purchase on day
      -- 5 / 15 / 25 of the window (rare enough that R_i varies; the
      -- any-event form degenerates to all-ones rows and a 0 denominator)
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase'
                       AND EXTRACT(DAY FROM ts) = 5 THEN 1 ELSE 0 END)
               AS x1,
             MAX(CASE WHEN event_type = 'purchase'
                       AND EXTRACT(DAY FROM ts) = 15 THEN 1 ELSE 0 END)
               AS x2,
             MAX(CASE WHEN event_type = 'purchase'
                       AND EXTRACT(DAY FROM ts) = 25 THEN 1 ELSE 0 END)
               AS x3
      FROM events GROUP BY user_id
    ),
    tots AS (
      SELECT CAST(SUM(x1) AS BIGINT) AS c1,
             CAST(SUM(x2) AS BIGINT) AS c2,
             CAST(SUM(x3) AS BIGINT) AS c3,
             CAST(SUM(x1 + x2 + x3) AS BIGINT) AS n_tot,
             CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT)
               AS r_sq,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM rows_
    ),
    q AS (
      -- Q = (k-1)(k*sum C_j^2 - N^2) / (k*N - sum R_i^2), k = 3;
      -- everything integer until the one final division
      SELECT n_users, c1, c2, c3,
             2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - n_tot * n_tot)
               AS q_num,
             3 * n_tot - r_sq AS q_den
      FROM tots
    )
    SELECT t.treatment,
           t.present_users,
           q.n_users,
           CASE WHEN q.q_den > 0
                THEN ROUND(CAST(q.q_num AS DOUBLE) / q.q_den, 6) END
             AS cochran_q,
           CAST(2 AS BIGINT) AS dof,
           CASE WHEN q.q_den > 0
                 AND CAST(q.q_num AS DOUBLE) / q.q_den > 5.991
                THEN 1 ELSE 0 END AS reject_5pct
    FROM q
    CROSS JOIN (
      -- labels name the actual indicators (purchase on day 5/15/25 of
      -- the month), not event types — ADVICE r6 #1
      SELECT 'purchase_day05' AS treatment, c1 AS present_users FROM q
      UNION ALL SELECT 'purchase_day15', c2 FROM q
      UNION ALL SELECT 'purchase_day25', c3 FROM q
    ) t
    ORDER BY t.treatment
"""

register_sql(
    "x566_cochran_q",
    spark_sql=_X566,
    duckdb_sql=_X566,
    tags=("stats",),
)
