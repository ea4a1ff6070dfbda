"""Wave 83 (x333–x335): split search, token relevance, high-low spreads.

x333 is a decision-stump split search — the inner loop of tree
induction and the simplest honest feature-importance probe: for every
integer threshold t on l_quantity, the Gini impurity drop of splitting
returnflag='R' at qty ≤ t.  The trick that makes it ONE scan instead of
50: group by quantity first, then running-sum windows over the quantity
order give every threshold's left-side counts simultaneously (the
cumulative-histogram form).  Impurity arithmetic is per-row IEEE on
exact integer counts; the winning split is a rank with a deterministic
tiebreak.

x334 is chi-square token relevance against the binary class
lang = 'en' — the classic filter-method feature selector (and a
pipeline smell test: tokens that predict language too well are often
boilerplate).  The 2×2 cell counts per token are exact distinct-doc
integers; (ad−bc)² is computed in DECIMAL(38) wide arithmetic because
at the 100× replica ad−bc reaches ~2.5e9 and its square overflows
BIGINT (the x310 lesson, applied at design time instead of being found
by the replica).  Top 20 by rounded statistic, token-lexicographic
tiebreak.

x335 is the Corwin–Schultz high-low spread estimator — the third
spread-from-bars method next to Roll (x322, needs tick covariances) and
Amihud (x321, impact not spread): β from two consecutive days'
ln²(H/L), γ from the two-day range, α = (√(2β)−√β)/(3−2√2) −
√(γ/(3−2√2)), S = 2(eᵅ−1)/(1+eᵅ).  Daily H/L are DECIMAL-exact
aggregates; each day-pair's spread is per-row libm on scalars,
quantized to 1e9 fixed-point BEFORE the per-sym mean (negative-spread
pairs floor at 0, the standard CS treatment, counted honestly in
n_negative).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x333: decision-stump Gini split search ------------------------------------

_X333 = """
    WITH labeled AS (
      SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      FROM lineitem
    ),
    per_qty AS (
      SELECT qty, CAST(COUNT(*) AS BIGINT) AS n_q,
             CAST(SUM(pos) AS BIGINT) AS pos_q
      FROM labeled GROUP BY qty
    ),
    cum AS (
      SELECT qty AS t,
             SUM(n_q) OVER (ORDER BY qty) AS nl,
             SUM(pos_q) OVER (ORDER BY qty) AS posl,
             SUM(n_q) OVER () AS n,
             SUM(pos_q) OVER () AS p
      FROM per_qty
    ),
    scored AS (
      SELECT CAST(t AS BIGINT) AS t, CAST(nl AS BIGINT) AS n_left,
             CAST(posl AS BIGINT) AS pos_left,
             ROUND(
               (1 - POW(CAST(p AS DOUBLE) / n, 2)
                  - POW(1 - CAST(p AS DOUBLE) / n, 2))
               - (CAST(nl AS DOUBLE) / n)
                 * (1 - POW(CAST(posl AS DOUBLE) / nl, 2)
                      - POW(1 - CAST(posl AS DOUBLE) / nl, 2))
               - (CAST(n - nl AS DOUBLE) / n)
                 * (1 - POW(CAST(p - posl AS DOUBLE) / (n - nl), 2)
                      - POW(1 - CAST(p - posl AS DOUBLE) / (n - nl), 2)),
               8) AS gini_drop
      FROM cum WHERE nl < n
    )
    SELECT t, n_left, pos_left, gini_drop,
           CASE WHEN RANK() OVER (ORDER BY gini_drop DESC, t) = 1
                THEN 1 ELSE 0 END AS is_best
    FROM scored ORDER BY t
"""

register_sql(
    "x333_gini_stump",
    spark_sql=_X333,
    duckdb_sql=_X333,
    tags=("training", "window"),
)

# -- x334: chi-square token relevance ------------------------------------------

_X334_FMT = """
    WITH docs AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en FROM documents
    ),
    toks AS (
      SELECT DISTINCT t.doc_id, t.tok FROM (
        SELECT doc_id, {unnest_tok} AS tok FROM documents
      ) t WHERE t.tok <> '' AND LENGTH(t.tok) >= 3
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(en) AS BIGINT) AS n_en
      FROM docs
    ),
    cells AS (
      SELECT tk.tok,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(d.en) AS BIGINT) AS df_en
      FROM toks tk JOIN docs d ON tk.doc_id = d.doc_id
      GROUP BY tk.tok HAVING COUNT(*) >= 5
    ),
    chi AS (
      SELECT c.tok, c.df, c.df_en, t.n, t.n_en,
             CAST(c.df_en AS DECIMAL(38,0)) * (t.n - t.n_en - (c.df - c.df_en))
               - CAST(c.df - c.df_en AS DECIMAL(38,0)) * (t.n_en - c.df_en)
               AS ad_bc
      FROM cells c CROSS JOIN totals t
    )
    SELECT tok, df, df_en,
           ROUND(CAST(n AS DOUBLE) * CAST(ad_bc * ad_bc AS DOUBLE)
                 / (CAST(df AS DOUBLE) * (n - df) * n_en * (n - n_en)), 6)
             AS chi2
    FROM chi
    ORDER BY chi2 DESC, tok LIMIT 20
"""

register_sql(
    "x334_chi2_tokens",
    spark_sql=_X334_FMT.format(unnest_tok="explode(split(lower(text), ' '))"),
    duckdb_sql=_X334_FMT.format(unnest_tok="unnest(string_split(lower(text), ' '))"),
    tags=("training", "textops"),
)

# -- x335: Corwin-Schultz high-low spread --------------------------------------
# k2 = 3 - 2*sqrt(2). Negative alpha => negative spread; CS sets S=0
# (floored) and we count how often.

_X335_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, CAST(ts AS DATE) AS d,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    daily AS (
      SELECT sym, d,
             CAST(MAX(px) AS DECIMAL(18,6)) AS hi,
             CAST(MIN(px) AS DECIMAL(18,6)) AS lo
      FROM ticks GROUP BY sym, d
    ),
    pairs AS (
      SELECT sym, d,
             CAST(hi AS DOUBLE) AS h1, CAST(lo AS DOUBLE) AS l1,
             CAST(LAG(hi) OVER (PARTITION BY sym ORDER BY d) AS DOUBLE) AS h0,
             CAST(LAG(lo) OVER (PARTITION BY sym ORDER BY d) AS DOUBLE) AS l0
      FROM daily
    ),
    cs AS (
      SELECT sym,
             POW(LN(h0 / l0), 2) + POW(LN(h1 / l1), 2) AS beta,
             POW(LN(GREATEST(h0, h1) / LEAST(l0, l1)), 2) AS gamma
      FROM pairs WHERE h0 IS NOT NULL
    ),
    alpha AS (
      SELECT sym,
             (SQRT(2 * beta) - SQRT(beta)) / (3 - 2 * SQRT(2))
               - SQRT(gamma / (3 - 2 * SQRT(2))) AS a
      FROM cs
    ),
    spread AS (
      SELECT sym,
             CAST(FLOOR(GREATEST(2 * (EXP(a) - 1) / (1 + EXP(a)), 0) * 1e9)
               AS BIGINT) AS s_fp,
             CASE WHEN 2 * (EXP(a) - 1) / (1 + EXP(a)) < 0 THEN 1 ELSE 0 END
               AS neg
      FROM alpha
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(neg) AS BIGINT) AS n_negative,
           ROUND(CAST(CAST(SUM(CAST(s_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(*) / 1e9, 6) AS cs_spread
    FROM spread GROUP BY sym ORDER BY sym
"""

register_sql(
    "x335_corwin_schultz",
    spark_sql=_X335_FMT,
    duckdb_sql=_X335_FMT,
    tags=("finance", "window"),
)
