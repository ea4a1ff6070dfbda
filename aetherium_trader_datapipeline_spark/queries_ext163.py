"""Wave 163 (x555–x557): survey & audit sampling estimators — the
inference side of the sampling family (x100/x122/x275/x283/x332 draw
samples; these ESTIMATE from them and check against ground truth,
which the full fixture makes observable).

x555 — Horvitz–Thompson: stratified Bernoulli sampling (10% of 'en'
docs, 30% of the rest, by the deterministic hash) with inverse-
inclusion weights; the HT estimate of total corpus tokens lands within
sampling error of the true total, and the exact design variance
Σ y²(1−π)/π² gives the CI half-width.

x556 — ratio estimator: the same sample, but estimating total tokens
through the auxiliary n_chars (known for EVERY doc — the frame
variable): R̂ = Σ_s y/Σ_s x, total = R̂·X.  Because tokens ≈ chars/4
are nearly proportional, the ratio estimator's error collapses vs HT —
both errors are printed against truth.

x557 — monetary-unit sampling (the audit profession's PPS design):
orders are selected where their cumulative-value band crosses a fixed
sampling interval (systematic PPS via integer division of cumulative
cents); planted misstatements (3% of orders, 1% overstatement) are
projected to the population tainting-style, against the true planted
total.  All selection arithmetic exact integers.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x555: Horvitz-Thompson ---------------------------------------------------------------

_X555 = """
    WITH frame AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) {intdiv} 4 AS y,
             CASE WHEN lang = 'en' THEN 10 ELSE 30 END AS pct,
             ((doc_id * 2654435761) {intdiv} 1024) % 100 AS hash_pct
      FROM documents
    ),
    truth AS (
      SELECT CAST(SUM(y) AS BIGINT) AS total_tokens FROM frame
    ),
    sampled AS (
      SELECT y, pct FROM frame WHERE hash_pct < pct
    ),
    est AS (
      -- HT total = sum over sample of y/pi ; design variance
      -- sum y^2 (1-pi)/pi^2 — both exact integer cross products
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
             CAST(SUM(y * 100 {intdiv} pct) AS BIGINT) AS ht_total,
             CAST(SUM(CAST(y AS DECIMAL(18,0)) * y
                      * (100 - pct) * 10000
                      {intdiv} (pct * pct)) AS DECIMAL(38,0)) AS var_num
      FROM sampled
    )
    SELECT e.n_sampled, t.total_tokens AS true_total,
           e.ht_total AS ht_estimate,
           ROUND(CAST(e.ht_total - t.total_tokens AS DOUBLE)
                 / t.total_tokens, 6) AS ht_rel_error,
           CAST(FLOOR(1.96 * SQRT(CAST(e.var_num AS DOUBLE) / 10000))
                AS BIGINT) AS ci_half_width,
           CASE WHEN ABS(e.ht_total - t.total_tokens)
                     <= 1.96 * SQRT(CAST(e.var_num AS DOUBLE) / 10000)
                THEN 1 ELSE 0 END AS truth_within_ci
    FROM est e CROSS JOIN truth t
"""

register_sql(
    "x555_horvitz_thompson",
    spark_sql=_X555.format(intdiv="DIV"),
    duckdb_sql=_X555.format(intdiv="//"),
    tags=("sampling", "stats"),
)

# -- x556: ratio estimator ----------------------------------------------------------------------

_X556 = """
    WITH frame AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) {intdiv} 4 AS y,
             CAST(n_chars AS BIGINT) AS x,
             CASE WHEN lang = 'en' THEN 10 ELSE 30 END AS pct,
             ((doc_id * 2654435761) {intdiv} 1024) % 100 AS hash_pct
      FROM documents
    ),
    truth AS (
      SELECT CAST(SUM(y) AS BIGINT) AS total_y,
             CAST(SUM(x) AS BIGINT) AS total_x
      FROM frame
    ),
    sampled AS (
      SELECT y, x, pct FROM frame WHERE hash_pct < pct
    ),
    est AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
             CAST(SUM(y * 100 {intdiv} pct) AS BIGINT) AS ht_y,
             CAST(SUM(x * 100 {intdiv} pct) AS BIGINT) AS ht_x
      FROM sampled
    )
    SELECT e.n_sampled, t.total_y AS true_total,
           e.ht_y AS ht_estimate,
           -- ratio estimate: (HT_y / HT_x) * known X total
           CAST(FLOOR(CAST(e.ht_y AS DOUBLE) / e.ht_x * t.total_x)
                AS BIGINT) AS ratio_estimate,
           ROUND(CAST(e.ht_y - t.total_y AS DOUBLE) / t.total_y, 6)
             AS ht_rel_error,
           ROUND((CAST(e.ht_y AS DOUBLE) / e.ht_x * t.total_x
                  - t.total_y) / t.total_y, 6) AS ratio_rel_error
    FROM est e CROSS JOIN truth t
"""

register_sql(
    "x556_ratio_estimator",
    spark_sql=_X556.format(intdiv="DIV"),
    duckdb_sql=_X556.format(intdiv="//"),
    tags=("sampling", "stats"),
)

# -- x557: monetary-unit sampling ------------------------------------------------------------------

_X557 = """
    WITH booked AS (
      SELECT o_orderkey, o_orderkey {intdiv} 8192 AS chunk,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 97 < 3 THEN 1 ELSE 0 END AS misstated
      FROM orders
    ),
    inchunk AS (
      -- within-chunk running monetary total: parallel windows over
      -- contiguous o_orderkey ranges (~8192 keys each). The r6 form
      -- was one global SUM(cents) OVER (ORDER BY o_orderkey) — a
      -- single-partition sort of every order row.
      SELECT chunk, o_orderkey, cents, misstated,
             SUM(cents) OVER (PARTITION BY chunk
                              ORDER BY o_orderkey) AS c_run
      FROM booked
    ),
    per_chunk AS (
      SELECT chunk, chunk {intdiv} 8192 AS ck2,
             CAST(SUM(cents) AS BIGINT) AS csum
      FROM booked GROUP BY chunk, chunk {intdiv} 8192
    ),
    lvl1 AS (
      -- TWO-LEVEL prefix sums (r11): the flat chunk grid is
      -- |orders|/8192 rows — linear, ~2e7 through one task at 100 TB.
      -- Level 1 runs PARTITIONED by a super-chunk of 8192 chunks;
      -- level 2's global band sees only the |orders|/8192^2 super-chunk
      -- grid (~2e3 rows at 100 TB).  coff = coff2 + coff_in, exact
      -- integer addition.
      SELECT chunk, ck2, csum,
             SUM(csum) OVER (PARTITION BY ck2 ORDER BY chunk) - csum
               AS coff_in
      FROM per_chunk
    ),
    lvl2 AS (
      SELECT ck2,
             COALESCE(SUM(s2) OVER (ORDER BY ck2
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS coff2,
             SUM(s2) OVER () AS pop_cents
      FROM (SELECT ck2, CAST(SUM(csum) AS BIGINT) AS s2
            FROM per_chunk GROUP BY ck2)
    ),
    offs AS (
      SELECT l1.chunk, l2.coff2 + l1.coff_in AS coff, l2.pop_cents
      FROM lvl1 l1 JOIN lvl2 l2 ON l1.ck2 = l2.ck2
    ),
    cum AS (
      SELECT i.o_orderkey, i.cents, i.misstated,
             o.coff + i.c_run AS cum_hi,
             o.coff + i.c_run - i.cents AS cum_lo,
             o.pop_cents
      FROM inchunk i JOIN offs o ON i.chunk = o.chunk
    ),
    selected AS (
      -- systematic PPS: an order is selected when its cumulative band
      -- contains a multiple of the sampling interval (pop/400)
      SELECT *,
             pop_cents {intdiv} 400 AS interval_c
      FROM cum
      WHERE cum_hi {intdiv} (pop_cents {intdiv} 400)
            > cum_lo {intdiv} (pop_cents {intdiv} 400)
    ),
    projection AS (
      -- tainting: each misstated selected order overstates by 1%;
      -- projected misstatement = sum(taint) * interval
      SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
             CAST(SUM(misstated) AS BIGINT) AS n_misstated_in_sample,
             CAST(SUM(misstated) * MAX(interval_c) {intdiv} 100
                  AS BIGINT) AS projected_misstatement_c
      FROM selected
    ),
    truth AS (
      SELECT CAST(SUM(misstated * cents {intdiv} 100) AS BIGINT)
               AS true_misstatement_c
      FROM booked
    )
    SELECT p.n_selected, p.n_misstated_in_sample,
           ROUND(CAST(p.projected_misstatement_c AS DOUBLE) / 100, 2)
             AS projected_misstatement,
           ROUND(CAST(t.true_misstatement_c AS DOUBLE) / 100, 2)
             AS true_misstatement,
           CASE WHEN t.true_misstatement_c > 0 THEN
             ROUND(CAST(p.projected_misstatement_c AS DOUBLE)
                   / t.true_misstatement_c, 4) END AS projection_ratio
    FROM projection p CROSS JOIN truth t
"""

register_sql(
    "x557_monetary_unit_sampling",
    spark_sql=_X557.format(intdiv="DIV"),
    duckdb_sql=_X557.format(intdiv="//"),
    tags=("sampling", "warehouse"),
)
