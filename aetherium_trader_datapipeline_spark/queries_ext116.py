"""Wave 116 (x421–x423): rank statistics & agreement metrics.

x421 — Spearman rank correlation of hourly volume vs hourly price range
per symbol (the classic volume–volatility relation).  Tie-averaged
ranks stay integer as 2·RANK + tie_count − 1 (the x413 doubling trick,
expressed directly with RANK() + COUNT() OVER the tie group), and the
Pearson step over those integer ranks uses DECIMAL-exact moments, so ρ
is one IEEE expression per symbol.

x422 — Brier-score Murphy decomposition (reliability − resolution +
uncertainty) over a deterministic synthetic forecast stream: p is the
fractional part of value, the outcome fires when a multiplicative hash
of event_id lands under ⌊100p⌋ — calibrated by construction, so
resolution is positive and reliability near zero.  Per-bin terms are
single IEEE expressions over exact integer sums, 1e9-quantized before
the ≤10-row cross-bin sums; the decomposition residual column proves
brier = rel − res + unc to quantization.

x423 — Cohen's kappa between the embeddings label column and a
deterministically corrupted second rater (20% of rows shifted to the
next class by a vec_id hash): observed agreement and the chance-
agreement term Σ marginal products are exact integer ratios.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x421: Spearman rank correlation --------------------------------------------

_X421 = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, {epoch} {intdiv} 3600 AS hkey,
             CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    hourly AS (
      SELECT sym, hkey,
             CAST(SUM(vol_fp) AS BIGINT) AS x,
             CAST(MAX(px) - MIN(px) AS DECIMAL(18,6)) AS rng
      FROM ticks GROUP BY sym, hkey
    ),
    ranked AS (
      SELECT sym,
             2 * RANK() OVER (PARTITION BY sym ORDER BY x)
               + COUNT(*) OVER (PARTITION BY sym, x) - 1 AS rx,
             2 * RANK() OVER (PARTITION BY sym ORDER BY rng)
               + COUNT(*) OVER (PARTITION BY sym, rng) - 1 AS ry
      FROM hourly
    ),
    moms AS (
      SELECT sym, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(rx AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(ry AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(rx AS DECIMAL(18,0)) * rx) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(ry AS DECIMAL(18,0)) * ry) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(rx AS DECIMAL(18,0)) * ry) AS DECIMAL(38,0)) AS sxy
      FROM ranked GROUP BY sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                   / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS spearman_rho
    FROM moms WHERE n > 2 ORDER BY sym
"""

register_sql(
    "x421_spearman_corr",
    spark_sql=_X421.format(intdiv="DIV", epoch="unix_seconds(ts)"),
    duckdb_sql=_X421.format(
        intdiv="//", epoch="CAST(FLOOR(epoch(ts)) AS BIGINT)"
    ),
    tags=("stats", "finance"),
)

# -- x422: Brier decomposition ---------------------------------------------------

_X422 = """
    WITH fc AS (
      SELECT CAST(FLOOR((value - FLOOR(value)) * 1e6) AS BIGINT) AS p_fp,
             CASE WHEN ((event_id * 2654435761) {intdiv} 4096) % 100
                       < CAST(FLOOR((value - FLOOR(value)) * 100) AS BIGINT)
                  THEN 1 ELSE 0 END AS o
      FROM events WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT LEAST(p_fp {intdiv} 100000, 9) AS bin, p_fp, o FROM fc
    ),
    per_bin AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_k,
             CAST(SUM(p_fp) AS BIGINT) AS sp,
             CAST(SUM(o) AS BIGINT) AS so,
             CAST(SUM(CAST(p_fp AS DECIMAL(18,0)) * p_fp) AS DECIMAL(38,0))
               AS spp,
             CAST(SUM(CAST(p_fp AS DECIMAL(18,0)) * o) AS DECIMAL(38,0)) AS spo
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_k) AS BIGINT) AS n, CAST(SUM(so) AS BIGINT) AS o_all
      FROM per_bin
    ),
    terms AS (
      SELECT b.bin, b.n_k,
             ROUND(CAST(b.sp AS DOUBLE) / b.n_k / 1e6, 6) AS mean_p,
             ROUND(CAST(b.so AS DOUBLE) / b.n_k, 6) AS freq_o,
             -- per-bin reliability / resolution terms, 1e9-quantized
             CAST(FLOOR(b.n_k * POWER(CAST(b.sp AS DOUBLE) / b.n_k / 1e6
                                      - CAST(b.so AS DOUBLE) / b.n_k, 2)
                        * 1e9) AS BIGINT) AS rel_fp,
             CAST(FLOOR(b.n_k * POWER(CAST(b.so AS DOUBLE) / b.n_k
                                      - CAST(t.o_all AS DOUBLE) / t.n, 2)
                        * 1e9) AS BIGINT) AS res_fp,
             -- per-bin Brier contribution sum((p-o)^2), exact integers
             CAST(b.spp AS DECIMAL(38,0))
               - 2000000 * CAST(b.spo AS DECIMAL(38,0))
               + CAST(b.so AS DECIMAL(38,0)) * 1000000000000 AS brier_num,
             t.n, t.o_all
      FROM per_bin b CROSS JOIN tot t
    )
    SELECT CAST(bin AS BIGINT) AS bin, n_k, mean_p, freq_o,
           ROUND(CAST(SUM(brier_num) OVER () AS DOUBLE) / 1e12
                 / MAX(n) OVER (), 6) AS brier,
           ROUND(CAST(SUM(rel_fp) OVER () AS DOUBLE) / 1e9 / MAX(n) OVER (),
                 6) AS reliability,
           ROUND(CAST(SUM(res_fp) OVER () AS DOUBLE) / 1e9 / MAX(n) OVER (),
                 6) AS resolution,
           ROUND((CAST(MAX(o_all) OVER () AS DOUBLE) / MAX(n) OVER ())
                 * (1 - CAST(MAX(o_all) OVER () AS DOUBLE) / MAX(n) OVER ()),
                 6) AS uncertainty
    FROM terms ORDER BY bin
"""

register_sql(
    "x422_brier_decomposition",
    spark_sql=_X422.format(intdiv="DIV"),
    duckdb_sql=_X422.format(intdiv="//"),
    tags=("eval", "stats"),
)

# -- x423: Cohen's kappa ----------------------------------------------------------

_X423 = """
    WITH k AS (
      SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS n_classes
      FROM embeddings
    ),
    rated AS (
      SELECT e.label AS a,
             CASE WHEN ((e.vec_id * 2654435761) {intdiv} 2048) % 10 < 2
                  THEN (e.label + 1) % k.n_classes
                  ELSE e.label END AS b
      FROM embeddings e CROSS JOIN k
    ),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM rated GROUP BY a, b
    ),
    ma AS (SELECT a AS cls, CAST(SUM(c) AS BIGINT) AS ra FROM cells GROUP BY a),
    mb AS (SELECT b AS cls, CAST(SUM(c) AS BIGINT) AS rb FROM cells GROUP BY b),
    margins AS (
      SELECT t.n, t.agree, p.pe_num
      FROM (SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
                     AS agree
            FROM cells) t
      CROSS JOIN (SELECT CAST(SUM(ma.ra * mb.rb) AS BIGINT) AS pe_num
                  FROM ma JOIN mb ON ma.cls = mb.cls) p
    )
    SELECT n,
           ROUND(CAST(agree AS DOUBLE) / n, 6) AS observed_agreement,
           ROUND(CAST(pe_num AS DOUBLE) / n / n, 6) AS chance_agreement,
           ROUND((CAST(agree AS DOUBLE) / n - CAST(pe_num AS DOUBLE) / n / n)
                 / (1 - CAST(pe_num AS DOUBLE) / n / n), 6) AS cohens_kappa
    FROM margins
"""

register_sql(
    "x423_cohens_kappa",
    spark_sql=_X423.format(intdiv="DIV"),
    duckdb_sql=_X423.format(intdiv="//"),
    tags=("eval", "stats"),
)
