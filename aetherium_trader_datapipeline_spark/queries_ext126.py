"""Wave 126 (x450–x452): entity-resolution evaluation & private release.

x450 — blocking-scheme quality: for three blocking keys of increasing
granularity, pair-completeness (share of true duplicate pairs kept in
some block) vs reduction ratio (share of the n² pair space pruned).
Both are computed ENTIRELY from group sizes — Σ g(g−1)/2 per text
group, per block, and per (text, block) — so no pair set is ever
materialized; this is the evaluation that precedes every record-linkage
/ dedup deployment (the x47/x129 LSH family chooses its banding the
same way).

x451 — B-cubed clustering evaluation of the exact-dup clustering (text
groups) against source labels: per-item precision |c∩k|/|c| and recall
|c∩k|/|k| aggregated by the (text, source) intersection sizes, each
term an exact integer division 1e12-quantized, so B³P/B³R/F1 hash
exactly.  Completes the cluster-quality family (x231 cohesion, x427
modularity) with the standard extrinsic metric.

x452 — differentially-private count release: per-source counts plus
inverse-CDF Laplace noise at ε ∈ {0.1, 1} driven by the portable
md5-hash uniform (deterministic pseudo-noise, the same released-noise
shape a DP pipeline emits), with the per-release ε and the composed
budget.  Extends the privacy surface (x312 k-anonymity, x330
l-diversity) from suppression to noise addition.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x450: blocking quality -----------------------------------------------------------

_X450_SCHEME = """
      SELECT '{name}' AS scheme,
             (SELECT CAST(SUM(b * (b - 1)) AS BIGINT) {intdiv} 2 FROM
               (SELECT COUNT(*) AS b FROM documents GROUP BY {block}) bg)
               AS cand_pairs,
             (SELECT CAST(SUM(i * (i - 1)) AS BIGINT) {intdiv} 2 FROM
               (SELECT COUNT(*) AS i FROM documents
                GROUP BY text, {block}) ig) AS captured_pairs
"""

_X450 = """
    WITH gt AS (
      -- the ground-truth pair count is scheme-independent: computed
      -- ONCE and cross-joined to the 3-row scheme frame (inside each
      -- scheme branch it would recompute the text groupBy 3x)
      SELECT CAST(SUM(g * (g - 1)) AS BIGINT) {intdiv} 2 AS gt_pairs
      FROM (SELECT COUNT(*) AS g FROM documents GROUP BY text) tg
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    schemes AS (
      {s1}
      UNION ALL
      {s2}
      UNION ALL
      {s3}
    )
    SELECT s.scheme, nn.n_docs, gt.gt_pairs, s.cand_pairs,
           s.captured_pairs,
           CASE WHEN gt.gt_pairs > 0 THEN
             ROUND(CAST(s.captured_pairs AS DOUBLE) / gt.gt_pairs, 6)
           END AS pair_completeness,
           ROUND(1 - CAST(s.cand_pairs AS DOUBLE)
                     / (CAST(nn.n_docs AS DOUBLE) * (nn.n_docs - 1) / 2), 6)
             AS reduction_ratio
    FROM schemes s CROSS JOIN gt CROSS JOIN nn ORDER BY s.scheme
"""


def _x450_sql(intdiv: str) -> str:
    def scheme(name: str, block: str) -> str:
        return _X450_SCHEME.format(name=name, block=block, intdiv=intdiv)

    return _X450.format(
        intdiv=intdiv,
        s1=scheme("1_lang_only", "lang"),
        s2=scheme("2_lang_len64", f"lang, n_chars {intdiv} 64"),
        s3=scheme("3_lang_len16", f"lang, n_chars {intdiv} 16"),
    )


register_sql(
    "x450_blocking_quality",
    spark_sql=_x450_sql("DIV"),
    duckdb_sql=_x450_sql("//"),
    tags=("dedup", "eval"),
)

# -- x451: B-cubed clustering evaluation -------------------------------------------------

_X451 = """
    WITH isect AS (
      SELECT text, source, CAST(COUNT(*) AS BIGINT) AS isize
      FROM documents GROUP BY text, source
    ),
    csize AS (
      SELECT text, CAST(SUM(isize) AS BIGINT) AS csize
      FROM isect GROUP BY text
    ),
    ksize AS (
      SELECT source, CAST(SUM(isize) AS BIGINT) AS ksize
      FROM isect GROUP BY source
    ),
    terms AS (
      -- every item in the same (cluster, class) cell shares its
      -- precision/recall term; weight the exact integer-division
      -- quantization by the cell size
      SELECT i.isize,
             i.isize * (i.isize * 1000000000000 {intdiv} c.csize) AS p_fp,
             i.isize * (i.isize * 1000000000000 {intdiv} k.ksize) AS r_fp
      FROM isect i
      JOIN csize c ON i.text = c.text
      JOIN ksize k ON i.source = k.source
    ),
    agg AS (
      SELECT CAST(SUM(isize) AS BIGINT) AS n,
             CAST(SUM(p_fp) AS BIGINT) AS sp,
             CAST(SUM(r_fp) AS BIGINT) AS sr
      FROM terms
    )
    SELECT n,
           ROUND(CAST(sp AS DOUBLE) / n / 1e12, 6) AS b3_precision,
           ROUND(CAST(sr AS DOUBLE) / n / 1e12, 6) AS b3_recall,
           ROUND(2 * (CAST(sp AS DOUBLE) / n / 1e12)
                   * (CAST(sr AS DOUBLE) / n / 1e12)
                 / (CAST(sp AS DOUBLE) / n / 1e12
                    + CAST(sr AS DOUBLE) / n / 1e12), 6) AS b3_f1
    FROM agg
"""

register_sql(
    "x451_bcubed_eval",
    spark_sql=_X451.format(intdiv="DIV"),
    duckdb_sql=_X451.format(intdiv="//"),
    tags=("dedup", "eval"),
)

# -- x452: DP noisy count release ---------------------------------------------------------

_X452 = """
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM documents GROUP BY source
    ),
    eps AS (SELECT CAST(0.1 AS DOUBLE) AS epsilon
            UNION ALL SELECT CAST(1.0 AS DOUBLE)),
    noised AS (
      -- inverse-CDF Laplace: u uniform in (0,1) from the portable md5
      -- hash; noise = -sign(u-0.5) * ln(1-2|u-0.5|) / eps.  One IEEE
      -- expression per released cell.
      SELECT c.source, e.epsilon, c.true_count,
             ({u} % 1000000 + 0.5) / 1000001.0 AS u
      FROM counts c CROSS JOIN eps e
    )
    SELECT source, epsilon, true_count,
           -- FLOOR(x + 0.5), not ROUND: .5-adjacent doubles round
           -- differently across engines
           CAST(FLOOR(true_count
                      - SIGN(u - 0.5)
                        * LN(1 - 2 * ABS(u - 0.5)) / epsilon + 0.5)
                AS BIGINT) AS released_count,
           ROUND(1.0 / epsilon, 4) AS noise_scale,
           ROUND(SUM(epsilon) OVER (PARTITION BY source), 4)
             AS composed_epsilon
    FROM noised ORDER BY source, epsilon
"""

register_sql(
    "x452_dp_noisy_counts",
    spark_sql=_X452.format(
        u="CAST(conv(substring(md5(source), 1, 12), 16, 10) AS BIGINT)"
    ),
    duckdb_sql=_X452.format(
        u="('0x' || substring(md5(source), 1, 12))::BIGINT"
    ),
    tags=("privacy", "stats"),
)
