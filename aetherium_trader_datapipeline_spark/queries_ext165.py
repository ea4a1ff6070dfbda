"""Wave 165 (x561–x563): the dedup funnel as one report, and fairness
audits for the classifier surface.

x561 — dedup funnel: three tiers applied in sequence on the same
corpus — exact text identity, a real 4-permutation MinHash signature
(word shingles through salted md5 hashes, the x129 portable scheme),
and an aggressive canonical blocking key — with survivors and marginal
removals per stage.  The single table a curation team reads to decide
how deep into the dedup ladder to go; each tier's math is exact
(md5-derived integers, MIN aggregations).

x562 — slice calibration: the x390-style expected calibration gap
computed PER event type — a model can be calibrated on average while
badly mis-calibrated on a slice; per-slice |mean score − realized
rate| with the global figure alongside.

x563 — equalized odds: per user-cohort group (the protected-attribute
stand-in), the classifier's TPR and FPR from exact confusion counts,
plus the max pairwise gaps — the fairness audit run before shipping
any scored decision.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x561: dedup funnel --------------------------------------------------------------------------

_X561 = """
    WITH base AS (
      SELECT doc_id, text, lang, n_chars FROM documents
    ),
    minhash AS (
      -- real 4-perm MinHash over word shingles (portable md5 ints)
      SELECT doc_id,
             MIN({h1}) AS m1, MIN({h2}) AS m2,
             MIN({h3}) AS m3, MIN({h4}) AS m4
      FROM ({words}) w
      GROUP BY doc_id
    ),
    keys AS (
      SELECT b.doc_id, b.text,
             CONCAT(CAST(m.m1 AS STRING), '-', CAST(m.m2 AS STRING), '-',
                    CAST(m.m3 AS STRING), '-', CAST(m.m4 AS STRING))
               AS sig,
             CONCAT(b.lang, '-', CAST(b.n_chars {intdiv} 16 AS STRING))
               AS block_key
      FROM base b JOIN minhash m ON b.doc_id = m.doc_id
    ),
    stages AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS after_exact,
             CAST(COUNT(DISTINCT sig) AS BIGINT) AS after_minhash,
             CAST(COUNT(DISTINCT block_key) AS BIGINT) AS after_blocking
      FROM keys
    )
    SELECT n_docs, after_exact, after_minhash, after_blocking,
           CAST(n_docs - after_exact AS BIGINT) AS removed_by_exact,
           CAST(after_exact - after_minhash AS BIGINT)
             AS removed_by_minhash,
           CAST(after_minhash - after_blocking AS BIGINT)
             AS removed_by_blocking,
           ROUND(CAST(after_blocking AS DOUBLE) / n_docs, 6)
             AS survival_share
    FROM stages
"""

_WORDS_SPARK = """
      SELECT doc_id, w
      FROM documents LATERAL VIEW explode(split(lower(text), ' ')) t AS w
      WHERE w != ''
"""
_WORDS_DUCK = """
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents) u
      WHERE w != ''
"""


def _h_spark(salt: int) -> str:
    return (f"CAST(conv(substring(md5(CONCAT('s{salt}-', w)), 1, 12), "
            f"16, 10) AS BIGINT)")


def _h_duck(salt: int) -> str:
    return f"('0x' || substring(md5('s{salt}-' || w), 1, 12))::BIGINT"


register_sql(
    "x561_dedup_funnel_stages",
    spark_sql=_X561.format(
        words=_WORDS_SPARK, intdiv="DIV",
        h1=_h_spark(1), h2=_h_spark(2), h3=_h_spark(3), h4=_h_spark(4),
    ),
    duckdb_sql=_X561.format(
        words=_WORDS_DUCK, intdiv="//",
        h1=_h_duck(1), h2=_h_duck(2), h3=_h_duck(3), h4=_h_duck(4),
    ).replace("AS STRING", "AS VARCHAR"),
    tags=("dedup", "curation"),
)

# -- x562: slice calibration ------------------------------------------------------------------------

_X562 = """
    WITH scored AS (
      SELECT event_type,
             CAST(FLOOR((value - FLOOR(value)) * 1e6) AS BIGINT) AS p_fp,
             CASE WHEN ((event_id * 2654435761) {intdiv} 4096) % 100
                       < CAST(FLOOR((value - FLOOR(value)) * 100)
                              AS BIGINT)
                  THEN 1 ELSE 0 END AS o
      FROM events WHERE value IS NOT NULL
    ),
    slices AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p_fp) AS BIGINT) AS sp,
             CAST(SUM(o) AS BIGINT) AS so
      FROM scored GROUP BY event_type
    ),
    overall AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sp) AS BIGINT) AS sp,
             CAST(SUM(so) AS BIGINT) AS so
      FROM slices
    )
    SELECT s.event_type AS slice,
           s.n,
           ROUND(CAST(s.sp AS DOUBLE) / s.n / 1e6, 6) AS mean_score,
           ROUND(CAST(s.so AS DOUBLE) / s.n, 6) AS realized_rate,
           ROUND(ABS(CAST(s.sp AS DOUBLE) / s.n / 1e6
                     - CAST(s.so AS DOUBLE) / s.n), 6)
             AS slice_calibration_gap,
           ROUND(ABS(CAST(g.sp AS DOUBLE) / g.n / 1e6
                     - CAST(g.so AS DOUBLE) / g.n), 6)
             AS global_calibration_gap
    FROM slices s CROSS JOIN overall g
    ORDER BY slice
"""

register_sql(
    "x562_slice_calibration",
    spark_sql=_X562.format(intdiv="DIV"),
    duckdb_sql=_X562.format(intdiv="//"),
    tags=("eval", "stats"),
)

# -- x563: equalized odds ----------------------------------------------------------------------------

_X563 = """
    WITH scored AS (
      SELECT (((user_id * 2654435761) {intdiv} 1024) % 3) AS grp,
             CASE WHEN (value - FLOOR(value)) >= 0.6 THEN 1 ELSE 0 END
               AS pred,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    conf AS (
      SELECT grp,
             CAST(SUM(pred * y) AS BIGINT) AS tp,
             CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
             CAST(SUM((1 - pred) * y) AS BIGINT) AS fn,
             CAST(SUM((1 - pred) * (1 - y)) AS BIGINT) AS tn
      FROM scored GROUP BY grp
    ),
    rates AS (
      SELECT grp, tp, fp, fn, tn,
             CAST(FLOOR(CAST(tp AS DOUBLE) / (tp + fn) * 1e9) AS BIGINT)
               AS tpr_fp,
             CAST(FLOOR(CAST(fp AS DOUBLE) / (fp + tn) * 1e9) AS BIGINT)
               AS fpr_fp
      FROM conf WHERE tp + fn > 0 AND fp + tn > 0
    )
    SELECT CAST(grp AS BIGINT) AS grp,
           tp, fp, fn, tn,
           ROUND(tpr_fp / 1e9, 6) AS tpr,
           ROUND(fpr_fp / 1e9, 6) AS fpr,
           ROUND((MAX(tpr_fp) OVER () - MIN(tpr_fp) OVER ()) / 1e9, 6)
             AS max_tpr_gap,
           ROUND((MAX(fpr_fp) OVER () - MIN(fpr_fp) OVER ()) / 1e9, 6)
             AS max_fpr_gap,
           CASE WHEN (MAX(tpr_fp) OVER () - MIN(tpr_fp) OVER ()) / 1e9
                     < 0.05
                 AND (MAX(fpr_fp) OVER () - MIN(fpr_fp) OVER ()) / 1e9
                     < 0.05
                THEN 1 ELSE 0 END AS passes_equalized_odds_5pct
    FROM rates ORDER BY grp
"""

register_sql(
    "x563_equalized_odds",
    spark_sql=_X563.format(intdiv="DIV"),
    duckdb_sql=_X563.format(intdiv="//"),
    tags=("eval", "privacy"),
)
