"""Wave 78 (x318–x320): leakage-safe CV folds, regression metrics, PSI drift.

x318 is GROUP k-fold assignment: standard k-fold splits leak when
duplicate documents land in different folds (the x302 failure mode inside
cross-validation), so folds are assigned to the exact-duplicate CLUSTER
(content-hash group), not the row — every member inherits its cluster
representative's fold hash.  The query proves the invariant the operator
exists for: zero clusters span folds.

x319 rounds out the evaluation family (AUC x221, confusion x223, NDCG
x313) with the regression metrics MAE / RMSE / R² / MAPE for x311's
linear model on its test split — residual terms quantized to integer
fixed-point so every sum is exact.

x320 is the Population Stability Index — THE model-monitoring drift
metric: fixed-width buckets over the score variable, expected (train
split) vs actual (test split) shares, PSI = Σ (pₐ−pₑ)·ln(pₐ/pₑ) with
per-bucket DECIMAL terms; < 0.1 stable, 0.1–0.25 drifting, > 0.25
shifted.  Same-distribution splits here measure ≈ 0 — the calibration
point for the alert thresholds.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x318: group k-fold --------------------------------------------------------

_X318 = """
    WITH sig AS (
      SELECT doc_id, md5(text) AS h FROM documents
    ),
    clus AS (
      SELECT doc_id, h, MIN(doc_id) OVER (PARTITION BY h) AS rep FROM sig
    ),
    folded AS (
      SELECT doc_id, h, rep,
             (rep * 2654435761) % 4294967296 % 5 AS fold
      FROM clus
    ),
    span AS (
      SELECT h, COUNT(DISTINCT fold) AS n_folds FROM folded GROUP BY h
    )
    SELECT CAST(f.fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT f.h) AS BIGINT) AS n_clusters,
           CAST((SELECT COUNT(*) FROM span WHERE n_folds > 1) AS BIGINT)
             AS clusters_spanning_folds
    FROM folded f GROUP BY f.fold ORDER BY fold
"""

register_sql(
    "x318_group_kfold",
    spark_sql=_X318,
    duckdb_sql=_X318,
    tags=("training", "dedup", "audit"),
)

# -- x319: regression metrics --------------------------------------------------
# model = x311's fit (train buckets 0-5); metrics on test (8-9). Residual
# terms quantized: e_fp = floor(|y - yhat| * 100) etc. — exact sums.

_X319_FMT = """
    WITH base AS (
      SELECT CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y,
             ((l_orderkey * 8 + l_linenumber) * 2654435761) % 4294967296 % 10
               AS bucket
      FROM lineitem
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS sxy
      FROM base WHERE bucket <= 5
    ),
    coef AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS icept
      FROM fit
    ),
    test AS (
      SELECT CAST(FLOOR(ABS(b.y - (c.icept + c.slope * b.x)) * 100) AS BIGINT)
               AS ae_fp,
             CAST(FLOOR((b.y - (c.icept + c.slope * b.x))
                        * (b.y - (c.icept + c.slope * b.x))) AS BIGINT) AS se_fp,
             CAST(FLOOR(ABS(b.y - (c.icept + c.slope * b.x)) / b.y * 1000000)
               AS BIGINT) AS ape_fp,
             CAST(FLOOR(b.y * 100) AS BIGINT) AS y_fp
      FROM base b CROSS JOIN coef c WHERE b.bucket >= 8 AND b.y > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(ae_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS s_ae,
             CAST(CAST(SUM(CAST(se_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS s_se,
             CAST(CAST(SUM(CAST(ape_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS s_ape,
             CAST(CAST(SUM(CAST(y_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                  AS DOUBLE) AS s_y,
             CAST(CAST(SUM(CAST(y_fp AS DECIMAL(18,0)) * y_fp) AS DECIMAL(38,0))
                  AS DOUBLE) AS s_yy
      FROM test
    )
    SELECT CAST(n AS BIGINT) AS n_test,
           ROUND(s_ae / n / 100, 4) AS mae,
           ROUND(SQRT(s_se / n), 4) AS rmse,
           ROUND(s_ape / n / 10000, 4) AS mape_pct,
           ROUND(1 - s_se / ((s_yy - s_y * s_y / n) / 10000), 6) AS r2
    FROM agg
"""

register_sql(
    "x319_regression_metrics",
    spark_sql=_X319_FMT,
    duckdb_sql=_X319_FMT,
    tags=("stats", "ml", "eval"),
)

# -- x320: Population Stability Index -----------------------------------------

_X320_FMT = """
    WITH base AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v,
             (o_orderkey * 2654435761) % 4294967296 % 10 AS bucket
      FROM orders
    ),
    binned AS (
      SELECT CASE WHEN bucket <= 5 THEN 'expected' ELSE 'actual' END AS side,
             LEAST(9, CAST(FLOOR(v / 60000) AS BIGINT)) AS bin
      FROM base
    ),
    counts AS (
      SELECT side, bin, COUNT(*) AS c FROM binned GROUP BY side, bin
    ),
    tot AS (SELECT side, SUM(c) AS n FROM counts GROUP BY side),
    shares AS (
      SELECT c.bin,
             MAX(CASE WHEN c.side = 'expected'
                      THEN (c.c + 1) / (t.n + 10.0) END) AS pe,
             MAX(CASE WHEN c.side = 'actual'
                      THEN (c.c + 1) / (t.n + 10.0) END) AS pa
      FROM counts c JOIN tot t ON c.side = t.side
      GROUP BY c.bin
    ),
    terms AS (
      SELECT bin,
             CAST(ROUND((COALESCE(pa, 0.0) - COALESCE(pe, 0.0))
                        * LN(COALESCE(pa, 1e-9) / COALESCE(pe, 1e-9)), 9)
                  AS DECIMAL(18,9)) AS term,
             ROUND(COALESCE(pe, 0.0), 6) AS pe, ROUND(COALESCE(pa, 0.0), 6) AS pa
      FROM shares
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi,
           CAST(SUM(term) AS DOUBLE) < 0.1 AS stable
    FROM terms
"""

register_sql(
    "x320_drift_psi",
    spark_sql=_X320_FMT,
    duckdb_sql=_X320_FMT,
    tags=("stats", "ml", "monitoring"),
)
