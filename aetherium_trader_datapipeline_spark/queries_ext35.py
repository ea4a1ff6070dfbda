"""Thirty-fifth extension wave — verified skew handling, perceptual image
hashing, and rolling regression:

x206 salted agg         the two-stage hot-key aggregation from
                        operators/skew.py, hash-verified against the plain
                        GROUP BY — the skew-mitigation path is now proven
                        exact, not just balance-tested
x207 image ahash        average-hash over (synthetic) decoded pixels via
                        Arrow-batched mapInPandas; oracle replays the same
                        md5 pixel synth + integer bit algebra in SQL
x208 rolling regression trailing-50 OLS slope per instrument from exact
                        decimal moment sums in one window pass

Scale shapes: x206 is THE answer to a skewed groupBy at 100 TB — partial
aggregation on (key, salt) spreads a hot key over n_salts reducers, the
final combine sees n_salts rows per key. x207 is map-only after decode.
x208 is one hash exchange + frame-bounded window sums (no history arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x206: salted aggregation, verified exact -------------------------------
# events.event_type is the realistic hot key (a handful of values over the
# whole stream). Partial sums accumulate in DECIMAL so the two-stage
# combine is bit-equal to the single-stage oracle regardless of salt
# assignment (monotonically_increasing_id salting is nondeterministic —
# only associative exact aggregates survive it, which is the point).

_X206_ORACLE = """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
"""


@register(
    "x206_salted_agg",
    oracle=_X206_ORACLE,
    tags=("skew", "agg"),
)
def x206_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.skew import salted_agg

    t = load_tables(spark, sf_dir)
    src = t["events"].select(
        "event_type",
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    )
    out = salted_agg(
        src,
        ["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total_value"),
        ],
        final_aggs=[
            F.sum("n").cast("bigint").alias("n"),
            # Decimal combine stays internal (salt-order-proof exactness);
            # the FINAL column is double — decimal finals hash-diverge on
            # the driver (r7 red family).
            F.round(F.sum("total_value").cast("double"), 2).alias("total_value"),
        ],
    )
    return out.orderBy("event_type")


# -- x207: perceptual average-hash ------------------------------------------
# Spark side: the Python kernel (operators/multimodal.perceptual_ahash) —
# hashlib.md5 pixel synth + integer bit algebra over Arrow batches. Oracle:
# the identical algebra in SQL (MD5 hex prefix -> byte, p*60 > sum(p),
# bit << i). All integers end to end; no float anywhere.

_X207_DUCK = """
    WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 300),
    px AS (
      SELECT doc_id, i,
             ('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)), 1, 2))::BIGINT AS p
      FROM ids CROSS JOIN (SELECT UNNEST(generate_series(0, 59)) AS i) s
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN p * 60 > tot THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS ahash,
           CAST(SUM(CASE WHEN p * 60 > tot THEN 1 ELSE 0 END) AS BIGINT) AS n_bits
    FROM (SELECT doc_id, i, p, SUM(p) OVER (PARTITION BY doc_id) AS tot FROM px) t
    GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "x207_image_ahash",
    oracle=_X207_DUCK,
    tags=("multimodal", "pandas"),
)
def x207_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        perceptual_ahash,
    )

    t = load_tables(spark, sf_dir)
    ids = t["documents"].select("doc_id").orderBy("doc_id").limit(300)
    return perceptual_ahash(ids, "doc_id", n_px=60).orderBy("doc_id")


# -- x208: trailing-window OLS slope ----------------------------------------
# x is the per-key row index (exact integer), y the 4-dp price (exact
# decimal); all five frame sums are exact, the closed-form slope is a few
# double ops on exact inputs, emitted as floored micro-units (engine-
# identical; see x79/x196 ROUND-tie rationale).

_X208_BODY = """
    WITH px AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value, 4) AS DECIMAL(14,4)) AS p,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS DECIMAL(18,0)) AS rn
      FROM events WHERE value > 0
    ),
    w AS (
      SELECT user_id, event_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY rn
                            ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS n,
             SUM(rn) OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS sx,
             SUM(p) OVER (PARTITION BY user_id ORDER BY rn
                          ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS sy,
             SUM(rn * p) OVER (PARTITION BY user_id ORDER BY rn
                               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS sxy,
             SUM(rn * rn) OVER (PARTITION BY user_id ORDER BY rn
                                ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS sxx
      FROM px
    )
    SELECT user_id, event_id,
           CAST(FLOOR(1e6 * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                AS BIGINT) AS slope_micro
    FROM w WHERE n = 50
    ORDER BY user_id, event_id LIMIT 500
"""

register_sql(
    "x208_rolling_regression",
    spark_sql=_X208_BODY,
    duckdb_sql=_X208_BODY,
    tags=("finance", "window"),
)
