"""Twenty-first extension wave — the stateful-anomaly kernel as a
hash-verified registry key.

x171 runs the ``anomaly_batch`` applyInPandas kernel
(streaming/anomaly.py — the SAME integer-cents kernel the streaming
operator carries across micro-batches via GroupState) over the full
events history and hash-verifies its per-event flags against a DuckDB
window replay of the cross-multiplied 3-sigma inequality. Same
verification pattern as x63's rate-limit kernel: the custom stateful
operator's kernel is pinned to an independent SQL oracle, and the
stream==batch equivalence test (tests/test_streaming.py) extends that
guarantee to the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

_X171_ORACLE = """
    WITH d AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
      FROM events),
    w AS (
      SELECT user_id, event_id, xc,
             COUNT(*) OVER win AS n,
             CAST(SUM(xc) OVER win AS BIGINT) AS s,
             CAST(SUM(xc * xc) OVER win AS BIGINT) AS ss
      FROM d
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id,
           (n >= 20 AND (n * xc - s) * (n * xc - s) > 9 * (n * ss - s * s)) AS flagged
    FROM w ORDER BY user_id, event_id LIMIT 3000
"""


@register("x171_stateful_anomaly", oracle=_X171_ORACLE, tags=("streaming", "stateful", "monitoring"))
def x171_stateful_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.streaming.anomaly import anomaly_batch

    t = load_tables(spark, sf_dir)
    out = anomaly_batch(
        t["events"], key_cols=["user_id"], order_cols=["ts", "event_id"],
        value_col="value",
    )
    return (
        out.select("user_id", "event_id", "flagged")
        .orderBy("user_id", "event_id")
        .limit(3000)
    )
