"""Wave 64 (x286–x288): operate-at-scale diagnostics — the queries an
engineer runs BEFORE the 100 TB job: is the key skewed? does the layout
cluster for data skipping? how selective is the join prefilter?

x286 quantifies partition skew for a prospective shuffle key. x287
computes Z-order (Morton) layout keys — the multi-column clustering that
makes min/max zone maps prune on BOTH columns. x288 builds a PORTABLE
Bloom filter (md5 double-hash into 1984 bits held as 32 sign-safe 62-bit
BIGINT lanes) and measures its false-positive rate exactly (2% at
sf0.01: 146 members, 27 FP / 1354 negatives, 0 FN) — the
engine-verifiable complement of x195's built-in bloom_filter_agg prune
(whose bits are engine-private)."""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x286: shuffle-key skew report -------------------------------------------
# Rows per pmod-bucket for the candidate key, plus each bucket's share of
# the total in basis points and a hot flag (> 2x fair share). At 100 TB
# this is the go/no-go for "shuffle on this key" vs "salt it".

_X286_FMT = """
    WITH b AS (
      SELECT {mod} AS bucket FROM events
    ),
    h AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_buckets FROM h)
    SELECT CAST(h.bucket AS BIGINT) AS bucket, CAST(h.n AS BIGINT) AS n_rows,
           CAST(h.n * 10000 {div} t.total AS BIGINT) AS share_bp,
           h.n * t.n_buckets > 2 * t.total AS hot
    FROM h, t ORDER BY bucket
"""

register_sql(
    "x286_partition_skew_report",
    spark_sql=_X286_FMT.format(mod="pmod(user_id, 32)", div="DIV"),
    duckdb_sql=_X286_FMT.format(
        mod="((user_id % 32) + 32) % 32", div="//"
    ),
    tags=("ops", "skew"),
)

# -- x287: Z-order (Morton) layout keys ---------------------------------------
# Interleave 8 bits of two join/filter columns into one ordering key:
# writing files sorted by z keeps BOTH columns' min/max ranges tight per
# file, so either predicate prunes. Pure integer arithmetic, identical in
# both engines; emitted per order with the implied 256-row zone id.

_ZBITS = " + ".join(
    f"(((a {{div}} {1 << i}) % 2) * {1 << (2 * i)}) + (((b {{div}} {1 << i}) % 2) * {1 << (2 * i + 1)})"
    for i in range(8)
)

_X287_FMT = f"""
    WITH k AS (
      SELECT o_orderkey, o_custkey % 256 AS a, o_orderkey % 256 AS b
      FROM orders
    ),
    z AS (
      SELECT o_orderkey, a, b, CAST({_ZBITS} AS BIGINT) AS zval FROM k
    )
    SELECT o_orderkey, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, zval,
           zval {{div}} 256 AS zone_id
    FROM z ORDER BY zval, o_orderkey LIMIT 300
"""

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from aetherium_trader_datapipeline_spark.queries import register  # noqa: E402
from aetherium_trader_datapipeline_spark.tables import load_tables  # noqa: E402


@register(
    "x287_zorder_keys",
    oracle=_X287_FMT.format(div="//"),
    tags=("ops", "layout"),
)
def x287_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises operators/layout.py's bit-interleave (the same expression
    write_zordered sorts files by) on modular grid coordinates, verified
    against the closed-form Morton arithmetic in DuckDB."""
    from aetherium_trader_datapipeline_spark.operators.layout import _interleave

    orders = load_tables(spark, sf_dir)["orders"]
    k = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("a"),
        (F.col("o_orderkey") % 256).alias("b"),
    )
    z = k.withColumn(
        "zval", _interleave([F.col("a"), F.col("b")], bits=8).cast("bigint")
    )
    return (
        z.select(
            "o_orderkey",
            F.col("a").cast("bigint").alias("a"),
            F.col("b").cast("bigint").alias("b"),
            "zval",
            F.expr("zval DIV 256").alias("zone_id"),
        )
        .orderBy("zval", "o_orderkey")
        .limit(300)
    )

# -- x288: portable Bloom filter + exact false-positive rate -------------------
# Build: custkeys of 'F'-status orders, two md5-derived hash positions
# each, OR-folded into 4x64-bit lanes (bit_or aggregate — mergeable,
# order-free, the sketch-algebra posture of x187/x229). Probe: every
# customer; a true negative probing positive is a false positive. Both
# engines compute the identical 256-bit array, so members/negatives/fp
# all hash-verify exactly.

# m = 1984 bits in thirty-two 62-bit lanes (lane = p DIV 62, bit = p % 62): the
# top two bits of each BIGINT lane stay clear, so lanes are non-negative
# and (bits DIV 2^bit) % 2 is sign-safe in both engines' truncating
# division.
_X288_FMT = """
    WITH build AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderstatus = 'F' AND o_custkey % 10 = 0
    ),
    pos AS (
      SELECT k, {h1} AS p1, {h2} AS p2 FROM build
    ),
    bloom AS (
      SELECT lane, {bitor}(bits) AS bits FROM (
        SELECT p1 {div} 62 AS lane, {shift_p1} AS bits FROM pos
        UNION ALL
        SELECT p2 {div} 62 AS lane, {shift_p2} AS bits FROM pos
      ) t GROUP BY lane
    ),
    probes AS (
      SELECT c_custkey AS k,
             {hc1} AS p1,
             {hc2} AS p2,
             EXISTS (SELECT 1 FROM build b WHERE b.k = c_custkey) AS is_member
      FROM customer
    ),
    checked AS (
      -- straight equi-joins to the <=32-row bloom (broadcast hash), not
      -- correlated scalar subqueries: Spark decorrelates those into a
      -- probe-keyed aggregate + join that reads as an unbounded build side
      SELECT p.k, p.is_member,
             COALESCE((b1.bits {div} {shift_pb1}) % 2, 0) = 1
             AND COALESCE((b2.bits {div} {shift_pb2}) % 2, 0) = 1
             AS bloom_hit
      FROM probes p
      LEFT JOIN bloom b1 ON b1.lane = p.p1 {div} 62
      LEFT JOIN bloom b2 ON b2.lane = p.p2 {div} 62
    )
    SELECT CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN is_member AND NOT bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_negatives,
           CAST(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_negatives,
           CAST(SUM(CASE WHEN NOT is_member AND bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives
    FROM checked
"""


def _sql_x288(spark: bool) -> str:
    if spark:
        md5i = lambda col, a, b: (  # noqa: E731
            f"CAST(conv(substring(md5(CAST({col} AS STRING)), {a}, {b}), 16, 10) AS BIGINT) % 1984"
        )
        sh = lambda p: f"shiftleft(1L, CAST({p} % 62 AS INT))"  # noqa: E731
        return _X288_FMT.format(
            h1=md5i("k", 1, 6),
            h2=md5i("k", 7, 6),
            hc1=md5i("c_custkey", 1, 6),
            hc2=md5i("c_custkey", 7, 6),
            bitor="bit_or",
            div="DIV",
            shift_p1=sh("p1"),
            shift_p2=sh("p2"),
            shift_pb1=sh("p1"),
            shift_pb2=sh("p2"),
        )
    md5i = lambda col, a, b: (  # noqa: E731
        f"(('0x' || substring(md5(CAST({col} AS VARCHAR)), {a}, {b}))::BIGINT) % 1984"
    )
    sh = lambda p: f"(1::BIGINT << CAST({p} % 62 AS INTEGER))"  # noqa: E731
    return _X288_FMT.format(
        h1=md5i("k", 1, 6),
        h2=md5i("k", 7, 6),
        hc1=md5i("c_custkey", 1, 6),
        hc2=md5i("c_custkey", 7, 6),
        bitor="bit_or",
        div="//",
        shift_p1=sh("p1"),
        shift_p2=sh("p2"),
        shift_pb1=sh("p1"),
        shift_pb2=sh("p2"),
    )


register_sql(
    "x288_portable_bloom",
    spark_sql=_sql_x288(spark=True),
    duckdb_sql=_sql_x288(spark=False),
    tags=("ops", "sketch"),
)
