"""Thirty-fourth extension wave — warehouse & matching patterns:

x203 incremental agg   mergeable partial aggregates: base-period partials
                       + delta partials re-aggregated == direct full agg
                       (the incremental-view-maintenance contract; oracle
                       is the direct form)
x204 skyline           2-D Pareto frontier (cheapest price vs largest
                       quantity) via one sorted window pass — no pairwise
                       dominance join
x205 fuzzy match       blocked entity resolution over the part-name
                       vocabulary: DISTINCT names first (the vocabulary is
                       tiny even when the table is huge), block on the
                       trailing noun, exact levenshtein within block, join
                       part counts back

Scale shapes: x203 is the associativity story — partials are per-partition
aggregates that combine; at 100 TB the base partials are precomputed and
only the delta scans. x204 replaces the O(n²) dominance self-join with
sort + running-max (one exchange). x205 never pairs rows — it pairs
DISTINCT canonical strings (|vocab|², tiny), the standard blocking trick
for string-join explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x203: incremental aggregate maintenance --------------------------------
# Spark side: two independent partial aggregations (base before the cutoff,
# delta after) merged by re-aggregation — the exact plan an incremental
# pipeline runs when yesterday's partials are already materialized. The
# oracle aggregates the union directly; equality proves the merge is exact
# (decimal sums are associative; counts add).

_X203_ORACLE = """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    ORDER BY m
"""


@register(
    "x203_incremental_agg",
    oracle=_X203_ORACLE,
    tags=("warehouse", "incremental"),
)
def x203_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    cutoff = "1995-01-01"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("m").agg(
            F.count(F.lit(1)).alias("n_orders"), F.sum("p").alias("revenue")
        )

    base = partial(orders.where(F.col("m") < F.lit(cutoff)))
    delta = partial(orders.where(F.col("m") >= F.lit(cutoff)))
    merged = (
        base.unionByName(delta)
        .groupBy("m")
        .agg(F.sum("n_orders").alias("n_orders"), F.sum("revenue").alias("revenue"))
    )
    # Decimal math stays internal (associative, exact); the FINAL projection
    # is double — the repr-stable convention every driver-green key follows
    # (the r7 driver hashed decimal finals differently from the local
    # replica: x203/x204/x206/x239/x240/x242/x244 were all rows+schema-green
    # but hash-red purely on decimal-final columns).
    return merged.select(
        "m",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round(F.col("revenue").cast("double"), 2).alias("revenue"),
    ).orderBy("m")


# -- x204: 2-D skyline (Pareto frontier) ------------------------------------
# Per-part best price (MIN, order-free) and best quantity (MAX); a part is
# on the frontier iff no part is both strictly cheaper and at least as
# large — equivalently qty strictly exceeds the running max over all
# strictly-cheaper-or-equal-priced predecessors minus itself. Sorting by
# (price, -qty, key) makes the exclusive-frame running max exactly "all
# parts that weakly dominate on price", so the test is one window pass.

_X204_BODY = """
    WITH pp AS (
      SELECT p.p_brand AS brand, l.l_partkey AS pk,
             MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS price,
             CAST(MAX(l.l_quantity) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_partkey
    ),
    w AS (
      SELECT brand, pk, price, qty,
             MAX(qty) OVER (PARTITION BY brand ORDER BY price, qty DESC, pk
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
      FROM pp
    )
    SELECT brand, pk, ROUND(CAST(price AS DOUBLE), 2) AS price, qty
    FROM w WHERE best_prev IS NULL OR qty > best_prev
    ORDER BY brand, price, qty DESC, pk LIMIT 300
"""

register_sql(
    "x204_skyline",
    spark_sql=_X204_BODY,
    duckdb_sql=_X204_BODY,
    tags=("analytics", "window"),
)

# -- x205: blocked fuzzy entity matching ------------------------------------
# Vocabulary-first: DISTINCT p_name (64 values at any SF — the vocabulary,
# not the table, bounds the pair space), block on the trailing noun, score
# candidate pairs with exact levenshtein, keep close pairs, then join the
# per-name part counts back. Both engines implement levenshtein with the
# same unit-cost dynamic program, so distances are integers and identical.

_X205_BODY = """
    WITH names AS (
      SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY p_name
    ),
    blocked AS (
      SELECT nm, n_parts,
             {split_last} AS blk
      FROM names
    ),
    pairs AS (
      SELECT a.nm AS name_a, b.nm AS name_b, a.n_parts AS parts_a,
             b.n_parts AS parts_b,
             CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
      FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.nm < b.nm
    )
    SELECT name_a, name_b, parts_a, parts_b, dist
    FROM pairs WHERE dist <= 4
    ORDER BY dist, name_a, name_b LIMIT 200
"""

register_sql(
    "x205_fuzzy_match",
    spark_sql=_X205_BODY.format(split_last="element_at(split(nm, ' '), -1)"),
    duckdb_sql=_X205_BODY.format(split_last="list_extract(string_split(nm, ' '), -1)"),
    tags=("matching", "text", "join"),
)
