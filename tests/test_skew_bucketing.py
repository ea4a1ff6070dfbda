"""Skew helper correctness + bucketed-join plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import plan_of


def test_salted_agg_equals_plain_agg(spark, tables):
    from aetherium_trader_datapipeline_spark.operators.skew import salted_agg

    li = tables["lineitem"]
    plain = {
        r.l_returnflag: (round(r.s, 2), r.c)
        for r in li.groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 2).alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r.l_returnflag: (round(r.s, 2), r.c)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            [F.sum("l_quantity").alias("ps"), F.count(F.lit(1)).alias("pc")],
            [F.round(F.sum("ps"), 2).alias("s"), F.sum("pc").alias("c")],
        ).collect()
    }
    assert plain == salted


def test_salted_broadcast_left_equals_plain_join(spark, tables):
    from aetherium_trader_datapipeline_spark.operators.skew import salted_broadcast_left

    orders = tables["orders"].withColumnRenamed("o_custkey", "k")
    cust = tables["customer"].withColumnRenamed("c_custkey", "k")
    plain = orders.join(cust, "k").count()
    salted = salted_broadcast_left(orders, cust, on="k", n_salts=8).count()
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, tmp_path, tables):
    """Both sides bucketed on the join key → sort-merge join with zero
    Exchange — the co-located-join property bucketing exists for."""
    from aetherium_trader_datapipeline_spark.sources.bucketed import read_table, save_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        save_bucketed(tables["orders"], "orders_b", "o_orderkey", n_buckets=8)
        save_bucketed(
            tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            "o_orderkey",
            n_buckets=8,
        )
        joined = read_table(spark, "orders_b").join(read_table(spark, "lineitem_b"), "o_orderkey")
        plan = plan_of(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2500]
        assert joined.count() == tables["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salting_balances_hot_key_partitions(spark):
    """The 100 TB skew story, measured (VERDICT r2 item 8): a key owning
    ~91% of rows hashes to ONE reducer unsalted; after the salted_agg
    stage-1 key (key, salt) the same rows spread near-uniformly. Asserts
    actual post-shuffle partition sizes, not AQE prose."""
    from aetherium_trader_datapipeline_spark.operators.skew import salted_agg

    # Salt cardinality must exceed the reducer count by a comfortable factor:
    # with n_salts == n_parts the hot key yields only n_parts (key,salt)
    # combos and balls-into-bins collisions leave some reducer with 3x the
    # mean. 128 salts over 16 reducers → ~8 combos/reducer, tight balance.
    n_parts, n_salts = 16, 128
    hot = spark.range(50_000).selectExpr("'HOT' AS k", "CAST(id AS DOUBLE) AS v")
    cold = spark.range(5_000).selectExpr("concat('k', id % 100) AS k", "CAST(id AS DOUBLE) AS v")
    df = hot.union(cold)
    total = 55_000

    def partition_sizes(d):
        return [
            r["count"]
            for r in d.groupBy(F.spark_partition_id().alias("p")).count().collect()
        ]

    # Unsalted shuffle on the bare key: the hot key's rows land on one task.
    unsalted_max = max(partition_sizes(df.repartition(n_parts, "k")))
    assert unsalted_max >= 0.9 * 50_000  # one reducer owns the hot key

    # Salted shuffle on (key, salt) — the stage-1 distribution of salted_agg.
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    salted_sizes = partition_sizes(salted.repartition(n_parts, "k", "__salt"))
    ideal = total / n_parts
    assert max(salted_sizes) <= 2.0 * ideal, salted_sizes  # no reducer > 2x ideal

    # And the salted two-stage aggregate still matches the plain aggregate.
    plain = {
        r.k: (round(r.s, 4), r.c)
        for r in df.groupBy("k")
        .agg(F.round(F.sum("v"), 4).alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    two_stage = {
        r.k: (round(r.s, 4), r.c)
        for r in salted_agg(
            df,
            ["k"],
            [F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pc")],
            [F.round(F.sum("ps"), 4).alias("s"), F.sum("pc").alias("c")],
            n_salts=n_salts,
        ).collect()
    }
    assert plain == two_stage
