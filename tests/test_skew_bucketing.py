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
