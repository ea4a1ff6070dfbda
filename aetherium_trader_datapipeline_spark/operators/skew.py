"""Skew-mitigation helpers.

AQE handles skewed *joins* automatically (skewJoin.enabled, see
session.py). These helpers cover the cases AQE doesn't re-plan:

- ``salted_agg``: two-stage aggregation for groupBys whose key
  distribution is pathologically hot (one symbol = half the exchange
  feed). Stage 1 aggregates on (key, salt) — the hot key's rows spread
  over ``n_salts`` reducers; stage 2 merges the per-salt partials. Works
  for any algebraic aggregate (sum/count/min/max — supply the merge).
  Pick ``n_salts`` well above the shuffle-partition count: a hot key
  yields ``n_salts`` (key, salt) combos, and balls-into-bins collisions
  only even out when combos-per-reducer is ~8+ (measured in
  tests/test_skew_bucketing.py::test_salting_balances_hot_key_partitions).
- ``salted_broadcast_left``: explode a broadcastable right side by salt so
  a salted left can equality-join it (the classic hot-key join salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage (salted) aggregation.

    ``partial_aggs`` aggregate raw rows within (keys, salt); ``final_aggs``
    merge the partial columns within keys. Example::

        salted_agg(df, ["symbol"],
                   [F.sum("qty").alias("s"), F.count(F.lit(1)).alias("c")],
                   [F.sum("s").alias("total_qty"), F.sum("c").alias("n")])
    """
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "__salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key equi-join: salt the (large, skewed) left; explode the
    (small) right across all salts and broadcast it. The hot key's rows
    land on ``n_salts`` different reducers instead of one."""
    l_salted = left.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    r_exploded = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(F.broadcast(r_exploded), [on, "__salt"]).drop("__salt")
