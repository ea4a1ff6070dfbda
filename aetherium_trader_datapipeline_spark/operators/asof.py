"""As-of join operators.

Two strategies:

1. ``asof_latest_prior`` — self-table as-of (events vs. their own history):
   ONE window pass over a single shuffle on the partition keys. The naive
   formulation is a range self-join (O(n·m) pairs per key) that explodes at
   scale; `MAX(ts of matching rows) OVER (... RANGE UNBOUNDED PRECEDING ..
   CURRENT ROW)` is linear and never materializes pairs.

2. ``asof_join`` — two-table as-of (trades vs. quotes): union the two sides
   tagged with a priority column, then the same single window pass — still
   one shuffle, no join. This is the standard log-merge trick; equals
   pandas ``merge_asof`` semantics (backward, inclusive).

At 100 TB both scale as a single repartition by key + in-partition sort,
which AQE can further split on skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_latest_prior(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    of_interest: str,
    prior_filter: str,
    result_col: str = "asof_ts",
) -> DataFrame:
    """For each row matching ``of_interest``, the max ``ts_col`` among rows
    matching ``prior_filter`` with ts <= this row's ts (same keys, inclusive).

    Rows with no prior match are dropped (inner-join semantics).
    """
    # RANGE UNBOUNDED PRECEDING..CURRENT ROW includes ts-peers, which matches
    # the inclusive `e2.ts <= e1.ts` contract even under timestamp ties.
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col)).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prior_ts = F.max(F.when(F.expr(prior_filter), F.col(ts_col))).over(w)
    return (
        df.withColumn(result_col, prior_ts)
        .where(F.expr(of_interest))
        .where(F.col(result_col).isNotNull())
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    key_cols: list[str],
    right_value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Two-table as-of join via tagged union + one window pass (no join).

    For each left row, attach the most recent (direction='backward') right
    row's ``right_value_cols`` with right.ts <= left.ts on equal keys.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")

    lcols = [c for c in left.columns if c not in key_cols and c != ts_col]
    tagged_left = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_value_cols],
    )
    tagged_right = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(c + suffix) for c in right_value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Right rows sort before left rows at equal ts (side 0 < 1) → inclusive.
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *key_cols,
        ts_col,
        "__side",
        *lcols,
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix)
            for c in right_value_cols
        ],
    )
    return filled.where(F.col("__side") == 1).drop("__side")
