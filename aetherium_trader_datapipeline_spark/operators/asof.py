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


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    key_cols: list[str],
    right_value_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Two-table backward as-of via cogrouped ``applyInPandas`` +
    ``pandas.merge_asof`` — the alternative physical strategy to
    ``asof_join``'s tagged-union window pass.

    Same semantics (backward, inclusive). Trade-off: the union+window form
    keeps everything JVM-side but sorts left+right TOGETHER per key; this
    form pays Arrow transfer but runs a two-pointer merge per key group,
    which wins when the right side is much larger than the left or when a
    per-group vectorized kernel is already paying the Python toll anyway.
    Both are one shuffle on ``key_cols``.
    """
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    out_fields = list(left.schema.fields) + [
        StructField(c + suffix, right.schema[c].dataType) for c in right_value_cols
    ]
    out_schema = StructType(out_fields)

    # Suffix-rename the right side's non-key columns BEFORE the cogroup.
    # When both sides derive from the same source (self-as-of), they share
    # attribute ids; a projection above the cogroup then makes the
    # optimizer's self-reference dedup misprune the right side's inputs.
    # Fresh aliases give the right side its own attributes.
    rts = ts_col + suffix
    right_sel = right.select(
        *key_cols,
        F.col(ts_col).alias(rts),
        *[F.col(c).alias(c + suffix) for c in right_value_cols],
    )
    suffixed_vals = [c + suffix for c in right_value_cols]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lpdf = lpdf.sort_values(ts_col, kind="mergesort")
        r = rpdf[[rts] + suffixed_vals].sort_values(rts, kind="mergesort")
        if r.empty:
            out = lpdf.copy()
            for c in suffixed_vals:
                out[c] = None
            return out[[f.name for f in out_fields]]
        m = pd.merge_asof(
            lpdf,
            r,
            left_on=ts_col,
            right_on=rts,
            direction="backward",
            allow_exact_matches=True,
        )
        return m[[f.name for f in out_fields]]

    return (
        left.groupBy(*key_cols)
        .cogroup(right_sel.groupBy(*key_cols))
        .applyInPandas(merge, schema=out_schema)
    )
