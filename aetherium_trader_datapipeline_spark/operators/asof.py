"""As-of join operators.

Two strategies:

1. ``asof_latest_prior`` — self-table as-of (events vs. their own history):
   ONE window pass over a single shuffle on the partition keys. The naive
   formulation is a range self-join (O(n·m) pairs per key) that explodes at
   scale; `MAX(ts of matching rows) OVER (... RANGE UNBOUNDED PRECEDING ..
   CURRENT ROW)` is linear and never materializes pairs.

2. ``asof_join`` — two-table as-of (trades vs. quotes): union the two sides
   tagged with a priority column, then window passes — still one shuffle,
   no join. This is the standard log-merge trick; equals pandas
   ``merge_asof`` semantics for all three directions (backward / forward /
   nearest-with-backward-ties), inclusive.

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
    """Two-table as-of join via tagged union + window passes (no join).

    ``direction``:
      - ``backward`` — most recent right row with right.ts <= left.ts,
      - ``forward`` — earliest right row with right.ts >= left.ts,
      - ``nearest`` — whichever of the two is closer in time; equal
        distance prefers backward (pandas ``merge_asof`` tie rule).

    All inclusive on equal keys; one shuffle on ``key_cols`` regardless of
    direction (nearest adds a second in-partition sort, not a shuffle).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")

    lcols = [c for c in left.columns if c not in key_cols and c != ts_col]
    tagged_left = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(left.schema[ts_col].dataType).alias("__rts"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_value_cols],
    )
    tagged_right = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("__rts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(c + suffix) for c in right_value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Backward: ascending (ts, side) — right rows (side 0) sort before left
    # rows at equal ts, so CURRENT ROW frames include ts-peers (inclusive).
    w_bwd = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward: iterate ts DESCENDING; "last seen right row" is then the
    # smallest right.ts >= left.ts. side asc keeps equal-ts rights first.
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).desc(), "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    if direction in ("backward", "forward"):
        w = w_bwd if direction == "backward" else w_fwd
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

    # nearest: both passes, then pick per-row by |Δts| with backward ties.
    bwd_ts = F.last("__rts", ignorenulls=True).over(w_bwd)
    fwd_ts = F.last("__rts", ignorenulls=True).over(w_fwd)
    both = unioned.select(
        *key_cols,
        ts_col,
        "__side",
        *lcols,
        bwd_ts.alias("__bts"),
        fwd_ts.alias("__fts"),
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w_bwd).alias(c + "__b")
            for c in right_value_cols
        ],
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w_fwd).alias(c + "__f")
            for c in right_value_cols
        ],
    )
    # Distance comparison must work for any orderable ts type (timestamps
    # via epoch µs; numeric epoch columns as-is), keeping the three
    # directions API-consistent.
    from pyspark.sql.types import TimestampNTZType, TimestampType

    if isinstance(left.schema[ts_col].dataType, (TimestampType, TimestampNTZType)):
        def scale(c: F.Column) -> F.Column:  # type: ignore[name-defined]
            return F.unix_micros(c.cast("timestamp"))
    else:
        def scale(c):
            return c

    take_bwd = F.col("__bts").isNotNull() & (
        F.col("__fts").isNull()
        | (
            scale(F.col(ts_col)) - scale(F.col("__bts"))
            <= scale(F.col("__fts")) - scale(F.col(ts_col))
        )
    )
    picked = both.select(
        *key_cols,
        ts_col,
        "__side",
        *lcols,
        *[
            F.when(take_bwd, F.col(c + "__b"))
            .otherwise(F.col(c + "__f"))
            .alias(c + suffix)
            for c in right_value_cols
        ],
    )
    return picked.where(F.col("__side") == 1).drop("__side")


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
