"""Per-column NULL / constancy / cardinality profiler.

The schema-on-write half of data quality: before publishing (or before
choosing encodings, partition keys, or dedup columns for) a 100 TB table,
you want, per column — row count, NULL count, distinct count, min/max,
the modal value and its frequency, and whether the column is constant.
The reference validates fixed tick fields at ingest
(ingestion/domain/src/validation.rs); this is the table-at-rest,
any-schema generalization, next to operators/expectations.py (which
gates on declared rules; the profiler MEASURES, rules then cite it).

Two plan shapes, same output contract:

- :func:`profile_columns` — one collapsed value grid PER COLUMN
  (``groupBy(col).count()``).  Each grid scan is column-pruned, so a
  parquet source reads exactly one column per branch; every grid is a
  map-side partial aggregation collapsing to NDV rows before the
  shuffle.  The right default: total bytes read ≈ one full-table scan
  split across branches, no row ever crosses the network un-collapsed.
- :func:`profile_columns_tuple_grid` — ONE scan building the joint
  (c1..cn) tuple grid, per-column stats derived by re-aggregating the
  grid (the x574 device: distinct-of-projection over distinct tuples IS
  the column distinct; counts sum).  Strictly better when the joint
  tuple NDV is small (dict-encodable dimension prefixes); useless when
  any column is near-unique — the grid degenerates to the row count.
  The applicability bound is the caller's, as in x574.

Output (one row per profiled column):
  column, value_type, n_rows, n_null, n_distinct (non-NULL), min_value,
  max_value, top_value, top_count, is_constant — min/max/top stringified
  AFTER native-type aggregation (numeric min is numeric, then cast).
``is_constant`` is n_distinct <= 1 over non-NULL values (an all-NULL or
empty column profiles as constant; n_distinct says which).
Modal ties break deterministically toward the larger value string.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOP = (
    "max_by(named_struct('v', CAST(__v AS STRING), 'c', __c), "
    "struct(__c, CAST(__v AS STRING))) FILTER (WHERE __v IS NOT NULL)"
)


def _profile_grid(grid: DataFrame, colname: str, value_type: str) -> DataFrame:
    """One profile row from a collapsed (__v value, __c count) grid."""
    return grid.agg(
        F.lit(colname).alias("column"),
        F.lit(value_type).alias("value_type"),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("__v").isNull(), F.col("__c"))), F.lit(0)
        ).alias("n_null"),
        F.count("__v").alias("n_distinct"),
        F.min("__v").cast("string").alias("min_value"),
        F.max("__v").cast("string").alias("max_value"),
        F.expr(_TOP).alias("__top"),
    ).select(
        "column",
        "value_type",
        "n_rows",
        "n_null",
        "n_distinct",
        "min_value",
        "max_value",
        F.col("__top.v").alias("top_value"),
        F.col("__top.c").alias("top_count"),
        (F.col("n_distinct") <= 1).alias("is_constant"),
    )


def _resolve_cols(df: DataFrame, cols: list[str] | None) -> list[str]:
    """Default to every PROFILABLE column: maps are neither groupable
    nor orderable in Spark, so the all-columns default skips them
    (profiling a publish-gate table as-is must not crash on a props
    map); naming a map column EXPLICITLY raises with the column named,
    instead of an AnalysisException from deep inside the grid plan."""
    types = dict(df.dtypes)
    if cols is None:
        resolved = [c for c in df.columns if not types[c].startswith("map")]
    else:
        for c in cols:
            if types.get(c, "").startswith("map"):
                raise ValueError(
                    f"column {c!r} has map type {types[c]!r} — maps are not "
                    "groupable/orderable; profile its keys or values instead "
                    "(e.g. map_keys/map_values into an array column)"
                )
        resolved = list(cols)
    if not resolved:
        # cols=[] or an all-map frame would otherwise surface as an
        # opaque "reduce() of empty iterable" TypeError (ADVICE r12)
        raise ValueError(
            "no profilable columns: the resolved column list is empty "
            "(cols=[] or every column is map-typed)"
        )
    return resolved


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: every profilable column — map-typed
    columns are skipped, see :func:`_resolve_cols`) via one
    column-pruned value grid per column.  See the module docstring for
    the plan shape and output contract."""
    cols = _resolve_cols(df, cols)
    types = dict(df.dtypes)
    parts = []
    for c in cols:
        grid = (
            df.select(F.col(c).alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        parts.append(_profile_grid(grid, c, types[c]))
    return reduce(DataFrame.unionByName, parts)


def profile_columns_tuple_grid(
    df: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Profile ``cols`` from ONE joint tuple grid (x574's device).  The
    grid is lazily checkpointed — it feeds every per-column branch, and
    by the applicability contract it is small (joint NDV of
    dict-encodable columns), so the tiny-grid localCheckpoint policy
    applies, not materialize_disk."""
    cols = _resolve_cols(df, cols)
    types = dict(df.dtypes)
    tg = (
        df.groupBy(*[F.col(c).alias(f"__t{i}") for i, c in enumerate(cols)])
        .agg(F.count(F.lit(1)).alias("__tc"))
        .localCheckpoint(eager=False)
    )
    parts = []
    for i, c in enumerate(cols):
        grid = tg.groupBy(F.col(f"__t{i}").alias("__v")).agg(
            F.sum("__tc").alias("__c")
        )
        parts.append(_profile_grid(grid, c, types[c]))
    return reduce(DataFrame.unionByName, parts)


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    null_rate_jump: float = 0.05,
    ndv_ratio_drop: float = 0.5,
) -> DataFrame:
    """Diff two profile outputs (same schema as :func:`profile_columns`)
    into a drift report — the publish gate between yesterday's snapshot
    profile and today's: one row per (column, issue).

    Issues:
      - ``column_added`` / ``column_removed``  — schema drift.
      - ``type_changed``                       — value_type differs.
      - ``null_rate_jump``  — NULL fraction rose by more than
        ``null_rate_jump`` (absolute).
      - ``ndv_collapse``    — distinct count fell below
        ``ndv_ratio_drop`` x the old NDV, compared RAW, not scaled by
        row count: for the intended snapshot-over-time use NDV never
        legitimately shrinks much, while row-scaling would false-fire
        on every bounded-domain column (a 3-value flag keeps 3 distinct
        values at any size — measured against the sf0.001 vs sf0.01
        fixtures).  Comparing a small sample against a full table is
        the caller's ratio to loosen.
      - ``became_constant`` — was varying, now constant.

    Profile rows are metadata-sized, so the whole diff is a grid join —
    run it on STORED profiles, never by rescanning the data."""
    o = old.select([F.col(c).alias(f"o_{c}") for c in old.columns])
    n = new.select([F.col(c).alias(f"n_{c}") for c in new.columns])
    j = o.join(n, F.col("o_column") == F.col("n_column"), "full_outer")
    null_rate = lambda p: F.col(f"{p}_n_null") / F.greatest(  # noqa: E731
        F.col(f"{p}_n_rows"), F.lit(1)
    )
    issues = F.array_compact(
        F.array(
            F.when(F.col("o_column").isNull(), F.lit("column_added")),
            F.when(F.col("n_column").isNull(), F.lit("column_removed")),
            F.when(
                F.col("o_column").isNotNull()
                & F.col("n_column").isNotNull()
                & (F.col("o_value_type") != F.col("n_value_type")),
                F.lit("type_changed"),
            ),
            F.when(
                null_rate("n") - null_rate("o") > null_rate_jump,
                F.lit("null_rate_jump"),
            ),
            F.when(
                (F.col("o_n_distinct") > 0)
                & (
                    F.col("n_n_distinct")
                    < F.col("o_n_distinct") * F.lit(ndv_ratio_drop)
                ),
                F.lit("ndv_collapse"),
            ),
            F.when(
                (~F.col("o_is_constant")) & F.col("n_is_constant"),
                F.lit("became_constant"),
            ),
        )
    )
    return (
        j.withColumn("issue", F.explode(issues))
        .select(
            F.coalesce(F.col("o_column"), F.col("n_column")).alias("column"),
            "issue",
            F.col("o_value_type").alias("old_type"),
            F.col("n_value_type").alias("new_type"),
            null_rate("o").alias("old_null_rate"),
            null_rate("n").alias("new_null_rate"),
            F.col("o_n_distinct").alias("old_n_distinct"),
            F.col("n_n_distinct").alias("new_n_distinct"),
        )
        .orderBy("column", "issue")
    )
