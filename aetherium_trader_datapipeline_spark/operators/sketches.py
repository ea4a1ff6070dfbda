"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 4 as hll_sketch_agg / hll_union_agg / hll_sketch_estimate).

The 100 TB pattern: store one small binary sketch per (key, partition)
instead of raw ids, then answer "distinct over ANY key/time range" by
merging sketches — a metadata-sized scan instead of a full-data distinct.
Sketches are commutative/associative, so partial aggregation and AQE apply
exactly as for sums. The reference has no sketch surface; this is part of
the training-data extension (SURVEY.md §2.2 tolerance-checked family,
alongside approx_count_distinct x53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """One HLL sketch (binary column ``sketch``) per group — the stored
    rollup row. lgk=12 → ~2 KB per sketch, ~2% relative error."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lgk})").alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_merge_estimate(
    rollup: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge stored sketches (optionally regrouped coarser) and estimate
    distinct counts. Merging never rescans the base data."""
    merged = F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("approx_distinct")
    if group_cols:
        return rollup.groupBy(*group_cols).agg(merged, F.sum("n_rows").alias("n_rows"))
    return rollup.agg(merged, F.sum("n_rows").alias("n_rows"))
