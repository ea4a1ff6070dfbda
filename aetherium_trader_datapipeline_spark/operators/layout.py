"""Multi-dimensional data layout: z-order clustering for file skipping.

The reference prunes on one dimension — `{symbol}_{YYYYMMDD_HH}` filenames
(repositories/parquet.rs:45-48, detectors/gap.rs:36-46). At 100 TB you
also need pruning on the dimensions you did NOT partition by (user, key
range, time within a partition). Z-ordering interleaves the bits of
several grid-quantized columns into one sort key; range-partitioning and
sorting by that key makes every file a tight hyper-rectangle in all
clustered dimensions, so parquet min/max footer stats skip files for
predicates on ANY of them — the same mechanism Delta OPTIMIZE ZORDER uses,
built here from plain Spark expressions (JVM-side, no UDF).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Bit-interleave grid coordinates (already in [0, 2^bits)) into one
    BIGINT. Pure shift/or expression tree — whole-stage-codegen friendly."""
    n = len(cols)
    parts = []
    for i in range(bits):
        for j, c in enumerate(cols):
            parts.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Append a `__zkey` column interleaving `cols` (numeric/timestamp).

    Each column is min-max scaled to a 2^bits grid. The min/max pass is one
    cheap agg (footer-stat-backed for parquet sources); at 1000 executors
    it's a single job over footers, not a data scan bottleneck.
    """
    num = [
        F.col(c).cast("double")
        if dict(df.dtypes)[c] not in ("timestamp",)
        else F.col(c).cast("long").cast("double")
        for c in cols
    ]
    stats = df.agg(
        *[F.min(e).alias(f"mn{i}") for i, e in enumerate(num)],
        *[F.max(e).alias(f"mx{i}") for i, e in enumerate(num)],
    ).head()
    grid = []
    top = (1 << bits) - 1
    for i, e in enumerate(num):
        mn, mx = float(stats[f"mn{i}"]), float(stats[f"mx{i}"])
        span = (mx - mn) or 1.0
        grid.append(
            F.least(F.lit(top), F.floor((e - F.lit(mn)) / F.lit(span) * top)).cast("long")
        )
    return df.withColumn("__zkey", _interleave(grid, bits)), "__zkey"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by z-order: range-partition on the key
    (contiguous key ranges per file → tight per-file bounding boxes in all
    `cols`), sort within partitions (tight row-group stats), drop the key."""
    zdf, key = zorder_key(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )


def file_skipping_stats(
    spark, path: str, col: str
) -> DataFrame:
    """Per-file min/max of `col` — what a footer-stat pruner sees. Used to
    measure layout quality: sum of per-file ranges / global range ≈ the
    fraction of files a random point predicate must read."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
        .orderBy("file")
    )
