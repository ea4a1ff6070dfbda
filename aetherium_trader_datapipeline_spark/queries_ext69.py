"""Wave 69 (x304): Hilbert-curve layout vs Morton — the locality upgrade.

x294 measures WHY multi-dimensional clustering pays (zone maps prune on
both columns); x304 measures WHICH curve to use.  Morton (bit interleave)
makes long diagonal jumps between quadrants, so consecutive key ranges
straddle wide rectangles; the Hilbert curve visits every cell of a
quadrant before leaving it, so the same 1000-row "files" get tighter
min/max boxes.  `operators/layout.hilbert_key` runs the standard xy2d
transform (quadrant digit (3·rx)⊕ry · s², reflect-and-swap rotation) as a
chain of per-level projections — no UDF, whole-stage codegen, and NOT one
nested Column fold (that tree is 3^bits and OOMs the analyzer; see the
operator docstring) — pinned against a pure-Python reference loop in
pytest and replayed step-for-step by the DuckDB oracle's chained CTEs.

Output per layout: file count, files scanned by a date predicate and a
key predicate, and the total key/date spans of the per-file boxes (the
locality metric — lower span = tighter zone maps = better pruning for
ANY future predicate, not just the two probed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.queries_ext66 import _ZBITS294
from aetherium_trader_datapipeline_spark.tables import load_tables


def _hilbert_cte_chain(bits: int = 8) -> str:
    """DuckDB CTE chain replaying hilbert_d_expr level by level."""
    n = 1 << bits
    steps = []
    prev = "h_base"
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        cur = f"h{k}"
        steps.append(f"""
    {cur} AS (
      SELECT l_orderkey, l_shipdate, a, b,
             CASE WHEN ry = 0 AND rx = 1 THEN {n - 1} - hy
                  WHEN ry = 0 THEN hy ELSE hx END AS hx,
             CASE WHEN ry = 0 AND rx = 1 THEN {n - 1} - hx
                  WHEN ry = 0 THEN hx ELSE hy END AS hy,
             hd + {s * s} * CASE WHEN rx = 1 AND ry = 1 THEN 2
                                 WHEN rx = 1 THEN 3
                                 WHEN ry = 1 THEN 1 ELSE 0 END AS hd
      FROM (SELECT *, (hx // {s}) % 2 AS rx, (hy // {s}) % 2 AS ry FROM {prev}) t
    )""")
        prev = cur
    return ",\n".join(steps), prev


_H_STEPS, _H_LAST = _hilbert_cte_chain(8)


def _duck_layout(name: str, order: str) -> str:
    return f"""
    f_{name} AS (
      SELECT (rn - 1) // 1000 AS fid,
             MIN(l_shipdate) AS dlo, MAX(l_shipdate) AS dhi,
             MIN(l_orderkey) AS klo, MAX(l_orderkey) AS khi
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY {order}) AS rn FROM keyed) t
      GROUP BY (rn - 1) // 1000
    ),
    s_{name} AS (
      SELECT '{name}' AS layout,
             CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(CASE WHEN dhi >= DATE '1995-06-01'
                            AND dlo <= DATE '1995-06-30' THEN 1 ELSE 0 END)
                  AS BIGINT) AS files_date_pred,
             CAST(SUM(CASE WHEN khi >= 1000 AND klo <= 5000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS files_key_pred,
             CAST(SUM(khi - klo) AS BIGINT) AS key_span_total,
             CAST(SUM(date_diff('day', dlo, dhi)) AS BIGINT) AS date_span_days
      FROM f_{name}
    )"""


_X304_ORACLE = f"""
    WITH g AS (
      SELECT l_orderkey, l_shipdate,
             NTILE(256) OVER (ORDER BY l_shipdate, l_orderkey) - 1 AS a,
             NTILE(256) OVER (ORDER BY l_orderkey, l_shipdate) - 1 AS b
      FROM lineitem
    ),
    h_base AS (
      SELECT l_orderkey, l_shipdate, a, b,
             a AS hx, b AS hy, CAST(0 AS BIGINT) AS hd
      FROM g
    ),
    {_H_STEPS},
    keyed AS (
      SELECT l_orderkey, l_shipdate,
             CAST({_ZBITS294.format(div="//")} AS BIGINT) AS zval,
             hd AS hval
      FROM {_H_LAST}
    ),
    {_duck_layout("hilbert", "hval, l_orderkey, l_shipdate")},
    {_duck_layout("z_order", "zval, l_orderkey, l_shipdate")}
    SELECT * FROM s_hilbert
    UNION ALL SELECT * FROM s_z_order
    ORDER BY layout
"""


@register("x304_hilbert_vs_zorder", oracle=_X304_ORACLE, tags=("ops", "layout"))
def x304_hilbert_vs_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r7 rewrite (VERDICT r6 ask #8 / global-band policy): the r5 form
    ran two global NTILE windows + one global ROW_NUMBER per layout —
    four single-partition sorts of all of lineitem. Rank ties permute
    only rows identical in every aggregated column, so the file stats —
    and the DuckDB oracle (unchanged, still the NTILE form) — hash
    identically.

    r12 (VERDICT r11 ask #3): unlike x294, this key never needs
    full-resolution GLOBAL ranks in its prefix — the two NTILE(256) grid
    coordinates are the only thing the curves consume, so
    operators.layout.ntile_bucket assigns each tile from the broadcast
    bucket grid alone for every bucket that lies inside one tile (~90%
    of rows never shuffle for the tile pass) and windows only the <=255
    straddling buckets.  And because BOTH curve keys are bijective
    functions of the (a, b) cell, rank-within-hval-cell ==
    rank-within-zval-cell == rank within (a, b): ONE 60M-row window
    partitioned by (a, b) serves both curves, with each curve's
    cum-before offsets computed on the 65,536-cell joint histogram
    (weight-summed two-level offsets), never on the rows.  The four
    60M exchange+sorts of the r7 form collapse to one."""
    from aetherium_trader_datapipeline_spark.operators.layout import (
        _bucket_offset_grid,
        _interleave,
        hilbert_key,
        materialize_disk,
        ntile_bucket,
    )

    li = load_tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_shipdate")
    n = li.count()
    ta = materialize_disk(
        ntile_bucket(li, "l_shipdate", ["l_orderkey"], n, 256, "ta")
    )
    tb = ntile_bucket(
        ta, "l_orderkey DIV 8192", ["l_orderkey", "l_shipdate"], n, 256, "tb"
    )
    g = tb.select(
        "l_orderkey",
        "l_shipdate",
        (F.col("ta") - 1).alias("a"),
        (F.col("tb") - 1).alias("b"),
    )
    g = materialize_disk(g)
    # joint (a, b) histogram: <=65,536 cells; curve keys + per-curve
    # cum-before offsets all live here, not on the 60M rows
    joint = g.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    jk = hilbert_key(joint, "a", "b", bits=8, out_col="hval").withColumn(
        "zval",
        _interleave(
            [F.col("a").cast("bigint"), F.col("b").cast("bigint")], 8
        ).cast("bigint"),
    )
    offh = _bucket_offset_grid(jk, "hval", weight="c").select(
        F.col("__gb").alias("hval"), F.col("__cb").alias("cbh")
    )
    offz = _bucket_offset_grid(jk, "zval", weight="c").select(
        F.col("__gb").alias("zval"), F.col("__cb").alias("cbz")
    )
    cells = (
        jk.join(offh, "hval").join(offz, "zval").select("a", "b", "cbh", "cbz")
    ).localCheckpoint(eager=False)
    wcell = Window.partitionBy("a", "b").orderBy("l_orderkey", "l_shipdate")
    allr = (
        g.join(F.broadcast(cells), ["a", "b"])
        .withColumn("rn", F.row_number().over(wcell))
        .withColumn("rnh", F.col("cbh") + F.col("rn"))
        .withColumn("rnz", F.col("cbz") + F.col("rn"))
    )

    exploded = allr.select(
        "l_orderkey",
        "l_shipdate",
        F.expr("stack(2, 'hilbert', rnh, 'z_order', rnz)").alias("layout", "rn"),
    )
    files = (
        exploded.withColumn("fid", F.expr("(rn - 1) DIV 1000"))
        .groupBy("layout", "fid")
        .agg(
            F.min("l_shipdate").alias("dlo"),
            F.max("l_shipdate").alias("dhi"),
            F.min("l_orderkey").alias("klo"),
            F.max("l_orderkey").alias("khi"),
        )
    )
    return (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(
                F.when(
                    (F.col("dhi") >= F.lit("1995-06-01").cast("date"))
                    & (F.col("dlo") <= F.lit("1995-06-30").cast("date")),
                    1,
                ).otherwise(0)
            ).alias("files_date_pred"),
            F.sum(
                F.when((F.col("khi") >= 1000) & (F.col("klo") <= 5000), 1).otherwise(
                    0
                )
            ).alias("files_key_pred"),
            F.sum(F.col("khi") - F.col("klo")).alias("key_span_total"),
            F.sum(F.datediff("dhi", "dlo")).cast("bigint").alias("date_span_days"),
        )
        .orderBy("layout")
    )
