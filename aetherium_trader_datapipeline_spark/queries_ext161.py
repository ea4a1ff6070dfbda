"""Wave 161 (x551): banded dynamic time warping — a full dynamic
program run EXACTLY in both engines.

x551 — Sakoe–Chiba banded DTW (band r = 1) between each adjacent
symbol pair's hourly-volume series: the DP row at step i carries only
the three in-band cells D(i, i−1), D(i, i), D(i, i+1), so the state is
O(r) and the whole recurrence is integer arithmetic over 1e6-quantized
values (costs are |a_i − b_j| of exact integers; out-of-band cells are
an integer INF).  The Spark side folds the DP per pair in one Arrow
pass; the DuckDB oracle drags the three cells through a recursive CTE
whose middle/right cells nest the left cell's expression — the
within-row dependency written out symbolically, so both engines
compute the identical integers.  The elastic distance that compares
series with local time shifts, where x503's EWMA correlation assumes
alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

_INF = 4_000_000_000_000_000_000  # in-band integer infinity


def _x551_oracle() -> str:
    # cell expressions at step i (series index rn):
    #   cost(o) = ABS(av_i - bv_{i+o}) with bv out-of-range -> INF-guard
    #   dl' = cost(-1) + LEAST(prev_dm, prev_dl)            (j = i-1)
    #   dm' = cost(0)  + LEAST(prev_dr, prev_dm, dl')       (j = i)
    #   dr' = cost(+1) + LEAST(prev_dr, dm')                (j = i+1)
    # prev_dm is D(i-1, i-1); prev_dr is D(i-1, i); prev_dl is D(i-1, i-2).
    inf = str(_INF)
    cost = {
        -1: "CASE WHEN o.bvl IS NULL THEN " + inf
            + " ELSE ABS(o.av - o.bvl) END",
        0: "ABS(o.av - o.bv)",
        1: "CASE WHEN o.bvr IS NULL THEN " + inf
           + " ELSE ABS(o.av - o.bvr) END",
    }
    dl = f"LEAST({cost[-1]} + LEAST(r.dm, r.dl), {inf})"
    dm = f"LEAST({cost[0]} + LEAST(r.dr, r.dm, {dl}), {inf})"
    dr = f"LEAST({cost[1]} + LEAST(r.dr, {dm}), {inf})"
    return f"""
    WITH RECURSIVE hourly AS (
      SELECT user_id % 10 AS sym,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hkey,
             CAST(SUM(CAST(FLOOR(ABS(value) * 1e6) AS BIGINT)) AS BIGINT)
               AS v
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id % 10, CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600
    ),
    ordered AS (
      SELECT sym, v,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY hkey) AS rn
      FROM hourly
    ),
    pairs AS MATERIALIZED (
      -- MATERIALIZED is load-bearing (r8, the x522 lesson): the recursive
      -- term below rejoins `pairs` every level, and DuckDB inlines
      -- unmaterialized CTEs — re-running these window/join scans at every
      -- recursion step made the oracle O(depth x |events|): 326 s at
      -- sf0.1 vs ~17 s materialized.
      SELECT a.sym AS sa, a.sym + 1 AS sb, a.rn, a.v AS av,
             b0.v AS bv, bl.v AS bvl, br.v AS bvr,
             MIN(LEAST(amax.n, bmax.n)) OVER (PARTITION BY a.sym) AS n
      FROM ordered a
      JOIN ordered b0 ON b0.sym = a.sym + 1 AND b0.rn = a.rn
      LEFT JOIN ordered bl ON bl.sym = a.sym + 1 AND bl.rn = a.rn - 1
      LEFT JOIN ordered br ON br.sym = a.sym + 1 AND br.rn = a.rn + 1
      JOIN (SELECT sym, MAX(rn) AS n FROM ordered GROUP BY sym) amax
        ON amax.sym = a.sym
      JOIN (SELECT sym, MAX(rn) AS n FROM ordered GROUP BY sym) bmax
        ON bmax.sym = a.sym + 1
      WHERE a.sym IN (0, 2, 4, 6, 8)
    ),
    rec AS (
      SELECT sa, sb, rn, n,
             CAST({inf} AS BIGINT) AS dl,
             ABS(av - bv) AS dm,
             CASE WHEN bvr IS NULL THEN CAST({inf} AS BIGINT)
                  ELSE ABS(av - bv) + ABS(av - bvr) END AS dr
      FROM pairs WHERE rn = 1
      UNION ALL
      SELECT o.sa, o.sb, o.rn, o.n,
             {dl} AS dl,
             {dm} AS dm,
             {dr} AS dr
      FROM rec r JOIN pairs o ON o.sa = r.sa AND o.rn = r.rn + 1
      WHERE r.rn < r.n
    )
    SELECT CAST(sa AS BIGINT) AS sym_a, CAST(sb AS BIGINT) AS sym_b,
           CAST(n AS BIGINT) AS series_len,
           CAST(dm AS BIGINT) AS dtw_fp,
           ROUND(CAST(dm AS DOUBLE) / n / 1e6, 6) AS dtw_per_step
    FROM rec WHERE rn = n ORDER BY sym_a
"""


@register("x551_dtw_banded", oracle=_x551_oracle(), tags=("timeseries", "pandas"))
def x551_dtw_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded DTW (r=1) per adjacent symbol pair: one Arrow fold per
    pair carrying the 3-cell DP row; mirrors the recursive-CTE oracle's
    integer arithmetic exactly."""
    import pandas as pd

    events = load_tables(spark, sf_dir)["events"]
    hourly = (
        events.where("value IS NOT NULL")
        .selectExpr(
            "user_id % 10 AS sym",
            "unix_seconds(ts) DIV 3600 AS hkey",
            "CAST(FLOOR(ABS(value) * 1e6) AS BIGINT) AS vol_fp",
        )
        .groupBy("sym", "hkey")
        .agg(F.sum("vol_fp").cast("long").alias("v"))
    )
    from pyspark.sql.window import Window

    # INDEX alignment (per-sym row number), matching the oracle's rn
    # join — hour alignment would disagree when hour sets differ
    idx = hourly.withColumn(
        "rn", F.row_number().over(Window.partitionBy("sym").orderBy("hkey"))
    )
    a = idx.where("sym IN (0, 2, 4, 6, 8)").selectExpr(
        "sym AS sa", "rn", "v AS av"
    )
    b = idx.selectExpr("sym AS sb", "rn AS rnb", "v AS bv")
    pairs = a.join(
        b, (F.col("sb") == F.col("sa") + 1) & (F.col("rn") == F.col("rnb"))
    ).select("sa", "sb", "rn", "av", "bv")

    INF = _INF

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        avs = pdf["av"].tolist()
        bvs = pdf["bv"].tolist()
        n = len(avs)
        # D row at i: (dl, dm, dr) = D(i, i-1), D(i, i), D(i, i+1)
        dm = abs(avs[0] - bvs[0])
        dl = INF
        dr = (abs(avs[0] - bvs[0]) + abs(avs[0] - bvs[1])
              if n > 1 else INF)
        for i in range(1, n):
            av = avs[i]
            c_l = abs(av - bvs[i - 1])
            c_m = abs(av - bvs[i])
            c_r = abs(av - bvs[i + 1]) if i + 1 < n else INF
            ndl = min(c_l + min(dm, dl), INF)
            ndm = min(c_m + min(dr, dm, ndl), INF)
            ndr = min(c_r + min(dr, ndm), INF)
            dl, dm, dr = ndl, ndm, ndr
        return pd.DataFrame(
            {
                "sym_a": [int(pdf["sa"].iloc[0])],
                "sym_b": [int(pdf["sb"].iloc[0])],
                "series_len": [n],
                "dtw_fp": [dm],
                "dtw_per_step": [round(dm / n / 1e6, 6)],
            }
        )

    return (
        pairs.groupBy("sa")
        .applyInPandas(
            fold,
            "sym_a bigint, sym_b bigint, series_len bigint, "
            "dtw_fp bigint, dtw_per_step double",
        )
        .orderBy("sym_a")
    )
