"""STAGED r13 registry wave (NOT registered — the registry is frozen at
575 keys until the driver's never-verified tail closes; VERDICT r11 ask
#6 / SURVEY.md §2.4).

Each entry here is a full registry-grade (query, oracle) pair over the
round-12 operator-library families, verified locally at driver fidelity
(tests/test_staged_r13.py runs the same canonicalize-and-diff the sweep
uses, and the tri-SF check script exercises sf0.001/sf0.01/sf1).  When
the freeze lifts, promotion = move an entry into a `queries_ext170+`
module under `register()` (plus the §2.4 checklist: window-gate
classification, replica precheck, 10x/100x timing row — the probe rows
already exist in SCALE.md).

Driver-hash constraints honored (tests/oracle.py): no DECIMAL finals,
exact-mode sketches only (saturated KMV estimates are hash-functions of
xxhash64 and have no SQL oracle — that tier stays pytest vs the
pure-Python reference), modal tie-breaks written identically on both
sides (count DESC, value-string DESC), ts-derived columns cast to µs
TIMESTAMP.

Window-gate notes (for promotion): x576/x577/x578 sketch keys partition
their prune windows by (group, salt)/(group) with the (k+1) literal
retention bound; x579/x582 profiler keys window nothing; x580 audits
with joins only; x581's within-bucket window is chunk-partitioned
(`l_orderkey DIV 8192`) with grid-sized offset windows (the documented
chunk-grid band).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.tables import load_tables

# key -> (run, oracle_sql)
STAGED: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str]] = {}


def _staged(key: str, oracle: str):
    def deco(fn):
        STAGED[key] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# theta/KMV sketches — exact mode (k above NDV) so the estimate IS the
# distinct count and the oracle is plain COUNT(DISTINCT)
# ---------------------------------------------------------------------------

_EXACT_K = 1 << 20


@_staged(
    "x576_theta_daily_users",
    """
    SELECT CAST(ts AS DATE) AS d,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def x576_theta_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users via a stored-sketch rollup row per day
    (exact mode).  The production shape persists the sketch table
    (streaming.rollup.theta_rollup_sink) and estimates from it."""
    from aetherium_trader_datapipeline_spark.operators.sketches import (
        theta_estimate,
        theta_sketch,
    )

    ev = load_tables(spark, sf_dir)["events"].withColumn("d", F.to_date("ts"))
    sk = theta_estimate(theta_sketch(ev, ["d"], "user_id", k=_EXACT_K))
    return sk.select(
        "d", F.col("estimate").cast("bigint").alias("n_users")
    ).orderBy("d")


@_staged(
    "x577_theta_weekly_rollup",
    """
    SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wk,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def x577_theta_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct users from DAILY sketch rows via theta_merge —
    merge-don't-rescan; exact mode makes it oracle-checkable (the
    saturated tier is pinned vs the Python reference in pytest)."""
    from aetherium_trader_datapipeline_spark.operators.sketches import (
        theta_estimate,
        theta_merge,
        theta_sketch,
    )

    ev = load_tables(spark, sf_dir)["events"].withColumn("d", F.to_date("ts"))
    daily = theta_sketch(ev, ["d"], "user_id", k=_EXACT_K)
    weekly = theta_merge(
        daily.withColumn("wk", F.date_trunc("week", "d")).drop("d"), ["wk"]
    )
    return (
        theta_estimate(weekly)
        .select("wk", F.col("estimate").cast("bigint").alias("n_users"))
        .orderBy("wk")
    )


@_staged(
    "x578_theta_segment_overlap",
    """
    WITH hi AS (SELECT DISTINCT user_id FROM events WHERE value > 100.0),
         lo AS (SELECT DISTINCT user_id FROM events WHERE value <= 100.0)
    SELECT
      (SELECT COUNT(*) FROM (SELECT * FROM hi INTERSECT SELECT * FROM lo) t)
        AS n_both,
      (SELECT COUNT(*) FROM (SELECT * FROM hi EXCEPT SELECT * FROM lo) t)
        AS n_hi_only,
      (SELECT COUNT(*) FROM (SELECT * FROM lo EXCEPT SELECT * FROM hi) t)
        AS n_lo_only
    """,
)
def x578_theta_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between the high-value and low-value event user
    sets from two STORED sketches — the set-operation capability HLL
    lacks; exact mode -> exact INTERSECT/EXCEPT cardinalities."""
    from aetherium_trader_datapipeline_spark.operators.sketches import (
        theta_a_not_b,
        theta_estimate,
        theta_intersect,
        theta_sketch,
    )

    ev = load_tables(spark, sf_dir)["events"]
    hi = theta_sketch(ev.where(F.col("value") > 100.0), [], "user_id", k=_EXACT_K)
    lo = theta_sketch(ev.where(F.col("value") <= 100.0), [], "user_id", k=_EXACT_K)

    def est(df: DataFrame, name: str) -> DataFrame:
        return theta_estimate(df).select(
            F.col("estimate").cast("bigint").alias(name)
        )

    return (
        est(theta_intersect(hi, lo, []), "n_both")
        .crossJoin(est(theta_a_not_b(hi, lo, []), "n_hi_only"))
        .crossJoin(est(theta_a_not_b(lo, hi, []), "n_lo_only"))
    )


# ---------------------------------------------------------------------------
# column profiler — both plan shapes, oracle = per-column scalar subqueries
# with the same modal tie-break (count DESC, value-string DESC)
# ---------------------------------------------------------------------------

def _profile_oracle(table: str, cols: list[str]) -> str:
    parts = []
    for c in cols:
        parts.append(
            f"""
    SELECT '{c}' AS "column",
           (SELECT COUNT(*) FROM {table}) AS n_rows,
           (SELECT COUNT(*) - COUNT({c}) FROM {table}) AS n_null,
           (SELECT COUNT(DISTINCT {c}) FROM {table}) AS n_distinct,
           (SELECT CAST(MIN({c}) AS VARCHAR) FROM {table}) AS min_value,
           (SELECT CAST(MAX({c}) AS VARCHAR) FROM {table}) AS max_value,
           (SELECT v FROM (SELECT CAST({c} AS VARCHAR) v, COUNT(*) cnt
                           FROM {table} WHERE {c} IS NOT NULL
                           GROUP BY 1 ORDER BY cnt DESC, v DESC LIMIT 1) t)
             AS top_value,
           (SELECT cnt FROM (SELECT CAST({c} AS VARCHAR) v, COUNT(*) cnt
                             FROM {table} WHERE {c} IS NOT NULL
                             GROUP BY 1 ORDER BY cnt DESC, v DESC LIMIT 1) t)
             AS top_count,
           (SELECT COUNT(DISTINCT {c}) <= 1 FROM {table}) AS is_constant"""
        )
    return " UNION ALL ".join(parts)


_X579_COLS = ["l_returnflag", "l_orderkey", "l_quantity", "l_linenumber"]


@_staged("x579_profile_lineitem", _profile_oracle("lineitem", _X579_COLS))
def x579_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.profile import (
        profile_columns,
    )

    li = load_tables(spark, sf_dir)["lineitem"]
    return profile_columns(li, _X579_COLS).drop("value_type")


_X582_COLS = ["o_orderstatus", "o_orderpriority"]


@_staged("x582_profile_orders_tuplegrid", _profile_oracle("orders", _X582_COLS))
def x582_profile_orders_tuplegrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-scan tuple-grid plan shape on its applicability domain
    (two low-NDV dimension columns)."""
    from aetherium_trader_datapipeline_spark.operators.profile import (
        profile_columns_tuple_grid,
    )

    od = load_tables(spark, sf_dir)["orders"]
    return profile_columns_tuple_grid(od, _X582_COLS).drop("value_type")


# ---------------------------------------------------------------------------
# join-completeness audit
# ---------------------------------------------------------------------------

@_staged(
    "x580_join_completeness_daily",
    """
    WITH r AS (SELECT DISTINCT event_id FROM events WHERE value > 100.0),
         f AS (SELECT MAX(ts) - INTERVAL 1 DAY AS fr FROM events
               WHERE value > 100.0)
    SELECT CAST(e.ts AS DATE) AS d,
           COUNT(*) AS n_left,
           CAST(COALESCE(SUM(CASE WHEN r.event_id IS NOT NULL THEN 1 END), 0)
                AS BIGINT) AS n_matched,
           CAST(COALESCE(SUM(CASE WHEN r.event_id IS NULL AND e.ts <= f.fr
                             THEN 1 END), 0) AS BIGINT) AS n_unmatched_final,
           CAST(COALESCE(SUM(CASE WHEN r.event_id IS NULL AND NOT (e.ts <= f.fr)
                             THEN 1 END), 0) AS BIGINT) AS n_pending
    FROM events e LEFT JOIN r USING (event_id) CROSS JOIN f
    GROUP BY 1 ORDER BY 1
    """,
)
def x580_join_completeness_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily watermark-aware completeness of events against the
    high-value 'ack' stream keyed by event_id (1-day horizon)."""
    from aetherium_trader_datapipeline_spark.operators.joinaudit import (
        join_completeness_report,
    )

    ev = load_tables(spark, sf_dir)["events"].withColumn("d", F.to_date("ts"))
    acks = ev.where(F.col("value") > 100.0).select("event_id", "ts")
    rep = join_completeness_report(
        ev, acks, ["event_id"], "ts", "ts", "1 day", by=["d"]
    )
    return rep.drop("completeness").orderBy("d")


# ---------------------------------------------------------------------------
# incremental NTILE from merged count grids
# ---------------------------------------------------------------------------

@_staged(
    "x581_ntile_from_merged_grid",
    """
    WITH t AS (
      SELECT l_orderkey,
             NTILE(64) OVER (ORDER BY l_orderkey, l_linenumber) AS tile
      FROM lineitem)
    SELECT tile, COUNT(*) AS n,
           MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
    FROM t GROUP BY tile ORDER BY tile
    """,
)
def x581_ntile_from_merged_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NTILE(64) tiles assigned from two per-batch bucket-count
    grids merged into one — the incremental re-layout path: history is
    never re-counted, and (l_orderkey, l_linenumber) is a unique order
    so the per-tile aggregate is tie-proof."""
    from aetherium_trader_datapipeline_spark.operators.layout import (
        bucket_count_grid,
        merge_count_grids,
        ntile_bucket_from_grid,
    )

    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_linenumber"
    )
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    grid = merge_count_grids(
        bucket_count_grid(a, "l_orderkey DIV 8192"),
        bucket_count_grid(b, "l_orderkey DIV 8192"),
    )
    tiled = ntile_bucket_from_grid(
        li, grid, "l_orderkey DIV 8192", ["l_orderkey", "l_linenumber"],
        64, "tile", on_missing_bucket="drop",
    )
    return (
        tiled.groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
        .orderBy("tile")
    )
