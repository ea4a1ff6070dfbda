#!/usr/bin/env python
"""Scale probe for the round-12 library operator families (SURVEY.md
§2.4 candidates): theta sketches, the column profiler, the
join-completeness audit, and grid-based NTILE assignment.

Usage:
  python scripts/probe_library_ops.py [replica_dir]
defaults: /root/repo/.data/sf1  (10x; .data/sf10x is the 100x replica)

One JSON line per op: {"op": ..., "wall_s": ..., "rows": ..., "dir": ...}
Each op's DataFrame is CONSTRUCTED inside the timed window (a thunk), so
eager construction-time jobs — e.g. the join audit's frontier scalar
scan — are measured, not leaked outside the clock (r12 review).
Compare decades for sublinearity.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1"

    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.joinaudit import (
        join_completeness_report,
    )
    from aetherium_trader_datapipeline_spark.operators.layout import (
        bucket_count_grid,
        merge_count_grids,
        ntile_bucket_from_grid,
    )
    from aetherium_trader_datapipeline_spark.operators.profile import (
        profile_columns,
        profile_columns_tuple_grid,
    )
    from aetherium_trader_datapipeline_spark.operators.sketches import (
        dd_merge,
        dd_quantiles,
        dd_sketch,
        theta_estimate,
        theta_merge,
        theta_sketch,
        theta_union,
    )
    from aetherium_trader_datapipeline_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="probe-wh-")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{replica}/lineitem.parquet")
    ev = spark.read.parquet(f"{replica}/events.parquet")
    li.agg(F.sum("l_orderkey")).collect()  # warm scan
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))

    def timed(op, build, action="collect"):
        t0 = time.monotonic()
        df = build()
        rows = df.count() if action == "count" else len(df.collect())
        print(
            json.dumps(
                {
                    "op": op,
                    "wall_s": round(time.monotonic() - t0, 2),
                    "rows": rows,
                    "dir": replica,
                }
            ),
            flush=True,
        )

    # per-month KMV sketches of order keys, estimated
    timed(
        "theta_sketch_monthly",
        lambda: theta_estimate(
            theta_sketch(
                li.withColumn("m", F.date_trunc("month", "l_shipdate")),
                ["m"],
                "l_orderkey",
                k=4096,
            )
        ).select("m", "estimate"),
    )
    # split-half sketch + lossless merge + estimate (global)
    half_a = li.where(F.col("l_orderkey") % 2 == 0)
    half_b = li.where(F.col("l_orderkey") % 2 == 1)
    merged = theta_estimate(
        theta_union(
            theta_sketch(half_a, [], "l_orderkey", k=4096),
            theta_sketch(half_b, [], "l_orderkey", k=4096),
            [],
        )
    )
    timed("theta_union_global", lambda: merged.select("estimate"))
    timed(
        "theta_merge_daily_to_global",
        lambda: theta_estimate(
            theta_merge(
                theta_sketch(
                    li.withColumn("d", F.to_date("l_shipdate")),
                    ["d"], "l_orderkey", k=4096,
                ).drop("d"),
                [],
            )
        ).select("estimate"),
    )
    timed(
        "dd_sketch_merge_quantiles",
        lambda: dd_quantiles(
            dd_merge(
                dd_sketch(half_a, [], "l_extendedprice"),
                dd_sketch(half_b, [], "l_extendedprice"),
            ),
            [],
            [0.5, 0.95, 0.99],
        ),
    )

    timed(
        "profile_columns_4",
        lambda: profile_columns(
            li, ["l_returnflag", "l_orderkey", "l_quantity", "l_shipdate"]
        ),
    )
    timed(
        "profile_tuple_grid_3",
        lambda: profile_columns_tuple_grid(
            li, ["l_returnflag", "l_linestatus", "l_tax"]
        ),
    )

    acks = ev.where(F.col("value") > 100.0).select("event_id", "ts")
    timed(
        "join_audit_events",
        lambda: join_completeness_report(
            ev, acks, ["event_id"], "ts", "ts", "1 day", by=None
        ),
    )

    n_total = li.count()

    def build_ntile():
        grid = merge_count_grids(
            bucket_count_grid(half_a, "l_orderkey DIV 8192"),
            bucket_count_grid(half_b, "l_orderkey DIV 8192"),
        )
        # the grid was just merged from exactly these rows, so the guard
        # branch is provably redundant — probe the production fast path
        assigned = ntile_bucket_from_grid(
            li, grid, "l_orderkey DIV 8192", ["l_orderkey", "l_linenumber"],
            256, "tile", n_total=n_total, on_missing_bucket="drop",
        )
        return assigned.groupBy("tile").agg(F.count(F.lit(1)).alias("n"))

    timed("ntile_from_merged_grid", build_ntile)


if __name__ == "__main__":
    main()
