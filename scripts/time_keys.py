#!/usr/bin/env python
"""Time registry keys against an arbitrary table directory (scale replicas).

Usage:
  python scripts/time_keys.py <dir> key1 key2 ...
Prints one JSON line per key: {"key": ..., "wall_s": ..., "rows": ..., "dir": ...}

Used to produce SCALE.md's per-wave 10x/100x rows: run once after a warm
scan; wall is a single end-to-end run (plan + execute + collect count).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replica = sys.argv[1]
    keys = sys.argv[2:]

    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.queries import REGISTRY, _load_extensions
    from aetherium_trader_datapipeline_spark.session import get_spark

    _load_extensions()
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="tk-wh-")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from aetherium_trader_datapipeline_spark.tables import load_tables

    for t, df in load_tables(spark, replica).items():
        df.agg(F.count(F.lit(1))).collect()  # warm the scans

    for k in keys:
        # Time a noop-sink write, not .count(): count() lets Catalyst
        # prune every non-grouping column (window/aggregate work
        # included), so queries whose cost lives in pruned columns time
        # a hollow plan (x386 measured flat 0.46 s at 100x under count()
        # vs the real materialized cost). The noop sink materializes all
        # output columns without writing bytes. Row count is taken
        # untimed afterwards.
        df = REGISTRY[k].run(spark, replica)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.monotonic() - t0, 2)
        print(
            json.dumps(
                {
                    "key": k,
                    "wall_s": wall,
                    "rows": df.count(),
                    "dir": replica,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
