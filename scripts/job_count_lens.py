#!/usr/bin/env python
"""Deterministic driver-job counter per registry key (the r13 lens).

Counts DAGScheduler jobs for one run()+collect of each key — a noise-free
structural probe (wall-clock drifts 1.5x with host load; job counts
don't).  High counts flag checkpoint-then-count / eager-checkpoint
patterns whose first consumer could materialize them instead.

Usage: python scripts/job_count_lens.py [sf_dir] [key ...]
Defaults to the whole registry at /root/testdata/sf0.01.  One JSON line
per key: {"key":..., "jobs":N, "wall_s":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    keys = args[1:] if args and os.path.isdir(args[0]) else args

    from aetherium_trader_datapipeline_spark.queries import REGISTRY, _load_extensions
    from aetherium_trader_datapipeline_spark.session import get_spark
    from aetherium_trader_datapipeline_spark.tables import load_tables

    _load_extensions()
    if not keys:
        keys = list(REGISTRY)

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    sc = spark.sparkContext

    for k in keys:
        try:
            before = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.monotonic()
            REGISTRY[k].run(spark, sf_dir).collect()
            wall = round(time.monotonic() - t0, 2)
            jobs = sc._jsc.sc().dagScheduler().nextJobId() - before
            print(json.dumps({"key": k, "jobs": jobs, "wall_s": wall}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"key": k, "error": str(e)[:150]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
