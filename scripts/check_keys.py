#!/usr/bin/env python
"""Tri-SF oracle check for a list of registry keys (r14 fix-wave gate).

Runs each named key at sf0.001/sf0.01/sf0.1 and compares against its
DuckDB oracle with the canonical comparator (tests.oracle.compare — the
same type-strict check the sweep uses).  Exit 0 iff every (key, sf) pair
is clean.

Usage: python scripts/check_keys.py key1 [key2 ...] [--sf DIR ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dirs = []
    keys = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dirs.append(next(it))
        else:
            keys.append(a)
    if not sf_dirs:
        sf_dirs = [
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ]

    from aetherium_trader_datapipeline_spark.queries import (
        REGISTRY,
        _load_extensions,
    )

    _load_extensions()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tests.oracle import compare

    bad = 0
    for sf_dir in sf_dirs:
        for k in keys:
            spec = REGISTRY[k]
            df = spec.run(spark, sf_dir)
            problems = compare(df, spec.oracle, sf_dir, key=k)
            tag = "ok" if not problems else "FAIL"
            print(f"{tag}  {os.path.basename(sf_dir):8s} {k}", flush=True)
            for p in problems:
                print("   ", p[:300], flush=True)
                bad += 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
