"""One-shot survey of unpartitioned (single-task) window operators.

Thin CLI over tests/windowaudit.py (the shared classifier also used by
the standing pytest gate tests/test_plan_audit.py — see that file's
_GLOBAL_WINDOW_BOUNDS for the per-key bound arguments).  Emits JSONL,
one line per key that plans at least one global window.

Usage: python scripts/window_audit.py [--sf /root/testdata/sf0.001]
       [--keys k1 k2 ...] [--out .data/window_audit.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=".data/window_audit.jsonl")
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from aetherium_trader_datapipeline_spark.queries import REGISTRY, queries
    from tests.windowaudit import global_windows

    queries()  # load extensions
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    keys = args.keys or list(REGISTRY)
    n_flagged = 0
    with open(args.out, "w") as fh:
        for i, key in enumerate(keys):
            try:
                windows = global_windows(REGISTRY[key].run(spark, args.sf))
            except Exception as e:  # noqa: BLE001 — survey tool, keep going
                fh.write(json.dumps({"key": key, "error": str(e)[:200]}) + "\n")
                continue
            if windows:
                n_flagged += 1
                fh.write(json.dumps({"key": key, "windows": windows}) + "\n")
                fh.flush()
            if (i + 1) % 100 == 0:
                print(f"  {i + 1}/{len(keys)} scanned, {n_flagged} flagged",
                      file=sys.stderr)
    print(f"done: {len(keys)} keys, {n_flagged} with global windows "
          f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
