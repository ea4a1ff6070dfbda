#!/usr/bin/env python
"""Warm N-run per-key profile — the q35-closure protocol as a script.

bench.py's in-suite numbers are medians of 3 inside a 48-key pass; when a
key trips the 2x gate the closure protocol (BASELINE.md r6/r7 notes) is a
DEDICATED warm profile: one warm-up run, then N timed runs of just that
key, alongside same-session ANCHOR-CONTROL keys that calibrate the host
against the anchor table. This script runs exactly that and prints one
JSON line per key: {"key":..., "samples":[...], "median":..., "host":
{"steal_pct":...}}.

Usage:
  python scripts/profile_keys.py [--sf DIR] [--runs N] [--no-controls]
         key1 key2 ...
Defaults: sf=/root/testdata/sf0.1, runs=5, cpus=$SPARK_GRAFT_CPUS or 32.

The three anchor-control keys (x187_hll_portable, x163_event_funnel,
q35_sim_topk_cosine — the r8 closure set, anchors 0.442/0.347/0.687 s)
are ALWAYS profiled first unless --no-controls: every flag adjudication
recorded in BASELINE.md then carries a same-session drift denominator by
construction (VERDICT r8 ask #6). Controls run FIRST so the host is
characterized before the key under test heats any caches.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal_pct() -> float:
    """Hypervisor steal fraction since boot (column 8 of /proc/stat cpu)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        return round(100.0 * vals[7] / max(1, sum(vals)), 4)
    except Exception:  # noqa: BLE001
        return float("nan")


# r8 closure-protocol controls; anchors (s) from BASELINE.md r4 table.
CONTROL_KEYS = ("x187_hll_portable", "x163_event_funnel", "q35_sim_topk_cosine")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--no-controls",
        action="store_true",
        help="skip the standing anchor-control keys (drift denominator)",
    )
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()
    if not args.no_controls:
        args.keys = [k for k in CONTROL_KEYS if k not in args.keys] + args.keys

    from aetherium_trader_datapipeline_spark.queries import (
        REGISTRY,
        _load_extensions,
    )
    from aetherium_trader_datapipeline_spark.session import get_spark
    from aetherium_trader_datapipeline_spark.tables import load_tables

    _load_extensions()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, args.sf)

    steal0 = _steal_pct()
    for key in args.keys:
        spec = REGISTRY[key]
        spec.run(spark, args.sf).collect()  # warm-up
        samples = []
        for _ in range(args.runs):
            # drop DataFrame caches the key itself created (x294/x304
            # persist wide intermediates): a canonically identical plan
            # would otherwise read the previous run's cache and fake the
            # sample; non-matching plans would pile up a fresh persisted
            # copy per run instead (r12 review)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            spec.run(spark, args.sf).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        print(
            json.dumps(
                {
                    "key": key,
                    "role": "control" if key in CONTROL_KEYS else "subject",
                    "samples": samples,
                    "median": round(statistics.median(samples), 4),
                    "sf": args.sf,
                    "host": {"steal_pct_boot": steal0},
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
