#!/usr/bin/env python
"""Pre-check the NEXT driver hash-window before the driver runs it.

Two checks (VERDICT r8 ask #3):

1. Driver-replica compare at sf0.01 for every key in the upcoming
   window (next N never-driver-verified oracle keys in emission order):
   type-kind strict, repr-exact floats, decimal-final ban — the same
   `tests.oracle.compare` the pytest gate runs, but scoped to the window
   and emitting a JSONL artifact.

2. Final-schema TYPE INVENTORY diff: the SCALE.md r8 lesson is that
   every output type KIND the driver has never hashed before is
   untested until a window proves it (decimal finals were rows+schema
   green locally and hash-red at the driver).  This script builds the
   set of (column kind) strings over the ALREADY-driver-verified keys'
   final schemas and flags any kind in the window that is outside that
   set, so a never-hashed kind (boolean final, timestamp final,
   negative-zero-capable double family, ...) is reviewed BEFORE the
   driver sees it rather than after a red.

Usage:
  python scripts/precheck_window.py [--n 50] [--sf /root/testdata/sf0.01]
         [--schema-sf /root/testdata/sf0.001] [--out FILE]
Writes one JSONL row per window key + a summary line; exit 0 iff all
window keys compare clean (inventory novelties are WARNINGS, not
failures — they demand review, not necessarily a fix).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--schema-sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from aetherium_trader_datapipeline_spark import queries as Q
    from aetherium_trader_datapipeline_spark.session import get_spark
    from tests.oracle import compare, _spark_kind

    Q._load_extensions()
    order = Q._emission_order()
    window = [
        k
        for k in order
        if k not in Q._DRIVER_VERIFIED and Q.REGISTRY[k].oracle is not None
    ][: args.n]

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data",
        "precheck_window_r9.jsonl",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")

    # --- verified-key kind inventory (schemas only; lazy plans at tiny SF)
    verified_kinds: set[str] = set()
    for k in sorted(Q._DRIVER_VERIFIED):
        if k not in Q.REGISTRY:
            continue
        try:
            df = Q.REGISTRY[k].run(spark, args.schema_sf)
            for f in df.schema.fields:
                verified_kinds.add(_spark_kind(f.dataType))
        except Exception as e:  # schema-build failure is itself a finding
            print(f"[inventory] {k}: schema build failed: {e}", flush=True)
    print(f"driver-hashed kind inventory ({len(verified_kinds)}): "
          f"{sorted(verified_kinds)}", flush=True)

    fails = 0
    novel_total: set[str] = set()
    with open(out_path, "w") as fh:
        for i, k in enumerate(window, 1):
            t0 = time.perf_counter()
            rec: dict = {"key": k, "idx": i}
            try:
                df = Q.REGISTRY[k].run(spark, args.sf)
                kinds = sorted({_spark_kind(f.dataType) for f in df.schema.fields})
                novel = sorted(set(kinds) - verified_kinds)
                problems = compare(df, Q.REGISTRY[k].oracle, args.sf, key=k)
                rec.update(
                    status="ok" if not problems else "fail",
                    problems=problems[:8],
                    kinds=kinds,
                    novel_kinds=novel,
                )
                novel_total.update(novel)
                if problems:
                    fails += 1
            except Exception as e:
                rec.update(status="error", problems=[repr(e)[:500]])
                fails += 1
            rec["wall_s"] = round(time.perf_counter() - t0, 2)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            tag = rec["status"].upper()
            nov = f" NOVEL-KINDS={rec.get('novel_kinds')}" if rec.get("novel_kinds") else ""
            print(f"[{i}/{len(window)}] {k}: {tag} ({rec['wall_s']}s){nov}", flush=True)

    print(
        json.dumps(
            {
                "window": len(window),
                "fails": fails,
                "novel_kinds_in_window": sorted(novel_total),
                "state": out_path,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
