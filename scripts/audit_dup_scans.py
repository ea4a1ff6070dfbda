#!/usr/bin/env python
"""Audit every registry key's physical plan for duplicated table scans.

The round-13 win class (1.3-4.1x) was CTE-inlining: a subtree scanned the
same table more than once because SQL CTEs are inlined per reference.  This
script builds (never executes) each key's plan and reports, per key:

  - scans per base table (from "Scan parquet" / FileScan lines' locations)
  - Exchange count and Python-boundary node count
  - a DUP flag when any table is scanned more than once

Usage:
  python scripts/audit_dup_scans.py [--all | key ...] [--sf DIR]
Defaults to every NON-headline registry key.  Output: one JSON line per
key to stdout (sorted DUP-first), suitable for jq.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    all_keys = "--all" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aetherium_trader_datapipeline_spark.queries import (
        REGISTRY,
        _load_extensions,
        headline_keys,
    )
    from aetherium_trader_datapipeline_spark.session import get_spark
    from aetherium_trader_datapipeline_spark.tables import load_tables

    _load_extensions()
    if args:
        keys = args
    elif all_keys:
        keys = list(REGISTRY)
    else:
        hl = set(headline_keys())
        keys = [k for k in REGISTRY if k not in hl]

    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    loc_re = re.compile(r"Location:.*?\[([^\]]*)\]")
    results = []
    for k in keys:
        try:
            df = REGISTRY[k].run(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            results.append({"key": k, "error": str(e)[:200]})
            continue
        scans: dict[str, int] = {}
        for m in loc_re.finditer(plan):
            path = m.group(1)
            table = os.path.basename(path.rstrip("/")).replace(".parquet", "")
            scans[table] = scans.get(table, 0) + 1
        n_ex = plan.count("Exchange")
        n_py = sum(
            plan.count(t)
            for t in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInPandas",
                "MapInArrow",
                "FlatMapGroupsInPandas",
            )
        )
        dup = {t: c for t, c in scans.items() if c > 1}
        results.append(
            {
                "key": k,
                "scans": scans,
                "dup": dup,
                "exchanges": n_ex,
                "python_nodes": n_py,
            }
        )
    results.sort(
        key=lambda r: (-sum(r.get("dup", {}).values()), r["key"]),
    )
    for r in results:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
