#!/usr/bin/env python
"""Capture .explain("formatted") for registry keys into plans/<out_dir>/.

Usage:
  python scripts/capture_plans.py <out_dir> [key ...]
Defaults to every headline key when no keys are given. Writes
plans/<out_dir>/<key>_<suffix>.txt (suffix via $SPARK_GRAFT_PLAN_SUFFIX,
default "before"). Plan capture only — no query execution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    keys = sys.argv[2:]
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from aetherium_trader_datapipeline_spark.queries import (
        REGISTRY,
        _load_extensions,
        headline_keys,
    )
    from aetherium_trader_datapipeline_spark.session import get_spark
    from aetherium_trader_datapipeline_spark.tables import load_tables

    _load_extensions()
    if not keys:
        keys = headline_keys()

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)

    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        df = REGISTRY[k].run(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_py = sum(plan.count(t) for t in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas"))
        print(f"{k}: exchanges={n_ex} python_nodes={n_py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
