"""One-shot classifier for unpartitioned (single-task) window operators.

The x442 class of scale bug: a ``ROW_NUMBER() OVER (ORDER BY ...)`` (or any
window with an empty PARTITION BY) forces Spark to move the window's ENTIRE
input relation through one task.  Harmless when the input is provably tiny
(a 10-row post-aggregate final, a LIMIT 1000 top-k), catastrophic when it is
corpus-sized (x442's pre-fix form ran one over the full term vocabulary).

This script walks every registry key's compiled physical plan (sparkPlan —
pre-exchange, so the tree is small), finds every Window/WindowInPandas node
with an empty partitionSpec, and walks DOWN the window's input chain to
auto-classify it:

- bounded_by_limit:  a GlobalLimit / TakeOrderedAndProject / CollectLimit
  sits below the window → input ≤ the literal limit.
- bounded_by_scalar_agg: an aggregate with NO grouping keys sits below →
  input is exactly one row (per grouping-set branch).
- keyed_agg: the chain ends at an aggregate WITH grouping keys → input
  cardinality = |distinct keys|; tiny iff the key domain is tiny.  NOT
  auto-bounded — needs a written cardinality argument (allowlist).
- other: the chain ends at a join / scan / generate → input is
  data-sized unless argued otherwise.  NOT auto-bounded.

Output: JSONL, one line per key that plans at least one global window.
The standing pytest gate (tests/test_plan_audit.py) re-runs the same
classification and asserts every non-auto-bounded window is allowlisted.

Usage: python scripts/window_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

# Unary pass-through nodes: rows flowing through them are not multiplied,
# so the bound established below them still holds at the window's input.
# (Expand multiplies rows by a CONSTANT grouping-set factor; Generate can
# explode arbitrarily, so it is NOT pass-through.)
_PASS_THROUGH = {
    "Project", "Filter", "Sort", "Window", "WindowInPandas",
    "WindowGroupLimit", "Coalesce", "Exchange", "ShuffleExchange",
    "AQEShuffleRead", "InputAdapter", "WholeStageCodegen",
    "ColumnarToRow", "RowToColumnar", "SerializeFromObject",
    "DeserializeToObject", "SubqueryBroadcast", "ReusedExchange",
    "Expand",
}
_LIMIT_NODES = {"GlobalLimit", "LocalLimit", "TakeOrderedAndProject",
                "CollectLimit"}
_AGG_NODES = {"HashAggregate", "SortAggregate", "ObjectHashAggregate"}
_WINDOW_NODES = {"WindowExec", "WindowInPandasExec"}


def _simple(node) -> str:
    return node.getClass().getSimpleName().replace("Exec", "")


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def classify_window_input(window_node) -> dict:
    """Descend the window's input chain; return the boundedness verdict."""
    node = _children(window_node)[0]
    while True:
        name = _simple(node)
        if name in _LIMIT_NODES:
            return {"status": "bounded_by_limit", "node": name}
        if name in _AGG_NODES:
            if node.groupingExpressions().isEmpty():
                return {"status": "bounded_by_scalar_agg", "node": name}
            keys = node.groupingExpressions().mkString(", ")
            return {"status": "keyed_agg", "node": name, "keys": keys[:160]}
        kids = _children(node)
        if name in _PASS_THROUGH and len(kids) == 1:
            node = kids[0]
            continue
        return {"status": "other", "node": name}


def audit_key(spark, key: str, sf_dir: str) -> list[dict]:
    from aetherium_trader_datapipeline_spark.queries import REGISTRY

    df = REGISTRY[key].run(spark, sf_dir)
    plan = df._jdf.queryExecution().sparkPlan()
    out = []
    for node in _walk(plan):
        if node.getClass().getSimpleName() in _WINDOW_NODES:
            if node.partitionSpec().isEmpty():
                out.append(classify_window_input(node))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=".data/window_audit.jsonl")
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from aetherium_trader_datapipeline_spark.queries import REGISTRY, queries

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
                windows = audit_key(spark, key, args.sf)
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
