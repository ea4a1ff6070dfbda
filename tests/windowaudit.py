"""Shared classifier for unpartitioned (single-task) window operators.

The x442 class of scale bug (VERDICT r10): a window with an empty
PARTITION BY moves its ENTIRE input relation through one task.  Harmless
when the input is provably tiny (a LIMIT 1000 top-k, a scalar aggregate,
a bounded chunk grid), catastrophic when it is corpus-sized.

Used by the standing pytest gate (tests/test_plan_audit.py) and by the
survey tool (scripts/window_audit.py).  Classification walks the compiled
sparkPlan (pre-exchange) tree via py4j:

- ``bounded_by_limit``     — GlobalLimit / TakeOrderedAndProject /
  CollectLimit below the window: input <= the literal limit.
- ``bounded_by_scalar_agg`` — aggregate with NO grouping keys below:
  one row per grouping-set branch.
- ``keyed_agg``            — chain ends at an aggregate WITH keys: input
  cardinality = |distinct keys|; needs a written bound argument.
- ``other``                — chain ends at a join / scan / generate /
  union: data-sized unless argued otherwise.
"""

from __future__ import annotations

AUTO_BOUNDED = frozenset({"bounded_by_limit", "bounded_by_scalar_agg"})

# Unary pass-through nodes: rows flowing through them are not multiplied,
# so a bound established below still holds at the window's input.
# (Expand multiplies by a CONSTANT grouping-set factor; Generate can
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


def global_windows(df) -> list[dict]:
    """Every empty-partition-spec window in df's sparkPlan, classified."""
    plan = df._jdf.queryExecution().sparkPlan()
    out = []
    for node in _walk(plan):
        if node.getClass().getSimpleName() in _WINDOW_NODES:
            if node.partitionSpec().isEmpty():
                out.append(classify_window_input(node))
    return out
