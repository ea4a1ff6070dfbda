"""Physical-plan invariants over the ENTIRE registry.

SCALE.md argues every query avoids unbounded join fan-out and reads only
the columns it needs; these tests make the two claims executable:

1. No registry query may plan a ``CartesianProduct``. Scalar cross joins
   (single-row count/vocab/cap CTEs) plan as BroadcastNestedLoopJoin and
   are fine; a CartesianProduct means a non-equi join with two large
   sides — the shape that detonates at 100 TB.
2. Column pruning must reach the parquet scan: queries known to touch a
   narrow projection must show a ReadSchema that excludes the wide
   columns (e.g. q01 aggregates l_orderkey only — a scan that also reads
   l_comment would ship the table's widest column for nothing).

Plans are compiled (analyzed + physical planning) without executing the
query — with one caveat: operators that eagerly localCheckpoint or count
during plan CONSTRUCTION (x172's pagerank materializes its edge list)
do run those setup jobs. At sf0.001 that keeps the full audit in tens of
seconds.
"""

from __future__ import annotations

import pytest

from aetherium_trader_datapipeline_spark.queries import REGISTRY, queries
from tests.conftest import SF_DIR


def _spark_plan(spark, key: str) -> str:
    df = REGISTRY[key].run(spark, SF_DIR)
    return df._jdf.queryExecution().sparkPlan().toString()


def test_no_cartesian_product_anywhere(spark):
    queries()
    offenders = []
    for key in REGISTRY:
        plan = _spark_plan(spark, key)
        if "CartesianProduct" in plan:
            offenders.append(key)
    assert offenders == [], f"CartesianProduct planned in: {offenders}"


@pytest.mark.parametrize(
    "key,table,must_be_absent",
    [
        # q01 sums l_orderkey: the 16-column lineitem scan must be pruned
        ("q01_scan_agg", "lineitem", "l_comment"),
        # q04 joins orders⨝customer on keys + aggregates o_totalprice
        ("q04_join_agg", "orders", "o_comment"),
        # x81 reads 4 lineitem columns (filter + sum)
        ("x81_tpch_q6", "lineitem", "l_comment"),
        # doc queries tokenize text; n_chars-only queries must not read text
        ("x159_shard_assign", "documents", "text"),
        ("x166_weighted_sample", "documents", "text"),
        # x213 reads user_id/ts/event_id/event_type/value — never props
        ("x213_avg_cost_pnl", "events", "props"),
        # x221 scores on value/event_type only
        ("x221_auc", "events", "props"),
        # x230 projects the bipartite keys; lineitem's wide column stays out
        ("x230_bipartite_projection", "lineitem", "l_comment"),
        # x241 ranks by acctbal within nation; address/comment must prune
        ("x241_rank_fns", "customer", "c_address"),
    ],
)
def test_column_pruning_reaches_scan(spark, key, table, must_be_absent):
    queries()
    plan = _spark_plan(spark, key)
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans, f"{key}: no parquet scan in plan"
    target = [ln for ln in scans if f"{table}.parquet" in ln]
    assert target, f"{key}: no scan of {table} found"
    for ln in target:
        assert must_be_absent not in ln, (
            f"{key}: scan of {table} reads {must_be_absent} — pruning failed:\n{ln}"
        )


def test_filter_pushdown_reaches_scan(spark):
    """q02 filters on l_shipdate/l_returnflag — both must appear as
    PushedFilters on the parquet scan, not only as a post-scan Filter."""
    queries()
    plan = _spark_plan(spark, "q02_filter_project")
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan and "PushedFilters: [" in scan[0]
    pushed = scan[0].split("PushedFilters: [", 1)[1]
    assert "l_shipdate" in pushed and "l_returnflag" in pushed, pushed
