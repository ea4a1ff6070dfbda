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


def _executed_plan(spark, key: str) -> str:
    """Post-exchange-insertion plan (AQE initial): the only plan text in
    which Exchange nodes exist — sparkPlan() is PRE-EnsureRequirements, so
    any check that greps for 'Exchange' against it passes vacuously."""
    df = REGISTRY[key].run(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


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
        # x275 samples on (lang, doc_id) — the wide text column must prune
        ("x275_reservoir_sample", "documents", "text"),
        # x286 buckets user_id only
        ("x286_partition_skew_report", "events", "props"),
        # x287 interleaves two key columns; comments must prune
        ("x287_zorder_keys", "orders", "o_comment"),
        # x288 probes custkeys; address/comment must prune on both sides
        ("x288_portable_bloom", "customer", "c_address"),
        # (x294/x304 can't be audited here: their ranked frame
        # localCheckpoints, so the final plan reads a LogicalRDD with no
        # FileScan — the 2-column projection happens before the
        # checkpoint job via an explicit .select.)
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


def _marker_col(line: str) -> int:
    import re

    m = re.search(r"[:+]- ", line)
    return m.start() if m else -1


def _direct_children(lines: list[str], idx: int) -> list[int]:
    """Indices of the direct children of the tree node at lines[idx]."""
    base = _marker_col(lines[idx])
    kids, i = [], idx + 1
    while i < len(lines):
        c = _marker_col(lines[i])
        if c == -1:
            i += 1
            continue
        if c <= base:
            break
        kids.append(i)
        j = i + 1
        while j < len(lines):
            cj = _marker_col(lines[j])
            if cj != -1 and cj <= c:
                break
            j += 1
        i = j
    return kids


def _subtree(lines: list[str], idx: int) -> str:
    base = _marker_col(lines[idx])
    out, j = [lines[idx]], idx + 1
    while j < len(lines):
        cj = _marker_col(lines[j])
        if cj != -1 and cj <= base:
            break
        out.append(lines[j])
        j += 1
    return "\n".join(out)


# Evidence in a build-side subtree that its row count is bounded regardless
# of input scale: a scalar aggregate, a literal/local relation, a limit, or
# a pushed point-equality filter (one key → O(1) rows).
_BOUNDED_MARKERS = (
    "HashAggregate(keys=[], ",
    "SortAggregate(key=[], ",
    "LocalTableScan",
    "OneRowRelation",
    "CollectLimit",
    "GlobalLimit",
    "TakeOrderedAndProject",
    "EqualTo(",
)

# Keys whose BNLJ build side is data-proportional by DESIGN, with the reason
# a reviewer should hold it to. Keep this list short and justified.
_BNLJ_ALLOWED = {
    # probe set = fixed modulus sample of embeddings (demo stand-in for a
    # caller-supplied bounded probe table); labeled side is the broadcast.
    "x192_knn_classify",
}


def test_no_large_side_bnlj(spark):
    """A BroadcastNestedLoopJoin is only acceptable when its BUILD side is
    provably bounded (scalar agg / literal / limit / point filter). A BNLJ
    whose broadcast side grows with the data is the x177 r3 hazard:
    Θ(|left|×|right|) predicate evaluations that detonate at 100 TB even
    though the plan contains no CartesianProduct."""
    queries()
    offenders = []
    for key in REGISTRY:
        if key in _BNLJ_ALLOWED:
            continue
        plan = _spark_plan(spark, key)
        if "BroadcastNestedLoopJoin" not in plan:
            continue
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastNestedLoopJoin" not in ln:
                continue
            kids = _direct_children(lines, i)
            if len(kids) < 2:
                continue  # root-level formatting edge; covered by kids below
            build_idx = kids[1] if "BuildRight" in ln else kids[0]
            st = _subtree(lines, build_idx)
            if not any(m in st for m in _BOUNDED_MARKERS):
                offenders.append(f"{key}: unbounded BNLJ build side:\n{st[:400]}")
    assert offenders == [], "\n\n".join(offenders)


def test_bnlj_checker_flags_prefix_x177_shape(spark):
    """Regression proof-case: x177's ORIGINAL r3 form (day spine joined to
    raw events on a datediff BETWEEN inequality) must be flagged by the
    BNLJ checker — it planned a BroadcastNestedLoopJoin whose build side
    was the full events scan."""
    from aetherium_trader_datapipeline_spark.tables import load_tables

    load_tables(spark, SF_DIR)
    df = spark.sql(
        """
        WITH spine AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
        SELECT s.d, COUNT(DISTINCT e.user_id) AS wau
        FROM spine s JOIN events e
          ON datediff(s.d, CAST(e.ts AS DATE)) BETWEEN 0 AND 6
        GROUP BY s.d
        """
    )
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, "shape changed; update proof-case"
    lines = plan.splitlines()
    flagged = False
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        kids = _direct_children(lines, i)
        build_idx = kids[1] if "BuildRight" in ln else kids[0]
        st = _subtree(lines, build_idx)
        if not any(m in st for m in _BOUNDED_MARKERS):
            flagged = True
    assert flagged, "checker failed to flag an events-sized BNLJ build side"


# ---------------------------------------------------------------------------
# Global-band policy (VERDICT r6 ask #8)
#
# A window/sort band over Exchange SinglePartition is an exact global
# rank/cumsum — the x470/x557/x564 class. Policy, now mechanical: the
# single-partition frame must be provably SUB-LINEAR in the input, i.e. the
# exchange's child subtree must contain a keyed aggregate / distinct collapse
# (a distinct-value grid or per-key collapse) or an outright bounded marker.
# A global band directly over raw rows must be rewritten as a chunked window
# with boundary handoff (the x498 form). Keys that need a band over a
# collapse the heuristic cannot see go in _GLOBAL_BAND_ALLOWED with the
# argued frame bound.
_GLOBAL_BAND_ALLOWED: dict[str, str] = {
    # (empty — every current global band sits on a collapse the checker
    # recognizes; add entries ONLY with an argued sub-linear frame)
}

_KEYED_AGG_RE = None


def _has_collapse(subtree: str) -> bool:
    import re

    global _KEYED_AGG_RE
    if _KEYED_AGG_RE is None:
        _KEYED_AGG_RE = re.compile(
            # SortAggregate prints the singular "key=[" — match both
            r"(?:HashAggregate|SortAggregate|ObjectHashAggregate)\(keys?=\[[^\]]"
        )
    return bool(_KEYED_AGG_RE.search(subtree)) or any(
        m in subtree for m in _BOUNDED_MARKERS
    )


def test_global_band_requires_collapse(spark):
    queries()
    offenders = []
    for key in REGISTRY:
        if key in _GLOBAL_BAND_ALLOWED:
            continue
        plan = _executed_plan(spark, key)
        if "Exchange SinglePartition" not in plan:
            continue
        lines = plan.splitlines()
        # ancestor stack: nearest enclosing node per marker depth
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            col = _marker_col(lines[i])
            # find nearest ancestors (strictly smaller marker col, upward)
            anc, c = [], col
            for j in range(i - 1, -1, -1):
                cj = _marker_col(lines[j])
                if cj != -1 and cj < c:
                    anc.append(lines[j])
                    c = cj
                if len(anc) >= 3:
                    break
            feeding_band = any(
                ("Window" in a or "WindowGroupLimit" in a) for a in anc[:2]
            )
            if not feeding_band:
                # scalar-agg final exchanges etc. — not a band
                continue
            st = _subtree(lines, i)
            if not _has_collapse(st):
                offenders.append(
                    f"{key}: global band over an uncollapsed frame:\n{st[:400]}"
                )
    assert offenders == [], "\n\n".join(offenders)


def test_global_band_checker_flags_raw_row_band(spark):
    """Proof-case: a cumulative sum directly over raw lineitem rows (the
    banned x574-r6 shape — a single-partition sort of the full table)
    must be flagged by the global-band checker, while the same band over
    a distinct-value collapse must pass."""
    from aetherium_trader_datapipeline_spark.tables import load_tables

    load_tables(spark, SF_DIR)

    def offends(sql: str) -> bool:
        plan = (
            spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
        )
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            anc, c = [], _marker_col(lines[i])
            for j in range(i - 1, -1, -1):
                cj = _marker_col(lines[j])
                if cj != -1 and cj < c:
                    anc.append(lines[j])
                    c = cj
                if len(anc) >= 3:
                    break
            if not any("Window" in a or "WindowGroupLimit" in a for a in anc[:2]):
                continue
            if not _has_collapse(_subtree(lines, i)):
                return True
        return False

    raw_band = (
        "SELECT l_orderkey, SUM(l_quantity) OVER (ORDER BY l_orderkey, "
        "l_linenumber ROWS UNBOUNDED PRECEDING) AS cum FROM lineitem"
    )
    assert offends(raw_band), "checker failed to flag a raw-row global band"

    collapsed_band = (
        "WITH g AS (SELECT l_quantity AS v, COUNT(*) AS c FROM lineitem "
        "GROUP BY l_quantity) "
        "SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum "
        "FROM g"
    )
    assert not offends(collapsed_band), (
        "checker flagged a band over a distinct-value collapse"
    )


# ---------------------------------------------------------------------------
# Argued-bound proofs for the two scalar-broadcast keys (VERDICT r7 ask #7).
#
# x567 and x571 carry a CROSS JOIN by design: a per-group frame joined to ONE
# row of global moments. Their boundedness argument used to live only in
# docstrings; these tests make it executable. The invariant is stronger than
# test_no_large_side_bnlj's generic marker scan: EVERY nested-loop build side
# in these two plans must be a SCALAR aggregate subtree (HashAggregate with
# empty grouping — exactly one row at ANY data scale), not merely "contains
# some bounded marker". If a future edit reshapes the build side (e.g. back
# to the r6 keyed-aggregate cross join whose ≤2-row / 25×5-row bounds were
# true but not machine-checkable), this fails loudly.
_SCALAR_BROADCAST_PROOFS = {
    # build side = `rv`: one SCALAR conditional aggregation over spans
    # (SUM(CASE WHEN sym=...)), so the broadcast is exactly 1 row; the pair
    # fan-out is bounded separately by the minute-bucket equi-join.
    "x567_hayashi_yoshida",
    # build side = `gdist`: scalar global distribution (SUM over the
    # fixed-arity 5-level pivot), exactly 1 row at any scale; the probe side
    # is the |nations|-row per-group frame.
    "x571_t_closeness",
}


@pytest.mark.parametrize("key", sorted(_SCALAR_BROADCAST_PROOFS))
def test_scalar_broadcast_build_side_proof(spark, key):
    queries()
    plan = _spark_plan(spark, key)
    lines = plan.splitlines()
    bnlj_rows = [i for i, ln in enumerate(lines) if "BroadcastNestedLoopJoin" in ln]
    assert bnlj_rows, (
        f"{key}: expected the scalar-broadcast CROSS JOIN shape; plan has no "
        "BroadcastNestedLoopJoin — the argued bound no longer applies, "
        "re-derive it (or drop this proof if the cross join is gone)"
    )
    for i in bnlj_rows:
        kids = _direct_children(lines, i)
        assert len(kids) == 2, f"{key}: malformed BNLJ node:\n{lines[i]}"
        build_idx = kids[1] if "BuildRight" in lines[i] else kids[0]
        st = _subtree(lines, build_idx)
        assert "HashAggregate(keys=[], " in st or "SortAggregate(key=[], " in st, (
            f"{key}: BNLJ build side is no longer a SCALAR aggregate — the "
            f"one-row broadcast bound is broken:\n{st[:400]}"
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


def test_collect_sites_are_allowlisted():
    """Every ``.collect()`` in non-test source must be a known BOUNDED
    site (driver traffic O(days), O(k·dim), O(partitions) or a scalar) —
    the r9 verdict verified this by hand; this makes it a standing gate.
    Adding a new ``.collect()`` fails here until its bound is argued and
    the allowlist updated.  ``.toPandas()`` is banned outright in
    non-test source (0 sites today; Arrow batches belong in
    applyInPandas/mapInPandas, not on the driver)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / (
        "aetherium_trader_datapipeline_spark"
    )
    # file -> (expected .collect() count, bound argument)
    allow = {
        "plans/bootstrap.py": (1, "per-date max-ts: O(existing dates)"),
        "plans/backfill_service.py": (1, "backfill day list (write metrics now come from observe() on the write itself)"),
        "streaming/rollup.py": (1, "distinct dates in one micro-batch"),
        "operators/replay.py": (1, "single min/max bounds row"),
        "operators/inspect.py": (1, "per-file row-count audit: O(files)"),
        "operators/merge.py": (2, "touched/surviving partition lists (compaction sizes from an FS listing, no collect)"),
        "operators/graph.py": (1, "one checksum scalar (label sum)"),
        "operators/curation.py": (2, "k-means: k seed rows + k*dim centroids"),
        "operators/similarity.py": (2, "IVF: n_centroids seeds + k*dim means"),
        "queries_ext48.py": (1, "one max-|weight| scalar"),
        "queries_ext63.py": (1, "one count scalar"),
        "__main__.py": (2, "CLI display paths (gap report, --limit rows)"),
    }
    got: dict[str, int] = {}
    for p in pkg.rglob("*.py"):
        if "_vendor" in p.parts:
            continue
        src = p.read_text()
        n = len(re.findall(r"\.collect\(\)", src))
        if n:
            got[str(p.relative_to(pkg))] = n
        assert ".toPandas()" not in src, f"driver toPandas() in {p}"
    assert got == {k: v[0] for k, v in allow.items()}, (
        "collect() sites changed; argue the new site's bound and update "
        f"the allowlist. got={got}"
    )
