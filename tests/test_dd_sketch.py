"""DDSketch-style quantile grids (operators/sketches.py): relative-error
bound vs exact quantiles (Python and DuckDB), exact lossless merge,
mixed-sign/zero handling, NULL/NaN exclusion, and the alpha-mismatch
guard."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from aetherium_trader_datapipeline_spark.operators.sketches import (
    dd_merge,
    dd_quantiles,
    dd_sketch,
)

QS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]


def _exact(vals, q):
    """The sketch's rank convention: max(1, ceil(q*n)), 1-indexed."""
    s = sorted(vals)
    r = max(1, math.ceil(q * len(s)))
    return s[r - 1]


def _check(est, true, alpha):
    if true == 0:
        assert est == 0.0, (est, true)
    else:
        assert abs(est - true) / abs(true) <= alpha * 1.01, (est, true)


def test_dd_quantiles_within_alpha_fixture(spark, tables):
    alpha = 0.01
    li = tables["lineitem"].select("l_returnflag", "l_extendedprice")
    sk = dd_sketch(li, ["l_returnflag"], "l_extendedprice", alpha=alpha)
    got = {
        (r.l_returnflag, r.q): r.estimate
        for r in dd_quantiles(sk, ["l_returnflag"], QS).collect()
    }
    by_flag = {}
    for r in li.collect():
        by_flag.setdefault(r.l_returnflag, []).append(float(r.l_extendedprice))
    assert set(f for f, _ in got) == set(by_flag)
    for (flag, q), est in got.items():
        _check(est, _exact(by_flag[flag], q), alpha)


def test_dd_mixed_signs_zeros_nulls_nan(spark):
    alpha = 0.02
    vals = (
        [-(1.07 ** i) for i in range(40)]
        + [0.0] * 25
        + [1.3 ** i for i in range(60)]
    )
    rows = [(v,) for v in vals] + [(None,), (float("nan"),)]
    df = spark.createDataFrame(rows, "v double")
    sk = dd_sketch(df, [], "v", alpha=alpha)
    # NULL/NaN excluded from counts
    assert sk.agg(F.sum("dd_count")).head()[0] == len(vals)
    got = {r.q: r.estimate for r in dd_quantiles(sk, [], QS).collect()}
    for q in QS:
        _check(got[q], _exact(vals, q), alpha)
    # a quantile that lands in the zero bucket is exactly zero
    n = len(vals)
    zq = (vals.__len__() - len([v for v in vals if v > 0]) - 10) / n  # inside zeros
    zrow = dd_quantiles(sk, [], [zq]).head()
    assert zrow.estimate == 0.0


def test_dd_merge_equals_direct_and_is_commutative(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_extendedprice")
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    ga = dd_sketch(a, [], "l_extendedprice")
    gb = dd_sketch(b, [], "l_extendedprice")
    direct = sorted(map(tuple, dd_sketch(li, [], "l_extendedprice").collect()))
    assert sorted(map(tuple, dd_merge(ga, gb).collect())) == direct
    assert sorted(map(tuple, dd_merge(gb, ga).collect())) == direct


def test_dd_merge_rejects_mixed_alpha(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    a = dd_sketch(df, [], "v", alpha=0.01)
    b = dd_sketch(df, [], "v", alpha=0.02)
    with pytest.raises(Exception, match="mixed alphas"):
        dd_merge(a, b).collect()


def test_dd_quantiles_match_duckdb_disc(spark, tables):
    """Cross-check against DuckDB's quantile_disc at the same ranks:
    the discrete quantile is a real data value, so the alpha bound must
    hold against it too (both conventions pick a value at a ceil-rank)."""
    from tests.conftest import SF_DIR
    from tests.oracle import duckdb_run

    alpha = 0.01
    sk = dd_sketch(
        tables["lineitem"], ["l_linestatus"], "l_quantity", alpha=alpha
    )
    got = {
        (r.l_linestatus, r.q): r.estimate
        for r in dd_quantiles(sk, ["l_linestatus"], [0.5, 0.95]).collect()
    }
    _, rows = duckdb_run(
        """SELECT l_linestatus,
                  quantile_disc(l_quantity, 0.5)  AS q50,
                  quantile_disc(l_quantity, 0.95) AS q95
           FROM lineitem GROUP BY 1""",
        SF_DIR,
    )
    for ls, q50, q95 in rows:
        _check(got[(ls, 0.5)], float(q50), alpha + 0.01)
        _check(got[(ls, 0.95)], float(q95), alpha + 0.01)

    with pytest.raises(ValueError, match="quantiles"):
        dd_quantiles(sk, ["l_linestatus"], [1.5])


def test_dd_merge_rejects_mixed_alpha_when_only_counts_consumed(spark):
    """The guard must ride dd_count: a consumer that never evaluates
    dd_alpha (sums counts only) would otherwise let Catalyst prune the
    raise_error away and merge mixed-alpha grids silently (ADVICE r12)."""
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    a = dd_sketch(df, [], "v", alpha=0.01)
    b = dd_sketch(df, [], "v", alpha=0.02)
    with pytest.raises(Exception, match="mixed alphas"):
        dd_merge(a, b).agg(F.sum("dd_count")).collect()


def test_dd_sketch_excludes_infinities(spark):
    """±inf has no finite bucket: log(inf) would saturate and fail the
    int cast under ANSI. The filter keeps the finite-values contract
    (same treatment as NULL/NaN) instead of failing the job (ADVICE
    r12)."""
    inf = float("inf")
    df = spark.createDataFrame(
        [(1.0,), (inf,), (-inf,), (float("nan"),), (None,), (2.0,)],
        "v double",
    )
    fin = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    got = sorted(map(tuple, dd_sketch(df, [], "v").collect()))
    assert got == sorted(map(tuple, dd_sketch(fin, [], "v").collect()))
    assert sum(r[2] for r in got) == 2


def test_dd_merge_rejects_mixed_alpha_disjoint_buckets(spark):
    """The alpha guard must be GLOBAL: grids over disjoint value ranges
    share no (kind, bucket) key, so a per-key min/max compare would
    silently pass mixed alphas (r12 review)."""
    big = spark.createDataFrame([(1_000_000.0,), (2_000_000.0,)], "v double")
    small = spark.createDataFrame([(100.0,), (101.0,)], "v double")
    a = dd_sketch(big, [], "v", alpha=0.01)
    b = dd_sketch(small, [], "v", alpha=0.2)
    # sanity: truly disjoint bucket keys
    ka = {(r.dd_kind, r.dd_bucket) for r in a.collect()}
    kb = {(r.dd_kind, r.dd_bucket) for r in b.collect()}
    assert not ka & kb
    with pytest.raises(Exception, match="mixed alphas"):
        dd_merge(a, b).collect()
