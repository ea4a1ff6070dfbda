"""Z-order layout: files become tight hyper-rectangles in every clustered
dimension, so footer-stat pruning works for predicates on any of them."""

from __future__ import annotations


def _coverage(stats, lo, hi):
    """Fraction of files whose [mn, mx] interval contains the mid-range
    point — the files a point predicate must read after footer pruning."""
    rows = [(r.mn, r.mx) for r in stats]
    pt = lo + (hi - lo) * 0.5
    hit = sum(1 for mn, mx in rows if mn <= pt <= mx)
    return hit / len(rows)


def test_zorder_prunes_on_both_dims(spark, tables, tmp_path):
    from aetherium_trader_datapipeline_spark.operators.layout import (
        file_skipping_stats,
        write_zordered,
    )

    ev = tables["events"].select("event_id", "user_id", "ts", "value")
    n_files = 16

    # baseline: random layout — every file spans ~the full range of both dims
    base = str(tmp_path / "base")
    ev.repartition(n_files).write.parquet(base)
    zord = str(tmp_path / "zord")
    write_zordered(ev, zord, ["user_id", "event_id"], n_files=n_files)

    assert spark.read.parquet(zord).count() == ev.count()

    for col in ["user_id", "event_id"]:
        glob = ev.selectExpr(f"min({col}) mn", f"max({col}) mx").head()
        cov_base = _coverage(file_skipping_stats(spark, base, col).collect(), glob.mn, glob.mx)
        cov_z = _coverage(file_skipping_stats(spark, zord, col).collect(), glob.mn, glob.mx)
        # random layout reads ~all files; z-order must skip a majority
        assert cov_base > 0.9, f"{col}: baseline unexpectedly clustered ({cov_base})"
        # at least 2x fewer files read on EVERY clustered dim (at sf0.001 the
        # low user_id cardinality keeps boxes coarse; larger SFs reach <0.2)
        assert cov_z <= cov_base / 2, f"{col}: z-order coverage {cov_z} vs base {cov_base}"


def test_zorder_key_is_jvm_side(spark, tables):
    """The z-key must be a pure expression (codegen), not a Python UDF."""
    from aetherium_trader_datapipeline_spark.operators.layout import zorder_key

    ev = tables["events"].select("event_id", "user_id")
    zdf, key = zorder_key(ev, ["user_id", "event_id"], bits=8)
    plan = zdf._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert zdf.where(f"{key} IS NULL").count() == 0


def test_hilbert_expr_matches_python_reference(spark):
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import (
        hilbert_key,
        hilbert_xy2d,
    )

    rng = random.Random(42)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(500)]
    pts += [(0, 0), (255, 255), (0, 255), (255, 0), (1, 0), (0, 1)]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    for method in ("expr", "lookup"):
        got = {
            (r.x, r.y): r.d
            for r in hilbert_key(
                df, "x", "y", 8, out_col="d", method=method
            ).collect()
        }
        for x, y in pts:
            assert got[(x, y)] == hilbert_xy2d(x, y, 8), (method, x, y)


def test_hilbert_lookup_keeps_malformed_rows(spark):
    # ADVICE r7: the 'lookup' path LEFT-joins the broadcast LUT, so rows
    # with NULL or out-of-range coordinates survive with a NULL key
    # (behaviorally interchangeable with 'expr' on NULLs) — a layout
    # operator must never silently drop rows.
    import pandas as pd

    from aetherium_trader_datapipeline_spark.operators.layout import hilbert_key

    df = spark.createDataFrame(
        pd.DataFrame(
            # (3, 300) is the advisor-r8 aliasing case: y out of range but
            # x*n + y = 1068 lands on cell (4, 12)'s LUT entry — without
            # the per-coordinate range guard it returned that WRONG
            # non-NULL key.  (-1, 2) guards the negative side.
            {"x": [3, None, 999, 3, -1], "y": [5, 7, 2, 300, 2]},
            dtype="Int64",
        )
    )
    rows = hilbert_key(df, "x", "y", 8, out_col="d", method="lookup").collect()
    assert len(rows) == 5, "lookup path dropped rows"
    by_xy = {(r.x, r.y): r.d for r in rows}
    assert by_xy[(3, 5)] is not None
    assert by_xy[(None, 7)] is None  # NULL coord -> NULL key
    assert by_xy[(999, 2)] is None  # out-of-domain coord -> NULL key
    assert by_xy[(3, 300)] is None  # aliasing case -> NULL, not a wrong key
    assert by_xy[(-1, 2)] is None  # negative coord -> NULL key


def test_grid_rank_ranks_null_buckets(spark):
    # ADVICE r7: grid_rank joins the bucket grid with eqNullSafe so a
    # NULL bucket expression ranks (NULLS FIRST) instead of vanishing.
    import pandas as pd
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import grid_rank

    df = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([None, 2, 1, 2], dtype="Int64"),
                      "v": [10, 20, 30, 40]})
    )
    out = grid_rank(df, "k", ["v"], "rk").collect()
    assert len(out) == 4, "NULL-bucket row vanished"
    got = sorted((r.rk, r.k) for r in out)
    # NULL bucket first (rank 1), then k=1, then the two k=2 rows
    assert [g[0] for g in got] == [1, 2, 3, 4]
    assert got[0][1] is None and got[1][1] == 1


def test_ntile_from_rank_exact_at_huge_n(spark):
    # ADVICE r7: the bigint 'div' reconstruction has no ~2^40 double
    # boundary. Check ranks around bucket edges at n_total = 2^52 + 3,
    # where FLOOR(double-division) mis-rounds.
    import pandas as pd
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import (
        ntile_from_rank,
    )

    n_total, k = (1 << 52) + 3, 7
    q, r = divmod(n_total, k)
    threshold = r * (q + 1)

    def py_ntile(rank: int) -> int:
        if rank <= threshold:
            return (rank + q) // (q + 1)
        return r + (rank - threshold + q - 1) // q

    probes = [1, q, q + 1, q + 2, threshold, threshold + 1,
              n_total - 1, n_total]
    df = spark.createDataFrame(
        pd.DataFrame({"rank": pd.array(probes, dtype="Int64")})
    )
    got = {
        row.rank: row.b
        for row in df.select(
            "rank",
            ntile_from_rank(F.col("rank"), n_total, k).alias("b"),
        ).collect()
    }
    for p in probes:
        assert got[p] == py_ntile(p), (p, got[p], py_ntile(p))


def test_hilbert_is_bijective_on_16_grid(spark):
    # every cell of a 16x16 grid maps to a distinct d in [0, 256)
    from aetherium_trader_datapipeline_spark.operators.layout import hilbert_xy2d

    ds = {hilbert_xy2d(x, y, 4) for x in range(16) for y in range(16)}
    assert ds == set(range(256))


def test_hilbert_unit_steps_adjacent():
    # consecutive d values are grid neighbors (|dx|+|dy| == 1) — the
    # locality property Morton lacks; walk the full 16x16 curve.
    from aetherium_trader_datapipeline_spark.operators.layout import hilbert_xy2d

    inv = {}
    for x in range(16):
        for y in range(16):
            inv[hilbert_xy2d(x, y, 4)] = (x, y)
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_write_clustered_hilbert_tightens_boxes(spark, tmp_path):
    """Hilbert-clustered files must give strictly better (or equal)
    two-column pruning than an unclustered write: measure the summed
    per-file span of BOTH columns via file_skipping_stats."""
    import random

    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import (
        file_skipping_stats,
        write_clustered,
    )

    rng = random.Random(7)
    rows = [(rng.randrange(10_000), rng.randrange(10_000)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")

    flat, hil = str(tmp_path / "flat"), str(tmp_path / "hil")
    df.repartition(8).write.parquet(flat)
    write_clustered(df, hil, ["a", "b"], n_files=8, curve="hilbert")

    def span_sum(path, col):
        return sum(
            r.mx - r.mn for r in file_skipping_stats(spark, path, col).collect()
        )

    # clustered layout: both columns' summed file spans shrink vs random
    assert span_sum(hil, "a") < span_sum(flat, "a")
    assert span_sum(hil, "b") < span_sum(flat, "b")
    # same rows survive the round trip
    assert spark.read.parquet(hil).count() == 4000
    got = {(r.a, r.b) for r in spark.read.parquet(hil).collect()}
    assert got == set(rows)


def test_write_clustered_rejects_bad_args(spark, tmp_path):
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.layout import (
        hilbert_clustered_key,
        write_clustered,
    )

    df = spark.range(10).selectExpr("id AS a", "id AS b", "id AS c")
    with _pytest.raises(ValueError):
        hilbert_clustered_key(df, ["a", "b", "c"])
    with _pytest.raises(ValueError):
        write_clustered(df, str(tmp_path / "x"), ["a", "b"], curve="peano")


def test_grid_rank_double_bucket_handles_nan(spark):
    """r11 review regression: the float super-bucket must not cast NaN
    (or huge magnitudes) to BIGINT — ANSI mode throws — and NaN buckets
    must still rank LAST, matching a single global sort."""
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import grid_rank

    df = spark.createDataFrame(
        [(1.0, 1), (float("nan"), 2), (9000.5, 3), (1.0, 4),
         (1e300, 5)],
        "b double, k int",
    )
    got = {(r.k, r.rk) for r in grid_rank(df, "b", ["k"], "rk").collect()}
    # order: 1.0 (k=1), 1.0 (k=4), 9000.5, 1e300, NaN last
    assert got == {(1, 1), (4, 2), (3, 3), (5, 4), (2, 5)}, got


def test_grid_rank_string_bucket_two_level(spark):
    """r11 advice regression: string buckets now coarsen through a
    4-char-prefix super-bucket (weakly monotone under binary collation)
    instead of silently falling back to the single-level global band.
    Ranks must equal the single-sort ROW_NUMBER, including ties across
    prefix boundaries, short strings, and a NULL bucket."""
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import grid_rank

    vals = [
        ("AAPL", 1), ("AAPL", 2), ("AA", 3), ("ZZZZ9", 4),
        ("ZZZZ1", 5), ("MSFT", 6), (None, 7), ("A", 8),
    ]
    df = spark.createDataFrame(vals, "b string, k int")
    got = {(r.b, r.k, r.rk) for r in grid_rank(df, "b", ["k"], "rk").collect()}
    expect_order = sorted(
        vals, key=lambda t: (t[0] is not None, t[0] if t[0] is not None else "", t[1])
    )
    expect = {(b, k, i + 1) for i, (b, k) in enumerate(expect_order)}
    assert got == expect, got


def test_ntile_bucket_matches_exact_ntile(spark):
    """r12: ntile_bucket must reproduce NTILE(k) OVER (ORDER BY bucket,
    *order_cols) exactly — whole buckets assigned from the grid alone,
    straddling buckets through the boundary window — including DUPLICATE
    (bucket, order) rows whose ties may straddle a tile boundary, buckets
    larger than a tile, the k > n corner, and a NULL bucket (NULLS
    FIRST).  Tied rows permute arbitrarily across a boundary (in
    ntile_bucket exactly as in NTILE's own row_number tie-break), so the
    comparison is MULTISET equality of (b, v, tile) triples — invariant
    under any tie permutation, strict about tile sizes and everything
    else."""
    import pandas as pd
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import ntile_bucket

    # skewed buckets: one giant bucket (spans several tiles) with heavy
    # duplicate (b, v) runs, many tiny buckets, duplicated small rows
    vals = []
    for i in range(40):
        vals.append((5, i // 4))     # giant bucket, each v repeated 4x
    for b in (1, 2, 3, 8, 9):
        for i in range(3):
            vals.append((b, 100 + b * 10))  # all three rows tie on (b, v)
    vals.append((None, 999))
    vals.append((None, 999))
    df = spark.createDataFrame(
        pd.DataFrame({"b": pd.array([v[0] for v in vals], dtype="Int64"),
                      "v": [v[1] for v in vals]})
    )
    n = df.count()
    nkey = lambda t: (t[0] is not None, t[0] or 0, t[1], t[2])  # noqa: E731
    for k in (1, 4, 7, 56, 100):
        got = sorted(
            ((r.b, r.v, r.t)
             for r in ntile_bucket(df, "b", ["v"], n, k, "t").collect()),
            key=nkey,
        )
        exp = sorted(
            ((r.b, r.v, r.t)
             for r in df.selectExpr(
                 "b", "v", f"NTILE({k}) OVER (ORDER BY b, v) AS t"
             ).collect()),
            key=nkey,
        )
        assert got == exp, f"k={k}: first diff {next((a, b) for a, b in zip(got, exp) if a != b)}"


def test_incremental_grid_assignment_equals_direct(spark):
    """Mergeable layout state: per-batch bucket_count_grids merged in any
    fold order, then ntile_bucket_from_grid over the full data, must be
    MULTISET-identical to ntile_bucket recomputed from scratch AND to
    Spark's own NTILE — including a NULL bucket and an n_total derived
    from the grid instead of passed in."""
    import pandas as pd
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import (
        bucket_count_grid,
        merge_count_grids,
        ntile_bucket,
        ntile_bucket_from_grid,
    )

    vals = [(i % 11 if i % 13 else None, i * 7 % 29) for i in range(300)]
    df = spark.createDataFrame(
        pd.DataFrame({"b": pd.array([v[0] for v in vals], dtype="Int64"),
                      "v": [v[1] for v in vals],
                      "i": range(len(vals))})
    )
    # three "daily batches"
    b0, b1, b2 = (df.where(F.col("i") % 3 == m).drop("i") for m in range(3))
    full = df.drop("i")
    g0, g1, g2 = (bucket_count_grid(b, "b") for b in (b0, b1, b2))
    merged = merge_count_grids(merge_count_grids(g0, g1), g2)
    refold = merge_count_grids(g2, merge_count_grids(g1, g0))
    gkey = lambda t: (t[0] is not None, t[0] or 0, t[1])  # noqa: E731
    assert sorted(map(tuple, merged.collect()), key=gkey) == sorted(
        map(tuple, refold.collect()), key=gkey
    )
    # grid totals == data totals, NULL bucket included
    assert merged.agg(F.sum("n_rows")).head()[0] == full.count()

    n, k = full.count(), 7
    nkey = lambda t: (t[0] is not None, t[0] or 0, t[1], t[2])  # noqa: E731
    inc = sorted(((r.b, r.v, r.t) for r in ntile_bucket_from_grid(
        full, merged, "b", ["v"], k, "t").collect()), key=nkey)
    direct = sorted(((r.b, r.v, r.t) for r in ntile_bucket(
        full, "b", ["v"], n, k, "t").collect()), key=nkey)
    exact = sorted(((r.b, r.v, r.t) for r in full.selectExpr(
        "b", "v", f"NTILE({k}) OVER (ORDER BY b, v) AS t").collect()), key=nkey)
    assert inc == direct == exact
    # explicit n_total takes the same path
    inc2 = sorted(((r.b, r.v, r.t) for r in ntile_bucket_from_grid(
        full, merged, "b", ["v"], k, "t", n_total=n).collect()), key=nkey)
    assert inc2 == inc


def test_partial_frame_whole_buckets_exact(spark):
    """Assigning only the NEWEST batch from the merged grid is exact for
    every whole (non-straddling) bucket — the documented contract; the
    <=k-1 straddling buckets are excluded from the comparison."""
    import pandas as pd
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import (
        _bucket_offset_grid,
        bucket_count_grid,
        merge_count_grids,
        ntile_bucket_from_grid,
        ntile_from_rank,
    )

    vals = [(i % 17, i * 3 % 23, i) for i in range(400)]
    df = spark.createDataFrame(pd.DataFrame(
        {"b": [v[0] for v in vals], "v": [v[1] for v in vals],
         "i": [v[2] for v in vals]}))
    old = df.where(F.col("i") % 4 != 0).drop("i")
    new = df.where(F.col("i") % 4 == 0).drop("i")
    full = df.drop("i")
    merged = merge_count_grids(
        bucket_count_grid(old, "b"), bucket_count_grid(new, "b")
    )
    n, k = full.count(), 5
    # which buckets straddle a tile boundary under the merged grid?
    grid = _bucket_offset_grid(full, "b").withColumns(
        {"lo": ntile_from_rank(F.col("__cb") + F.lit(1), n, k),
         "hi": ntile_from_rank(F.col("__cb") + F.col("__c"), n, k)})
    whole = {r["__gb"] for r in grid.where("lo = hi").collect()}
    assert whole  # the comparison must not be vacuous

    got = {(r.b, r.v): r.t for r in ntile_bucket_from_grid(
        new, merged, "b", ["v"], k, "t", n_total=n).collect()
        if r.b in whole}
    exp = {(r.b, r.v): r.t for r in full.selectExpr(
        "b", "v", f"NTILE({k}) OVER (ORDER BY b, v) AS t").collect()
        if r.b in whole}
    for key, t in got.items():
        assert exp[key] == t, key


def test_from_grid_missing_bucket_fails_loudly(spark):
    """A stale/unmerged grid must not silently drop rows (r12 review):
    with the default on_missing_bucket='error' the guard branch fails the
    job naming the offending bucket; 'drop' opts into the covered-grid
    fast path and returns only covered rows."""
    import pytest
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.layout import (
        bucket_count_grid,
        ntile_bucket_from_grid,
    )

    df = spark.createDataFrame([(b, v) for b in range(6) for v in range(10)], "b int, v int")
    stale = bucket_count_grid(df.where(F.col("b") < 4), "b")  # buckets 4,5 missing
    with pytest.raises(Exception, match="absent from"):
        ntile_bucket_from_grid(df, stale, "b", ["v"], 4, "t", n_total=40).collect()
    dropped = ntile_bucket_from_grid(
        df, stale, "b", ["v"], 4, "t", n_total=40, on_missing_bucket="drop"
    )
    assert dropped.count() == 40
    with pytest.raises(ValueError, match="on_missing_bucket"):
        ntile_bucket_from_grid(df, stale, "b", ["v"], 4, "t", on_missing_bucket="warn")
