"""Column profiler (operators/profile.py) vs a DuckDB oracle, edge
cases (NULL-only, constant, modal ties, empty input), and the
per-column-grid == tuple-grid equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from aetherium_trader_datapipeline_spark.operators.profile import (
    profile_columns,
    profile_columns_tuple_grid,
)
from tests.conftest import SF_DIR
from tests.oracle import duckdb_run


def _by_col(df):
    return {r.column: r.asDict() for r in df.collect()}


def test_profile_matches_duckdb_oracle(spark, tables):
    cols = ["l_returnflag", "l_orderkey", "l_quantity", "l_shipdate"]
    got = _by_col(profile_columns(tables["lineitem"], cols))
    for c in cols:
        _, rows = duckdb_run(
            f"""SELECT COUNT(*), COUNT(*) - COUNT({c}), COUNT(DISTINCT {c}),
                       CAST(MIN({c}) AS VARCHAR), CAST(MAX({c}) AS VARCHAR)
                FROM read_parquet('{SF_DIR}/lineitem.parquet')""",
            SF_DIR,
        )
        n_rows, n_null, n_distinct, mn, mx = rows[0]
        _, top = duckdb_run(
            f"""SELECT CAST({c} AS VARCHAR) v, COUNT(*) cnt
                FROM read_parquet('{SF_DIR}/lineitem.parquet')
                WHERE {c} IS NOT NULL
                GROUP BY 1 ORDER BY cnt DESC, v DESC LIMIT 1""",
            SF_DIR,
        )
        g = got[c]
        assert g["n_rows"] == n_rows and g["n_null"] == n_null, c
        assert g["n_distinct"] == n_distinct, c
        assert (g["min_value"], g["max_value"]) == (str(mn), str(mx)), c
        assert (g["top_value"], g["top_count"]) == (str(top[0][0]), top[0][1]), c
        assert g["is_constant"] is False, c


def test_profile_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, None, "k", "a"), (2, None, "k", "b"), (3, None, "k", "b"),
         (4, None, "k", "a")],
        "id int, dead string, konst string, tie string",
    )
    got = _by_col(profile_columns(df))
    assert got["dead"]["n_null"] == 4 and got["dead"]["n_distinct"] == 0
    assert got["dead"]["is_constant"] is True
    assert got["dead"]["min_value"] is None and got["dead"]["top_value"] is None
    assert got["konst"]["is_constant"] is True and got["konst"]["n_distinct"] == 1
    assert got["konst"]["top_count"] == 4
    # modal tie (a: 2, b: 2) breaks toward the larger value string
    assert got["tie"]["top_value"] == "b" and got["tie"]["top_count"] == 2
    assert got["id"]["value_type"] == "int" and got["id"]["n_distinct"] == 4


def test_profile_empty_input(spark):
    df = spark.createDataFrame([], "a int, b string")
    got = _by_col(profile_columns(df))
    for c in ("a", "b"):
        g = got[c]
        assert g["n_rows"] == 0 and g["n_null"] == 0 and g["n_distinct"] == 0
        assert g["is_constant"] is True
        assert g["min_value"] is None and g["top_value"] is None


def test_profile_tuple_grid_equals_per_column(spark, tables):
    """The one-scan tuple-grid form returns row-identical profiles on
    dict-encodable columns (its applicability domain) — including a
    NULL-bearing column so the grid's NULL tuples are exercised."""
    li = tables["lineitem"].withColumn(
        "flag_or_null",
        F.when(F.col("l_linenumber") == 1, F.col("l_returnflag")),
    )
    cols = ["l_returnflag", "l_linestatus", "flag_or_null", "l_tax"]
    a = sorted(map(tuple, profile_columns(li, cols).collect()))
    b = sorted(map(tuple, profile_columns_tuple_grid(li, cols).collect()))
    assert a == b
    nulls = _by_col(profile_columns_tuple_grid(li, cols))["flag_or_null"]
    assert nulls["n_null"] > 0 and nulls["is_constant"] is False


def test_profile_map_columns_skipped_or_rejected(spark):
    """Maps are not groupable/orderable: the all-columns default skips
    them so a publish-gate table profiles as-is; naming one explicitly
    raises with the column named (r12 review)."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "x")], "id int, k string").withColumn(
        "props", F.create_map(F.col("k"), F.col("id"))
    )
    got = _by_col(profile_columns(df))
    assert set(got) == {"id", "k"}
    with pytest.raises(ValueError, match="props"):
        profile_columns(df, ["props"])
    with pytest.raises(ValueError, match="props"):
        profile_columns_tuple_grid(df, ["id", "props"])


def test_profile_empty_column_list_raises_clearly(spark):
    """cols=[] or an all-map frame must raise a named ValueError, not
    an opaque 'reduce() of empty iterable' TypeError (ADVICE r12)."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "x")], "id int, k string")
    with pytest.raises(ValueError, match="no profilable columns"):
        profile_columns(df, [])
    with pytest.raises(ValueError, match="no profilable columns"):
        profile_columns_tuple_grid(df, [])
    all_maps = df.select(F.create_map(F.col("k"), F.col("id")).alias("m"))
    with pytest.raises(ValueError, match="no profilable columns"):
        profile_columns(all_maps)


def test_profile_drift_report(spark):
    """Each drift class fires once on a constructed old/new pair, and an
    identical pair reports nothing."""
    from aetherium_trader_datapipeline_spark.operators.profile import (
        profile_drift,
    )

    old_df = spark.createDataFrame(
        [(i, "x", float(i % 50), str(i)) for i in range(100)],
        "gone int, konst string, metric double, key string",
    )
    new_df = spark.createDataFrame(
        # 'gone' removed, 'fresh' added, metric now 80% NULL and int,
        # key collapsed to 2 distinct values, konst still constant
        [(("x"), (None if i % 5 else 7), str(i % 2), i) for i in range(100)],
        "konst string, metric int, key string, fresh int",
    )
    rep = profile_drift(profile_columns(old_df), profile_columns(new_df))
    got = {(r.column, r.issue) for r in rep.collect()}
    # the 2-distinct key is NOT constant, so became_constant must not fire
    assert ("gone", "column_removed") in got
    assert ("fresh", "column_added") in got
    assert ("metric", "type_changed") in got
    assert ("metric", "null_rate_jump") in got
    assert ("metric", "ndv_collapse") in got
    assert ("key", "ndv_collapse") in got
    assert ("key", "became_constant") not in got
    assert not any(c == "konst" for c, _ in got)

    same = profile_columns(old_df)
    assert profile_drift(same, same).count() == 0
