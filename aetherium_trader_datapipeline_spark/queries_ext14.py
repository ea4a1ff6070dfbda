"""Statistical + calendar SQL surface (x125–x128): built-in
linear-regression aggregates, ordered-set percentiles (WITHIN GROUP),
bucketed/bitwise aggregation, and timezone-aware trading-hours filtering.

Complements x101_linreg (hand-rolled decimal-exact moments): x125 exercises
the regr_* aggregate family Catalyst evaluates JVM-side in one hash-agg
pass — the form a 100 TB fit actually uses (partial moments per partition,
merged at the exchange; no second scan, no driver math).

Determinism note: regr_* over doubles is order-dependent in general; these
queries aim the aggregates at small-magnitude, few-rows-per-group data
(part.p_size × p_retailprice grouped by brand) where every partial sum is
exactly representable in double, so any accumulation order hashes equal.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x125: regr_* aggregate family -----------------------------------------
# Same fn names/semantics in Spark 4 and DuckDB; NULL-pair rows are skipped
# by definition (regr_count counts only pairs with both sides non-null).

register_sql(
    "x125_regr_aggs",
    spark_sql="""
    SELECT p_brand,
           regr_count(p_retailprice, p_size)                 AS n_pairs,
           ROUND(regr_avgx(p_retailprice, p_size), 4)        AS avg_size,
           ROUND(regr_avgy(p_retailprice, p_size), 4)        AS avg_price,
           ROUND(regr_slope(p_retailprice, p_size), 4)       AS slope,
           ROUND(regr_intercept(p_retailprice, p_size), 4)   AS icept,
           ROUND(regr_r2(p_retailprice, p_size), 6)          AS r2
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    duckdb_sql="""
    SELECT p_brand,
           CAST(regr_count(p_retailprice, p_size) AS BIGINT)  AS n_pairs,
           ROUND(regr_avgx(p_retailprice, p_size), 4)         AS avg_size,
           ROUND(regr_avgy(p_retailprice, p_size), 4)         AS avg_price,
           ROUND(regr_slope(p_retailprice, p_size), 4)        AS slope,
           ROUND(regr_intercept(p_retailprice, p_size), 4)    AS icept,
           ROUND(regr_r2(p_retailprice, p_size), 6)           AS r2
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("stats", "agg"),
)

# -- x126: ordered-set aggregates (WITHIN GROUP) ----------------------------
# percentile_disc returns an actual data value (here: integer-valued
# l_quantity → exact); percentile_cont interpolates (midpoint of two
# integers → exactly representable). Both deterministic under parallelism.

register_sql(
    "x126_percentile_within_group",
    spark_sql="""
    SELECT l_returnflag,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
             AS med_disc,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4)
             AS med_cont,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
             AS p90_disc,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4)
             AS p25_cont
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    duckdb_sql="""
    SELECT l_returnflag,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
             AS med_disc,
           ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
                 AS DOUBLE), 4) AS med_cont,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
             AS p90_disc,
           ROUND(CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)
                 AS DOUBLE), 4) AS p25_cont
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("stats", "agg"),
)

# -- x127: histogram bucketing + bitwise aggregates -------------------------
# width_bucket has identical edge semantics in both engines (below-range →
# 0, above-range → n+1). Bitwise aggs over integers are order-independent.

register_sql(
    "x127_width_bucket_bitaggs",
    spark_sql="""
    SELECT width_bucket(c_acctbal, -1000.0, 10000.0, 11) AS bucket,
           COUNT(*)                                      AS n,
           bit_and(c_nationkey)                          AS nk_and,
           bit_or(c_nationkey)                           AS nk_or,
           bit_xor(c_custkey)                            AS ck_xor
    FROM customer
    GROUP BY width_bucket(c_acctbal, -1000.0, 10000.0, 11)
    ORDER BY bucket
    """,
    duckdb_sql="""
    -- DuckDB has no width_bucket; equivalent arithmetic. Bucket width is
    -- (10000 - -1000)/11 = 1000 exactly, so boundary math is float-exact.
    SELECT CAST(CASE WHEN c_acctbal < -1000.0 THEN 0
                     WHEN c_acctbal >= 10000.0 THEN 12
                     ELSE 1 + FLOOR((c_acctbal + 1000.0) / 1000.0)
                END AS INTEGER) AS bucket,
           COUNT(*)                                     AS n,
           CAST(bit_and(c_nationkey) AS INTEGER)        AS nk_and,
           CAST(bit_or(c_nationkey) AS INTEGER)         AS nk_or,
           CAST(bit_xor(c_custkey) AS INTEGER)          AS ck_xor
    FROM customer
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("stats", "agg", "bitwise"),
)

# -- x128: timezone conversion + regular-trading-hours window ---------------
# The reference stores ticks in UTC (`tick.rs:7`, Arrow Timestamp(µs,"UTC"))
# but its critical_ranges are exchange-local RTH windows
# (`job_state.rs:72-76`; IDD RTH discussion). This is the canonical
# UTC → exchange-wall-clock filter: convert, keep 09:30–15:59 NY weekdays,
# aggregate per local day. Both engines consult the IANA tzdb.
# DuckDB's timezone() is direction-typed: (tz, TIMESTAMP) localizes naive →
# TIMESTAMPTZ, (tz, TIMESTAMPTZ) renders wall clock; composing both gives
# Spark's from_utc_timestamp.

register_sql(
    "x128_rth_local_window",
    spark_sql="""
    WITH localized AS (
      SELECT from_utc_timestamp(ts, 'America/New_York') AS lts, value
      FROM events
    )
    SELECT CAST(DATE_TRUNC('day', lts) AS DATE) AS ny_day,
           COUNT(*) AS n,
           ROUND(CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DECIMAL(38,4)) AS DOUBLE), 4) AS sum_val
    FROM localized
    WHERE dayofweek(lts) BETWEEN 2 AND 6
      AND (hour(lts) * 60 + minute(lts)) BETWEEN 570 AND 959
    GROUP BY CAST(DATE_TRUNC('day', lts) AS DATE)
    ORDER BY ny_day
    """,
    duckdb_sql="""
    WITH localized AS (
      SELECT timezone('America/New_York', timezone('UTC', ts)) AS lts, value
      FROM events
    )
    SELECT CAST(DATE_TRUNC('day', lts) AS DATE) AS ny_day,
           COUNT(*) AS n,
           ROUND(CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DECIMAL(38,4)) AS DOUBLE), 4) AS sum_val
    FROM localized
    WHERE dayofweek(lts) + 1 BETWEEN 2 AND 6
      AND (hour(lts) * 60 + minute(lts)) BETWEEN 570 AND 959
    GROUP BY CAST(DATE_TRUNC('day', lts) AS DATE)
    ORDER BY ny_day
    """,
    tags=("calendar", "timezone"),
)

# -- x129: portable MinHash LSH — the oracle-verifiable dedup scale path ----
# x47's production MinHash keys on xxhash64, which no other engine
# reproduces, so the driver can only rows-check it. This variant swaps in
# an md5-based hash family both engines evaluate bit-identically, making
# the ENTIRE shingle → signature → band → candidate-pair pipeline
# hash-verified. Same plan shape (one agg shuffle + bucket equality join).

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from aetherium_trader_datapipeline_spark.operators.dedup import (  # noqa: E402
    PORTABLE_MINHASH_P,
    portable_perm_consts,
)
from aetherium_trader_datapipeline_spark.queries import register  # noqa: E402
from aetherium_trader_datapipeline_spark.tables import load_tables  # noqa: E402

_NP, _NB = 16, 4
_A, _B = portable_perm_consts(_NP)
_RPB = _NP // _NB

_SIG_COLS = ",\n           ".join(
    f"MIN(({_A[i]} * h + {_B[i]}) % {PORTABLE_MINHASH_P}) AS mh{i}"
    for i in range(_NP)
)
_BAND_SELECTS = "\n      UNION ALL ".join(
    "SELECT id, {j} AS band, concat_ws('-', {cols}) AS bk FROM sig".format(
        j=j, cols=", ".join(f"mh{j * _RPB + r}" for r in range(_RPB))
    )
    for j in range(_NB)
)

_X129_CTES = f"""
    WITH sh AS (
      SELECT DISTINCT doc_id AS id, gram AS sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(string_split(lower(text), ' ')), 1)),
                      i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1])) AS gram
        FROM documents
      ) g WHERE gram IS NOT NULL
    ),
    hashed AS (
      SELECT id, ('0x' || substring(md5(sh), 1, 8))::BIGINT AS h FROM sh
    ),
    sig AS (
      SELECT id,
           {_SIG_COLS}
      FROM hashed GROUP BY id
    ),
    bands AS (
      {_BAND_SELECTS}
    )
"""

# Scale form: per-doc bucket-min representative (linear join cardinality —
# bands×n rows — where the all-pairs form is quadratic in bucket size; a
# duplicate-heavy 10x corpus measured 31.8 M pairs / 25 s vs linear here).
_X129_ORACLE = (
    _X129_CTES
    + """,
    bucket_min AS (
      SELECT band, bk, MIN(id) AS rep FROM bands GROUP BY band, bk
    )
    SELECT DISTINCT e.id, m.rep
    FROM bands e JOIN bucket_min m ON e.band = m.band AND e.bk = m.bk
    WHERE m.rep < e.id
    ORDER BY id, rep LIMIT 200
"""
)

# Pair form kept for cluster-quality inspection at small scale (n_bands =
# LSH vote count per candidate pair).
_X150_ORACLE = (
    _X129_CTES
    + """
    SELECT a.id AS a, b.id AS b, COUNT(*) AS n_bands
    FROM bands a JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id
    GROUP BY a.id, b.id
    ORDER BY n_bands DESC, a, b LIMIT 100
"""
)


@register(
    "x129_minhash_portable", headline=True, oracle=_X129_ORACLE, tags=("dedup", "lsh")
)
def x129_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        minhash_portable_assignments,
    )

    t = load_tables(spark, sf_dir)
    return (
        minhash_portable_assignments(
            t["documents"], "doc_id", num_perm=_NP, bands=_NB
        )
        .orderBy("id", "rep")
        .limit(200)
    )


@register(
    "x150_minhash_pairs", oracle=_X150_ORACLE, tags=("dedup", "lsh")
)
def x150_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        minhash_portable_candidates,
    )
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    return (
        minhash_portable_candidates(
            t["documents"], "doc_id", num_perm=_NP, bands=_NB
        )
        .orderBy(F.desc("n_bands"), "a", "b")
        .limit(100)
    )

# -- x130: portable SimHash — oracle-verified near-dup detection ------------
# Closes x48's oracle gap the same way x129 closes x47's: md5-prefix token
# hash, 32-bit signature from per-bit vote signs, 4x8-bit pigeonhole chunk
# candidates, bit_count hamming. Both engines compute the identical
# candidate set AND the identical distances, so the driver hash-verifies
# the full pipeline.

_SH_BITS, _SH_CHUNKS, _SH_MAXH = 60, 4, 8  # 15-bit chunks: 32 k buckets
_SH_W = _SH_BITS // _SH_CHUNKS
_SH_MASK = (1 << _SH_W) - 1

_VOTE_COLS = ",\n           ".join(
    f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}"
    for i in range(_SH_BITS)
)
_SIG_EXPR = " + ".join(
    f"(CASE WHEN v{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)" for i in range(_SH_BITS)
)
_CHUNK_SELECTS = "\n      UNION ALL ".join(
    f"SELECT id, simhash, {i} AS cix, (simhash >> {i * _SH_W}) & {_SH_MASK} AS ck FROM sig"
    for i in range(_SH_CHUNKS)
)

_X130_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id AS id,
             ('0x' || substring(md5(unnest(string_split(lower(text), ' '))), 1, 15))::BIGINT AS h
      FROM documents
    ),
    votes AS (
      SELECT id,
           {_VOTE_COLS}
      FROM toks GROUP BY id
    ),
    sig AS (
      SELECT id, {_SIG_EXPR} AS simhash FROM votes
    ),
    chunks AS (
      {_CHUNK_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.id AS a, b.id AS b, a.simhash AS sa, b.simhash AS sb
      FROM chunks a JOIN chunks b ON a.cix = b.cix AND a.ck = b.ck AND a.id < b.id
    )
    SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {_SH_MAXH}
    ORDER BY hamming, a, b LIMIT 200
"""


@register("x130_simhash_portable", oracle=_X130_ORACLE, tags=("dedup", "simhash"))
def x130_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.dedup import (
        simhash_portable_pairs,
    )

    t = load_tables(spark, sf_dir)
    return (
        simhash_portable_pairs(
            t["documents"], "doc_id",
            bits=_SH_BITS, chunks=_SH_CHUNKS, max_hamming=_SH_MAXH,
        )
        .select("a", "b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("hamming", "a", "b")
        .limit(200)
    )

# -- x131/x132: session variables, EXECUTE IMMEDIATE, parameterized SQL -----
# The modern-SQL control surface an analytics service builds templated
# queries on. The variables/parameters only shape the final SELECT, so the
# oracle is the same query with the values inlined as literals.


@register(
    "x131_sql_variables",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderdate >= DATE '1996-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql", "variables"),
)
def x131_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARE VARIABLE + SET VAR + EXECUTE IMMEDIATE: the query text is
    assembled and executed server-side; variables bind as constants, so
    Catalyst constant-folds them into pushed-down scan filters."""
    load_tables(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE min_price DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff DATE")
    spark.sql("SET VAR min_price = 150000.0")
    spark.sql("SET VAR cutoff = DATE '1996-01-01'")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE qry STRING DEFAULT "
        '"SELECT o_orderpriority, COUNT(*) AS n, '
        "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev "
        "FROM orders WHERE o_totalprice > min_price AND o_orderdate >= cutoff "
        'GROUP BY o_orderpriority ORDER BY o_orderpriority"'
    )
    return spark.sql("EXECUTE IMMEDIATE qry")


@register(
    "x132_parameterized_sql",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE c_acctbal BETWEEN 1000.0 AND 5000.0
      AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sql", "parameters"),
)
def x132_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-marker parameterized spark.sql — injection-safe templating;
    parameters arrive as literals, so pushdown/folding work as usual."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM customer
        WHERE c_acctbal BETWEEN :lo AND :hi
          AND c_mktsegment IN (:seg1, :seg2)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
        args={"lo": 1000.0, "hi": 5000.0, "seg1": "BUILDING", "seg2": "MACHINERY"},
    )

# -- x133: IDENTIFIER clause — safe dynamic table/column references ---------
# Completes the templating trio (x131 variables, x132 value parameters):
# IDENTIFIER() lets table/column names arrive as parameters without SQL
# injection; the resolved query is ordinary Catalyst input (pushdown etc.).


@register(
    "x133_identifier_clause",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("sql", "identifier"),
)
def x133_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:group_col) AS o_orderstatus, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(IDENTIFIER(:val_col) AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:group_col)
        ORDER BY IDENTIFIER(:group_col)
        """,
        args={"tbl": "orders", "group_col": "o_orderstatus", "val_col": "o_totalprice"},
    )

# -- x134: VWAP — volume-weighted average price -----------------------------
# Completes the market-rollup family next to OHLCV (q32) and TWAP (x79).
# Weighted mean as two decimal-exact partial sums (sum(p*q), sum(q)) —
# one hash-agg pass, order-independent, so the double division at the end
# is engine-reproducible.

register_sql(
    "x134_vwap",
    spark_sql="""
    SELECT l_suppkey AS grp,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS vwap,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS vol
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY grp LIMIT 300
    """,
    duckdb_sql="""
    SELECT l_suppkey AS grp,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS vwap,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS vol
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY grp LIMIT 300
    """,
    tags=("timeseries", "agg"),
)
