"""Third extension wave: relational breadth (full outer join, exact
percentiles, edit distance, unpivot, epoch/date arithmetic, null handling,
ordered string aggregation, IGNORE NULLS windows, bitwise ops) plus the
graph side of near-dup removal — connected components / duplicate
clustering (operators/graph.py) hash-verified against DuckDB recursive
CTEs — and the IVF ANN scale path (rows-only; recall-tested).

Dialect notes:
- DuckDB spells IGNORE NULLS inside the window-function parens,
  Spark after them; semantics identical.
- DuckDB ``dayofweek`` is 0-based Sunday, Spark 1-based — oracle adds 1.
- DuckDB ``^`` is exponentiation; XOR is ``xor()`` — Spark ``^`` maps to it.
- Connected components: Spark runs pointer-jumping min-label propagation;
  the oracle enumerates reachable pairs with WITH RECURSIVE and takes the
  min — same fixpoint, engine-appropriate formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

register_sql(
    "x64_full_outer_join",
    spark_sql="""
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.nc, 0) AS n_rich_cust,
           COALESCE(s.ns, 0) AS n_rich_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS nc FROM customer
          WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS ns FROM supplier
          WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
    ON c.k = s.k
    ORDER BY nationkey
    """,
    duckdb_sql="""
    SELECT COALESCE(c.k, s.k) AS nationkey,
           CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_rich_cust,
           CAST(COALESCE(s.ns, 0) AS BIGINT) AS n_rich_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS nc FROM customer
          WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS ns FROM supplier
          WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
    ON c.k = s.k
    ORDER BY nationkey
    """,
    tags=("join",),
)

register_sql(
    "x65_exact_percentiles",
    # continuous (interpolated) percentiles: Spark percentile == DuckDB
    # quantile_cont. Interpolation midpoints of 2-decimal inputs carry at
    # most 3 fractional digits exactly, so ROUND(,4) is an identity — no
    # half-up/half-even tie risk between the engines.
    spark_sql="""
    SELECT o_orderstatus,
           ROUND(percentile(o_totalprice, 0.25), 4) AS p25,
           ROUND(percentile(o_totalprice, 0.50), 4) AS p50,
           ROUND(percentile(o_totalprice, 0.75), 4) AS p75,
           ROUND(median(o_totalprice), 4) AS med
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    duckdb_sql="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(median(o_totalprice), 4) AS med
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)

register_sql(
    "x66_edit_distance",
    spark_sql="""
    SELECT p_partkey,
           CAST(levenshtein(p_brand, substring(p_name, 1, 8)) AS INT) AS d_bn,
           CAST(levenshtein(substring(p_name, 1, 12), p_type) AS INT) AS d_nt
    FROM part ORDER BY p_partkey LIMIT 200
    """,
    duckdb_sql="""
    SELECT p_partkey,
           CAST(levenshtein(p_brand, substring(p_name, 1, 8)) AS INT) AS d_bn,
           CAST(levenshtein(substring(p_name, 1, 12), p_type) AS INT) AS d_nt
    FROM part ORDER BY p_partkey LIMIT 200
    """,
    tags=("functions", "text"),
)

register_sql(
    "x67_unpivot",
    spark_sql="""
    SELECT c_custkey, metric, ROUND(val, 2) AS val
    FROM (SELECT c_custkey, c_acctbal AS bal, CAST(c_nationkey AS DOUBLE) AS nat
          FROM customer)
    UNPIVOT (val FOR metric IN (bal, nat))
    ORDER BY c_custkey, metric LIMIT 400
    """,
    duckdb_sql="""
    SELECT c_custkey, metric, ROUND(val, 2) AS val FROM (
      SELECT c_custkey, 'bal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nat' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    ) t ORDER BY c_custkey, metric LIMIT 400
    """,
    tags=("reshape",),
)

register_sql(
    "x68_epoch_fns",
    spark_sql="""
    SELECT event_id,
           unix_timestamp(ts) AS epoch_s,
           unix_micros(ts) AS epoch_us,
           date_format(ts, 'yyyy-MM-dd HH') AS hour_str,
           CAST(dayofweek(ts) AS INT) AS dow,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(quarter(ts) AS INT) AS qtr
    FROM events ORDER BY event_id LIMIT 300
    """,
    duckdb_sql="""
    SELECT event_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
           epoch_us(CAST(ts AS TIMESTAMP)) AS epoch_us,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H') AS hour_str,
           CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
           CAST(dayofyear(CAST(ts AS TIMESTAMP)) AS INT) AS doy,
           CAST(quarter(CAST(ts AS TIMESTAMP)) AS INT) AS qtr
    FROM events ORDER BY event_id LIMIT 300
    """,
    tags=("functions", "date"),
)

register_sql(
    "x69_null_fns",
    spark_sql="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
           ROUND(GREATEST(c_acctbal, 0.0), 2) AS bal_pos,
           ROUND(LEAST(c_acctbal, 1000.0), 2) AS bal_cap,
           CAST(c_acctbal IS NULL AS INT) AS bal_null,
           IFNULL(NULLIF(c_nationkey, 0), -1) AS nat_or_neg
    FROM customer ORDER BY c_custkey LIMIT 300
    """,
    duckdb_sql="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
           ROUND(GREATEST(c_acctbal, 0.0), 2) AS bal_pos,
           ROUND(LEAST(c_acctbal, 1000.0), 2) AS bal_cap,
           CAST(c_acctbal IS NULL AS INT) AS bal_null,
           CAST(IFNULL(NULLIF(c_nationkey, 0), -1) AS BIGINT) AS nat_or_neg
    FROM customer ORDER BY c_custkey LIMIT 300
    """,
    tags=("functions", "null"),
)

register_sql(
    "x70_string_agg",
    # ordered, distinct list aggregation — Spark spells it
    # array_join(array_sort(collect_set())), DuckDB string_agg(DISTINCT
    # ... ORDER BY); both deterministic because the list is sorted.
    spark_sql="""
    SELECT c_nationkey,
           array_join(array_sort(collect_set(c_mktsegment)), ',') AS segs,
           COUNT(DISTINCT c_mktsegment) AS n_segs
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    duckdb_sql="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segs,
           COUNT(DISTINCT c_mktsegment) AS n_segs
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("agg", "string"),
)

register_sql(
    "x71_ignore_nulls_window",
    spark_sql="""
    SELECT event_id,
           ROUND(LAST_VALUE(CASE WHEN event_type <> 'view' THEN value END) IGNORE NULLS
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS last_nonview_val
    FROM events ORDER BY event_id LIMIT 500
    """,
    duckdb_sql="""
    SELECT event_id,
           ROUND(LAST_VALUE(CASE WHEN event_type <> 'view' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS last_nonview_val
    FROM events ORDER BY event_id LIMIT 500
    """,
    tags=("window",),
)

register_sql(
    "x75_bitwise",
    spark_sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(l_orderkey | l_linenumber AS BIGINT) AS bor,
           CAST(l_orderkey ^ l_linenumber AS BIGINT) AS bxor,
           CAST(shiftleft(l_linenumber, 3) AS BIGINT) AS shl,
           CAST(shiftright(l_orderkey, 2) AS BIGINT) AS shr
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300
    """,
    duckdb_sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(l_orderkey | l_linenumber AS BIGINT) AS bor,
           CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS bxor,
           CAST(l_linenumber << 3 AS BIGINT) AS shl,
           CAST(l_orderkey >> 2 AS BIGINT) AS shr
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300
    """,
    tags=("functions", "bitwise"),
)

register_sql(
    "x76_date_arith",
    spark_sql="""
    SELECT o_orderkey,
           add_months(o_orderdate, 2) AS plus2m,
           last_day(o_orderdate) AS eom,
           CAST(datediff(DATE'1998-12-31', o_orderdate) AS INT) AS days_to_end,
           trunc(o_orderdate, 'quarter') AS qstart,
           CAST(weekofyear(o_orderdate) AS INT) AS woy
    FROM orders ORDER BY o_orderkey LIMIT 300
    """,
    duckdb_sql="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
           last_day(o_orderdate) AS eom,
           CAST(date_diff('day', o_orderdate, DATE '1998-12-31') AS INT) AS days_to_end,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qstart,
           CAST(weekofyear(o_orderdate) AS INT) AS woy
    FROM orders ORDER BY o_orderkey LIMIT 300
    """,
    tags=("functions", "date"),
)


# ---------------------------------------------------------------------------
# Graph: connected components / duplicate clustering (operators/graph.py)
# ---------------------------------------------------------------------------

_CC_EDGES_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS u,
       CAST(200000 + o_orderkey % 331 AS BIGINT) AS v
FROM orders WHERE o_orderkey % 101 = 0
"""


@register(
    "x72_connected_components",
    headline=True,
    oracle=f"""
    WITH RECURSIVE edges AS ({_CC_EDGES_SQL}),
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    reach(n, m) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.n, s.v FROM reach r JOIN sym s ON r.m = s.u
    )
    SELECT n AS node, CAST(LEAST(n, MIN(m)) AS BIGINT) AS component
    FROM reach GROUP BY n ORDER BY node
    """,
    tags=("graph", "dedup"),
)
def x72_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointer-jumping min-label CC on a deterministic bipartite graph
    (customers ↔ hashed order hubs); oracle = reachability closure via
    DuckDB WITH RECURSIVE."""
    from aetherium_trader_datapipeline_spark.operators.graph import connected_components

    load_tables(spark, sf_dir)
    edges = spark.sql(_CC_EDGES_SQL)
    return connected_components(edges, "u", "v").orderBy("node")


@register(
    "x73_dup_clusters",
    oracle="""
    WITH RECURSIVE sh0 AS (
      SELECT DISTINCT doc_id AS id, gram AS sh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(string_split(lower(text), ' ')), 1)),
                      i -> string_split(lower(text), ' ')[i] || ' ' || string_split(lower(text), ' ')[i+1])) AS gram
        FROM documents
      ) g
    ),
    freq AS (SELECT sh, COUNT(*) AS df FROM sh0 GROUP BY sh),
    sh AS (SELECT id, sh0.sh FROM sh0 JOIN freq USING (sh) WHERE freq.df <= 100),
    sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
    pairs AS (
      SELECT a, b FROM (
        SELECT a.id AS a, b.id AS b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
      ) i JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
      WHERE ROUND(inter / (sa.sz + sb.sz - inter), 4) >= 0.6
    ),
    sym AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
    reach(n, m) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.n, s.v FROM reach r JOIN sym s ON r.m = s.u
    )
    SELECT CAST(n AS BIGINT) AS doc_id, CAST(LEAST(n, MIN(m)) AS BIGINT) AS canonical_id
    FROM reach GROUP BY n ORDER BY doc_id
    """,
    tags=("graph", "dedup"),
)
def x73_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup clustering: exact 2-gram Jaccard pairs >= 0.6 →
    connected components → canonical (min doc_id) per cluster. The full
    pipeline a 100 TB dedup pass runs, hash-verified."""
    from aetherium_trader_datapipeline_spark.operators.dedup import ngram_jaccard_pairs
    from aetherium_trader_datapipeline_spark.operators.graph import dedup_clusters

    t = load_tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t["documents"], "doc_id", shingle_size=2, max_shingle_freq=100
    ).where(F.col("jaccard") >= 0.6)
    return (
        dedup_clusters(pairs)
        .select(F.col("id").alias("doc_id"), "canonical_id")
        .orderBy("doc_id")
    )


from aetherium_trader_datapipeline_spark.queries_ext import _ANN_ORACLE  # noqa: E402


@register("x74_ann_ivf_topk", oracle=_ANN_ORACLE, tags=("similarity", "ann"))
def x74_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN, verified by the same recall-summary
    pattern as x50: exact top-20 stats (oracle-hashable) plus a boolean
    asserting IVF recovered >= 10 of the 20 best pairs (measured 14/20 at
    sf0.01)."""
    from aetherium_trader_datapipeline_spark.operators.similarity import ann_ivf_topk
    from aetherium_trader_datapipeline_spark.queries_ext import _ann_recall_summary

    t = load_tables(spark, sf_dir)
    ann = ann_ivf_topk(t["embeddings"], "vec_id", "embedding", k=20)
    return _ann_recall_summary(spark, sf_dir, ann.select("a", "b"), min_hits=10)
