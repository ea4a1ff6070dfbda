"""Function-surface breadth (x93–x97): higher-order array functions,
struct/JSON codec round-trips, calendar functions, numeric histograms.

Array-valued results are string-serialized (array_join / array_to_string)
because the correctness driver canonicalizes rows via pandas hashing, which
cannot hash list cells. Float→int via FLOOR (identical semantics in both
engines; ROUND on binary doubles can split on .5 representations).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- higher-order array functions: transform/filter/slice/sort/distinct -----

register_sql(
    "x93_higher_order_arrays",
    headline=True,
    spark_sql="""
    SELECT vec_id,
           array_join(transform(slice(CAST(embedding AS ARRAY<DOUBLE>), 2, 3),
                                x -> CAST(FLOOR(x * 1000) AS INT)), ',') AS mid3_milli,
           CAST(size(filter(CAST(embedding AS ARRAY<DOUBLE>), x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(FLOOR(element_at(sort_array(CAST(embedding AS ARRAY<DOUBLE>)), 1) * 1000) AS INT) AS min_milli,
           CAST(size(array_distinct(transform(CAST(embedding AS ARRAY<DOUBLE>),
                                              x -> CAST(FLOOR(x * 10) AS INT)))) AS BIGINT) AS n_decile
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    duckdb_sql="""
    SELECT vec_id,
           array_to_string(list_transform(list_slice(CAST(embedding AS DOUBLE[]), 2, 4),
                                          x -> CAST(FLOOR(x * 1000) AS INT)), ',') AS mid3_milli,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS BIGINT) AS n_pos,
           CAST(FLOOR(list_sort(CAST(embedding AS DOUBLE[]))[1] * 1000) AS INT) AS min_milli,
           CAST(len(list_distinct(list_transform(CAST(embedding AS DOUBLE[]),
                                                 x -> CAST(FLOOR(x * 10) AS INT)))) AS BIGINT) AS n_decile
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    tags=("functions", "array", "higher-order"),
)

# -- zip_with dot product (sequential left-fold == list_dot_product order) --

register_sql(
    "x94_zip_with_dot",
    spark_sql="""
    SELECT vec_id,
           ROUND(AGGREGATE(zip_with(CAST(embedding AS ARRAY<DOUBLE>),
                                    reverse(CAST(embedding AS ARRAY<DOUBLE>)),
                                    (x, y) -> x * y),
                           CAST(0 AS DOUBLE), (a, v) -> a + v), 4) AS dot_rev
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    duckdb_sql="""
    SELECT vec_id,
           ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  list_reverse(CAST(embedding AS DOUBLE[]))), 4) AS dot_rev
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    tags=("functions", "array", "higher-order"),
)

# -- JSON → typed struct → JSON round trip ----------------------------------

register_sql(
    "x95_json_struct_roundtrip",
    spark_sql="""
    SELECT event_id, s.k AS k,
           to_json(named_struct('k', s.k, 'uid', user_id)) AS packed
    FROM (SELECT event_id, user_id, from_json(props, 'k BIGINT') AS s FROM events)
    ORDER BY event_id LIMIT 200
    """,
    duckdb_sql="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS BIGINT),
                               uid := user_id)) AS packed
    FROM events ORDER BY event_id LIMIT 200
    """,
    tags=("functions", "json", "struct"),
)

# -- calendar function breadth ---------------------------------------------
# DuckDB dayofweek is 0-based (Sunday=0); Spark is 1-based (Sunday=1).

register_sql(
    "x96_calendar_fns",
    spark_sql="""
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS DATE) AS eom,
           CAST(add_months(o_orderdate, 1) AS DATE) AS next_m,
           dayofweek(o_orderdate) AS dow,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           date_format(o_orderdate, 'yyyy-MM') AS ym,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS wk
    FROM orders ORDER BY o_orderkey LIMIT 300
    """,
    duckdb_sql="""
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE)) AS eom,
           CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_m,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS wk
    FROM orders ORDER BY o_orderkey LIMIT 300
    """,
    tags=("functions", "date"),
)

# -- equi-width histogram (floor-bucket; no engine-specific histogram fn) ---

register_sql(
    "x97_histogram",
    spark_sql="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS lo,
           CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS hi
    FROM orders GROUP BY FLOOR(o_totalprice / 50000) ORDER BY bucket
    """,
    duckdb_sql="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(ROUND(MIN(o_totalprice), 2) AS DOUBLE) AS lo,
           CAST(ROUND(MAX(o_totalprice), 2) AS DOUBLE) AS hi
    FROM orders GROUP BY FLOOR(o_totalprice / 50000) ORDER BY bucket
    """,
    tags=("functions", "histogram"),
)
