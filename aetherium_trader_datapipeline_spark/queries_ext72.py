"""Wave 72 (x308): declarative data-quality expectation suite.

`operators/expectations.py` is the dbt-test/Great-Expectations pattern as
a Spark-first rule engine (one COUNT aggregate per rule, union of
single-row frames — the publish gate a 100 TB pipeline runs before
shipping a table).  x308 runs a fixed 8-rule suite over the fixture
warehouse — nullability, key uniqueness, value ranges, enums,
referential integrity both directions of the orders spine, and an
arbitrary predicate — and the DuckDB oracle recomputes every count from
first principles.  The fixture is clean, so most rules pass with 0
violations; the suite's value is that the COUNTS, not just the booleans,
hash-verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

_X308_ORACLE = """
    SELECT 'li_discount_range' AS rule, 'lineitem' AS table_name,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1)
                AS BIGINT) AS n_violations,
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1) = 0 AS passed
    UNION ALL
    SELECT 'li_orderkey_fk', 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
                 AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT),
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
            AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0
    UNION ALL
    SELECT 'li_orderkey_not_null', 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS BIGINT),
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) = 0
    UNION ALL
    SELECT 'li_pk_unique', 'lineitem',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                 FROM lineitem) AS BIGINT),
           (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
            FROM lineitem) = 0
    UNION ALL
    SELECT 'li_qty_range', 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
                AS BIGINT),
           (SELECT COUNT(*) FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50) = 0
    UNION ALL
    SELECT 'o_custkey_fk', 'orders',
           CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL
                 AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT),
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
    UNION ALL
    SELECT 'o_price_positive', 'orders',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE NOT COALESCE(o_totalprice > 0, FALSE)) AS BIGINT),
           (SELECT COUNT(*) FROM orders
            WHERE NOT COALESCE(o_totalprice > 0, FALSE)) = 0
    UNION ALL
    SELECT 'event_type_enum', 'events',
           CAST((SELECT COUNT(*) FROM events
                 WHERE event_type IS NULL OR event_type NOT IN
                   ('click', 'view', 'purchase', 'signup', 'error')) AS BIGINT),
           (SELECT COUNT(*) FROM events
            WHERE event_type IS NULL OR event_type NOT IN
              ('click', 'view', 'purchase', 'signup', 'error')) = 0
    ORDER BY rule
"""


@register("x308_data_expectations", oracle=_X308_ORACLE, tags=("ops", "quality"))
def x308_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.expectations import (
        accepted_range,
        accepted_values,
        not_null,
        predicate,
        referential,
        run_expectations,
        unique,
    )

    t = load_tables(spark, sf_dir)
    rules = [
        not_null("li_orderkey_not_null", "lineitem", "l_orderkey"),
        unique("li_pk_unique", "lineitem", "l_orderkey", "l_linenumber"),
        accepted_range("li_qty_range", "lineitem", "l_quantity", 1, 50),
        accepted_range("li_discount_range", "lineitem", "l_discount", 0.0, 0.1),
        referential("li_orderkey_fk", "lineitem", "l_orderkey", t["orders"], "o_orderkey"),
        referential("o_custkey_fk", "orders", "o_custkey", t["customer"], "c_custkey"),
        predicate("o_price_positive", "orders", "o_totalprice > 0"),
        accepted_values(
            "event_type_enum", "events", "event_type",
            "click", "view", "purchase", "signup", "error",
        ),
    ]
    return run_expectations(t, rules)
