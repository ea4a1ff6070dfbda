#!/usr/bin/env python
"""Generate a key-shifted N× replica of a test SF directory.

The local fixtures top out at sf0.1 (~600 k lineitem rows) — enough for
correctness, too small to observe scaling behavior. This script fabricates
an N×-larger dataset by unioning N copies of every table with entity keys
shifted per replica, so join cardinalities and group counts scale with the
data the way a real larger SF would, while the tiny dims (region, nation)
stay fixed. Key shifts are computed per key DOMAIN (orderkey, custkey,
partkey, suppkey, …) so foreign keys keep joining within their replica.
Values (prices, dates, text) repeat — fine for performance work, not for
correctness (hashes obviously differ from any real SF).

Usage:
  python scripts/make_scale_fixture.py [src_dir] [dst_dir] [factor]
defaults: /root/testdata/sf0.1  /root/repo/.data/sf1x  10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# key domain -> (defining table, defining column); stride = max(col)+1
DOMAINS: dict[str, tuple[str, str]] = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
# table -> {column: domain}
TABLE_KEYS: dict[str, dict[str, str]] = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/sf1x"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from aetherium_trader_datapipeline_spark.session import get_spark
    from aetherium_trader_datapipeline_spark.tables import load_tables

    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    # load_tables handles the events nanos-timestamp quirk; the rewritten
    # copy comes out as plain TIMESTAMP(µs), which downstream reads accept.
    tables = load_tables(spark, src)

    strides = {
        dom: int(tables[tbl].agg(F.max(col)).head()[0]) + 1
        for dom, (tbl, col) in DOMAINS.items()
    }
    print("strides:", strides)

    for t in COPY_AS_IS:
        tables[t].write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: copied")

    for t, keymap in TABLE_KEYS.items():
        df = tables[t]
        replicas = []
        for i in range(factor):
            r = df
            for col, dom in keymap.items():
                r = r.withColumn(col, F.col(col) + F.lit(i * strides[dom]))
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.unionByName(r)
        out.repartition(32).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
