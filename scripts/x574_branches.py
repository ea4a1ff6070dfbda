"""x574 direct branch-cost measurement at the 100x replica (VERDICT r12 #6).

Times, in one warmed session:
  full  - the committed x574 query (window branch + ndv branch)
  wnd   - the chunked-window/chg branch terminal alone
  ndv   - the tuple-grid ndv branch terminal alone
If wnd + ndv ~= full and ndv is small, a fused single-pass form cannot win
(its best case saves only the ndv scan while serializing the branches).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REPLICA = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10x"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession  # noqa: E402

from aetherium_trader_datapipeline_spark.queries_ext169 import (  # noqa: E402
    _GRID_SPARK,
    _X574_FMT,
)

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

li = spark.read.parquet(f"{REPLICA}/lineitem.parquet")
li.createOrReplaceTempView("lineitem")
print("lineitem rows:", li.count(), flush=True)

full_sql = _X574_FMT.format(grid=_GRID_SPARK, intdiv="DIV")
tail_at = full_sql.rindex("SELECT col, n, ndv, runs, dict_bits")
prefix = full_sql[:tail_at]
variants = {
    "full": full_sql,
    "wnd": prefix + "SELECT * FROM chg",
    "ndv": prefix + "SELECT * FROM ndv",
}

for name, sql in variants.items():
    spark.sparkContext.setJobDescription(f"x574-branch-{name}")
    walls = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        rows = spark.sql(sql).collect()
        walls.append(time.perf_counter() - t0)
    print(
        f"{name}: walls={[round(w, 2) for w in walls]} "
        f"min={min(walls):.2f} rows={len(rows)}",
        flush=True,
    )
