#!/usr/bin/env python
"""Standing scale regression: run headline-scale pipelines against a
key-shifted replica and print ONE JSON line per pipeline.

Usage:
  python scripts/scale_check.py [replica_dir]
defaults: /root/repo/.data/sf1x  (make replicas with make_scale_fixture.py;
.data/sf10x is the 100x replica)

Pipelines (the repo's scale backbone, SCALE.md's recurring rows):
  neardup   signatures → bucket-min assignment edges → connected components
  pagerank  3-round integer BSP over the symmetrized doc-pair graph
  dedup_e2e exact content-hash dedup over documents
Each line: {"pipeline": ..., "wall_s": ..., "rows": ..., "dir": ...}
Compare against SCALE.md; wall should scale sublinearly with replica size.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf1x"

    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.dedup import (
        dedup_exact,
        minhash_portable_assignments,
    )
    from aetherium_trader_datapipeline_spark.operators.graph import (
        connected_components,
        pagerank_fixed,
    )
    from aetherium_trader_datapipeline_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="scale-wh-")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{replica}/documents.parquet")
    docs.select(F.length("text").alias("l")).agg(F.sum("l")).collect()  # warm scan

    def report(pipeline: str, wall: float, rows: int) -> None:
        print(
            json.dumps(
                {
                    "pipeline": pipeline,
                    "wall_s": round(wall, 2),
                    "rows": rows,
                    "dir": replica,
                }
            ),
            flush=True,
        )

    t0 = time.perf_counter()
    edges = minhash_portable_assignments(docs, "doc_id", num_perm=16, bands=4)
    cc = connected_components(
        edges.select(F.col("id").alias("src"), F.col("rep").alias("dst"))
    )
    n_clusters = cc.select("component").distinct().count()
    report("neardup", time.perf_counter() - t0, n_clusters)

    t0 = time.perf_counter()
    e = edges.select(F.col("id").alias("src"), F.col("rep").alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    n_ranked = pagerank_fixed(sym, iterations=3, symmetric=True).count()
    report("pagerank", time.perf_counter() - t0, n_ranked)

    t0 = time.perf_counter()
    n_kept = dedup_exact(docs, ["text"]).count()
    report("dedup_e2e", time.perf_counter() - t0, n_kept)


if __name__ == "__main__":
    main()
