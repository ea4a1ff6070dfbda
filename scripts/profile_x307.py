#!/usr/bin/env python
"""Stage-time profile of x307_exact_similarity_join (VERDICT r13 item #5).

Replays the query body phase by phase with timers around the eager
localCheckpoints so each phase's wall is measurable in isolation:

  P1  reps        — bigram explode + collect_set + signature groupBy
  P2  rep_toks    — vocab window + SHUFFLE_HASH dictionary encode
  P3  kernel+out  — triangle replicate + GEMM applyInPandas + members
                    joins + orderBy/limit collect

Optionally probes the GEMM block_size (the only kernel shape knob; the
applyInPandas group is one pandas frame regardless of Arrow batch size).

Usage: python scripts/profile_x307.py [sf_dir] [block_size ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(spark, sf_dir, block_size=2048):
    from pyspark.sql import functions as F

    from aetherium_trader_datapipeline_spark.operators.similarity import (
        exact_jaccard_pairs,
    )
    from aetherium_trader_datapipeline_spark.tables import load_tables

    sc = spark.sparkContext
    load_tables(spark, sf_dir)["documents"].createOrReplaceTempView("documents")

    t0 = time.perf_counter()
    sc.setJobDescription("x307 P1: reps checkpoint")
    reps = spark.sql(
        """
        WITH d AS (
          SELECT doc_id, array_sort(collect_set(w)) AS tw
          FROM (
            SELECT doc_id, split(lower(text), ' ') AS ws
            FROM documents WHERE size(split(lower(text), ' ')) >= 2
          ) s
          LATERAL VIEW explode(
            transform(sequence(1, size(ws) - 1),
                      i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
          ) t AS w
          WHERE w <> ''
          GROUP BY doc_id
        )
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS members,
               min_by(tw, doc_id) AS tw
        FROM d GROUP BY md5(array_join(tw, ' '))
        """
    ).localCheckpoint()
    t1 = time.perf_counter()
    reps.createOrReplaceTempView("x307_reps")
    sc.setJobDescription("x307 P2: rep_toks dictionary encode")
    rep_toks = spark.sql(
        """
        WITH rt AS (
          SELECT doc_id, members, w FROM x307_reps
          LATERAL VIEW explode(tw) t AS w
        ),
        vocab AS (
          SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS wid
          FROM (SELECT DISTINCT w FROM rt)
        )
        SELECT /*+ SHUFFLE_HASH(v) */
               rt.doc_id, rt.members, collect_list(v.wid) AS toks
        FROM rt JOIN vocab v ON rt.w = v.w
        GROUP BY rt.doc_id, rt.members
        """
    ).localCheckpoint()
    t2 = time.perf_counter()
    sc.setJobDescription(f"x307 P3: GEMM kernel bs={block_size} + members join")
    pairs = exact_jaccard_pairs(
        rep_toks, "doc_id", "toks", threshold_num=8, threshold_den=10,
        block_size=block_size,
    )
    memb = reps.select("doc_id", "members")
    out = (
        pairs.join(
            memb.select(F.col("doc_id").alias("a"), F.col("members").alias("m1")),
            "a",
        )
        .join(
            memb.select(F.col("doc_id").alias("b"), F.col("members").alias("m2")),
            "b",
        )
        .selectExpr(
            "a AS d1", "b AS d2",
            "CAST(m1 AS BIGINT) AS members1",
            "CAST(m2 AS BIGINT) AS members2",
            "CAST(n_common AS BIGINT) AS n_common",
            "CAST(sz_a + sz_b - n_common AS BIGINT) AS n_union",
            "CAST(n_common * 10000 DIV (sz_a + sz_b - n_common) AS BIGINT) AS jaccard_bp",
        )
        .orderBy(F.desc("jaccard_bp"), "d1", "d2")
        .limit(200)
    )
    rows = out.collect()
    t3 = time.perf_counter()
    sc.setJobDescription(None)
    return {
        "block_size": block_size,
        "p1_reps_s": round(t1 - t0, 3),
        "p2_rep_toks_s": round(t2 - t1, 3),
        "p3_kernel_out_s": round(t3 - t2, 3),
        "total_s": round(t3 - t0, 3),
        "n_rows": len(rows),
        "head": str(rows[0]) if rows else None,
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    sizes = [int(a) for a in args if a.isdigit()] or [2048]

    from aetherium_trader_datapipeline_spark.session import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up pass (JIT, codegen, scan caches) at the default shape
    run_once(spark, sf_dir, 2048)
    for bs in sizes:
        for _ in range(2):
            print(json.dumps(run_once(spark, sf_dir, bs)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
