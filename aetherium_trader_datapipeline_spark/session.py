"""SparkSession factory.

Configs chosen for the 100 TB design point (AQE, skew handling, pruning)
while remaining correct on local[N]:

- UTC session timezone: the reference stores timestamps as
  Timestamp(Microsecond, "UTC") (reference parquet.rs:30-34); all fixture
  timestamps are naive-UTC. A non-UTC session would silently shift values.
- AQE on (coalesce shuffle partitions, skew-join splitting) — the runtime
  re-planner that matters most at scale.
- Arrow execution for Pandas UDF / toPandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aetherium-trader-datapipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit via spark-submit / YARN / K8s.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime shuffle coalescing + skew-join splitting. At 100 TB
        # this is what keeps a 200-partition plan from becoming 200 stragglers.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any Python<->JVM batch interchange (Pandas UDFs).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables (region/nation/customer at test SF) broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Partitioned-layout pruning for the tick-store layout.
        .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Single-threaded BLAS in Python workers. Each Spark task is the
        # parallelism unit; letting OpenBLAS spawn a per-core thread pool
        # inside every worker (a) oversubscribes N_tasks x N_cores threads
        # at scale and (b) costs 2-3 s of one-time pool init on the FIRST
        # matmul in every fresh worker — measured as q35's bimodal
        # 0.7 s / 2.4-5 s bench readings (r7 profile, BASELINE.md).
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine configs to an externally-built session.

    The correctness driver hands us its own SparkSession; timezone and AQE
    are runtime confs, so we can still guarantee them here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    # A bare session defaults to 200 shuffle partitions — far too many for
    # iterative operators (each localCheckpoint materializes them all).
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    )
    return spark
