"""Backfill service (op P2) — control-table-driven day loop.

Reference: backfill_range (application/src/backfill_service.rs:143-225):
initialize job (J1) → resume from cursor → detect gaps (G1) → plan days
(P1) → per-day: skip if end_of_day <= cursor, heartbeat, fetch, persist,
advance cursor; per-day failures collected, final status COMPLETED iff
none failed.

Spark shape: the *days* drive a driver-side loop (days are the work
granularity, same as the reference); each day's fetch+persist is fully
distributed. The cursor is a high-water mark persisted per completed day
— a restart resumes from it, and a concurrent zombie writer is fenced by
the instance id (Z1).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.operators.backfill import plan_backfill_days
from aetherium_trader_datapipeline_spark.plans.control_table import (
    COMPLETED,
    FAILED,
    ControlTable,
    job_key,
)
from aetherium_trader_datapipeline_spark.streaming.ingest import ingest_batch


@dataclass
class BackfillReport:
    days_processed: int = 0
    total_ticks: int = 0
    failed_days: list[str] = field(default_factory=list)


def existing_dates(spark: SparkSession, data_dir: str, symbol: str) -> DataFrame:
    """Op G2 — catalog probe. With the partitioned layout, partition
    pruning reads only the symbol's directory listing; non-empty files are
    guaranteed by the sink (empty-file case of detectors/gap.rs:60-83
    cannot occur under Spark's task commit)."""
    try:
        df = spark.read.parquet(data_dir)
    except Exception:
        return spark.createDataFrame([], "d DATE")
    return df.where(F.col("symbol") == symbol).select(F.col("date").alias("d")).distinct()


def backfill_range(
    spark: SparkSession,
    control: ControlTable,
    fetch_day,  # (spark, symbol, date_str) -> DataFrame of ticks
    data_dir: str,
    symbol: str,
    start: str,
    end: str,
    now: float | None = None,
) -> BackfillReport:
    key = job_key(symbol, start)
    day_start_ms = int(
        dt.datetime.fromisoformat(start).replace(tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    end_ms = int(
        (dt.datetime.fromisoformat(end).replace(tzinfo=dt.timezone.utc)
         + dt.timedelta(days=1)).timestamp() * 1000
    )
    st = control.initialize_job(key, day_start_ms, end_ms, now=now)
    instance = st.job_instance_id

    present = existing_dates(spark, data_dir, symbol)
    plan = [
        str(r.d)
        for r in plan_backfill_days(present, start, end, cursor_ms=st.cursor).collect()
    ]

    report = BackfillReport()
    for day in plan:
        end_of_day_ms = int(
            (dt.datetime.fromisoformat(day).replace(tzinfo=dt.timezone.utc)
             + dt.timedelta(days=1)).timestamp() * 1000
        ) - 1
        if end_of_day_ms <= st.cursor:
            continue  # already covered by the HWM (backfill_service.rs:179-181)
        control.heartbeat(key, instance, now=now)
        try:
            ticks = fetch_day(spark, symbol, day)
            ingest_batch(ticks, data_dir)
            n = ticks.count()
            max_ts = ticks.agg(F.max(F.unix_micros("timestamp"))).collect()[0][0]
            if max_ts is not None:
                control.update_cursor(key, instance, max_ts // 1000)
                st = control.get(key)
            report.days_processed += 1
            report.total_ticks += n
        except Exception as e:  # per-day failures collected, not fatal
            report.failed_days.append(day)
            control.update_status(key, instance, st.status, error_type=type(e).__name__)
    final = COMPLETED if not report.failed_days else FAILED
    control.update_status(key, instance, final)
    return report
