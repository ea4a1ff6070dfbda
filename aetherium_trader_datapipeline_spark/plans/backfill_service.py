"""Backfill service (op P2) — control-table-driven day loop.

Reference: backfill_range (application/src/backfill_service.rs:143-225):
initialize job (J1) → resume from cursor → detect gaps (G1) → plan days
(P1) → per-day: skip if end_of_day <= cursor, heartbeat, fetch, persist,
advance cursor; per-day failures collected, final status COMPLETED iff
none failed.

Spark shape: the *days* drive a driver-side loop (days are the work
granularity, same as the reference); each day's fetch+persist is fully
distributed. The cursor is a high-water mark persisted per completed day
— a restart resumes from it, and per-day FAILURES are recorded as
``critical_ranges`` on the job state (the reference's field of the same
name) so a retry re-plans them even though they sit below the HWM: a
cursor alone cannot distinguish "day done" from "a later day done" (an
r10 review finding — a failed day behind a successful one was previously
never re-planned and the job still read COMPLETED).

Fencing: every control-table mutation is instance-fenced (Z1), and the
loop re-fences via heartbeat immediately before the data-plane write so
a zombie that stalled inside fetch_day cannot clobber a takeover's
partitions with stale data after waking up. The residual window (fence
check → write) is inherent to an unlocked data plane; the write itself
is idempotent (dynamic overwrite of the same day from the same source).
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
    ControlTableCorruptError,
    StaleInstanceError,
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
    cannot occur under Spark's task commit).

    Existence is probed EXPLICITLY: a broad except here used to turn ANY
    read failure (transient FS error, one corrupt footer) into "empty
    lake", which made the planner re-fetch and dynamic-overwrite every
    existing partition (r10 review finding)."""
    from aetherium_trader_datapipeline_spark.operators.merge import _hadoop_fs

    fs, root = _hadoop_fs(spark, data_dir)
    if not fs.exists(root):
        return spark.createDataFrame([], "d DATE")
    df = spark.read.parquet(data_dir)
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
    # Re-plan previously FAILED days recorded on the job state: they sit
    # below the cursor HWM (a later day succeeded and advanced it), so
    # the gap/cursor planner alone would never revisit them.
    critical = {
        r["start"]
        for r in st.critical_ranges
        if start <= r["start"] <= end
    }
    plan = sorted(set(plan) | critical)

    report = BackfillReport()
    for day in plan:
        end_of_day_ms = int(
            (dt.datetime.fromisoformat(day).replace(tzinfo=dt.timezone.utc)
             + dt.timedelta(days=1)).timestamp() * 1000
        ) - 1
        if end_of_day_ms <= st.cursor and day not in critical:
            continue  # already covered by the HWM (backfill_service.rs:179-181)
        try:
            ticks = fetch_day(spark, symbol, day)
            # fence IMMEDIATELY before the data-plane write (heartbeat is
            # a fenced mutation): a zombie that stalled inside fetch_day
            # past the takeover threshold dies here instead of
            # overwriting the takeover's partitions with stale data
            control.heartbeat(key, instance, now=now)
            n, max_ts = ingest_batch(ticks, data_dir)
            if max_ts is not None:
                control.update_cursor(key, instance, max_ts // 1000)
            if day in critical:
                control.remove_critical_range(key, instance, day, day)
            st = control.get(key)
            report.days_processed += 1
            report.total_ticks += n
        except (StaleInstanceError, ControlTableCorruptError):
            # fencing/infrastructure errors are NOT per-day data failures:
            # recording them re-enters the fenced path with the same stale
            # id and aborts the loop mid-handler (r10 review finding) —
            # propagate instead; a fenced-out zombie must write nothing
            raise
        except Exception as e:  # per-day failures collected, not fatal
            report.failed_days.append(day)
            control.add_critical_range(key, instance, day, day)
            control.update_status(key, instance, st.status, error_type=type(e).__name__)
    final = COMPLETED if not report.failed_days else FAILED
    # preserve the last per-day error type on a FAILED final status —
    # update_status overwrites it, and a FAILED record with a null error
    # type is useless to the operator triaging it
    last_err = control.get(key).last_error_type if report.failed_days else None
    control.update_status(key, instance, final, error_type=last_err)
    return report
