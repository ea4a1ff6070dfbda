"""End-to-end platform loop: ingest → outage hole → gap detection →
cursor-aware backfill → verified completeness.

This is the reference's full operational story (ingest binary + gap
detector + backfill binary + verify binary, bin/src/*) run as one flow
against a temp store."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def test_ingest_outage_gap_backfill_verify(spark):
    from aetherium_trader_datapipeline_spark.operators.gaps import detect_gaps
    from aetherium_trader_datapipeline_spark.operators.inspect import inspect_parquet
    from aetherium_trader_datapipeline_spark.plans.backfill_service import (
        backfill_range,
        existing_dates,
    )
    from aetherium_trader_datapipeline_spark.plans.control_table import (
        ControlTable,
        job_key,
    )
    from aetherium_trader_datapipeline_spark.sources.ticks import historical_ticks
    from aetherium_trader_datapipeline_spark.streaming.ingest import ingest_batch

    base = tempfile.mkdtemp(prefix="e2e-")
    data, ctl = f"{base}/data", f"{base}/ctl"

    # 1. normal ingestion lands three days
    for day in ("2025-12-01", "2025-12-02", "2025-12-03"):
        ingest_batch(historical_ticks(spark, "NQ", day), data)
    assert inspect_parquet(spark, data)["num_rows"] == 3 * 1440

    # 2. outage: day 2 vanishes from the store
    shutil.rmtree(f"{data}/symbol=NQ/date=2025-12-02")

    # 3. gap detection sees exactly that day
    present = existing_dates(spark, data, "NQ")
    gaps = detect_gaps(present, "2025-12-01", "2025-12-03").collect()
    assert [(str(g.gap_start), str(g.gap_end)) for g in gaps] == [
        ("2025-12-02", "2025-12-02")
    ]

    # 4. backfill fills the hole (and only the hole: cursor at day start,
    # planner unions resume day + gap days, HWM skip leaves days 1/3 alone)
    control = ControlTable(ctl)
    report = backfill_range(
        spark,
        control,
        lambda s, sym, d: historical_ticks(s, sym, d),
        data,
        "NQ",
        "2025-12-01",
        "2025-12-03",
    )
    assert report.failed_days == []
    assert report.days_processed >= 1

    # 5. store is whole again; no duplicate rows on the untouched days
    assert (
        detect_gaps(existing_dates(spark, data, "NQ"), "2025-12-01", "2025-12-03")
        .count()
        == 0
    )
    per_day = (
        spark.read.parquet(data)
        .groupBy("date")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {str(r.date): r.n for r in per_day} == {
        "2025-12-01": 1440,
        "2025-12-02": 1440,
        "2025-12-03": 1440,
    }

    # 6. control table: COMPLETED, cursor advanced to the processed range
    st = control.get(job_key("NQ", "2025-12-01"))
    assert st.status == "COMPLETED"
    assert st.cursor > 0
