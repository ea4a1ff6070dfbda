"""Watermark-aware join-completeness audit (operators/joinaudit.py):
exact row classification, a DuckDB oracle on the fixtures, empty-right
semantics, the bucketed report, and the documented foreachBatch form."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from aetherium_trader_datapipeline_spark.operators.joinaudit import (
    join_completeness,
    join_completeness_report,
)
from tests.conftest import SF_DIR
from tests.oracle import duckdb_run


def _mk(spark, rows, schema="k bigint, t timestamp"):
    return spark.createDataFrame(rows, schema)


def _ts(s):
    return datetime.fromisoformat(s)


def test_classification_exact(spark):
    left = _mk(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00")),  # matched
            (2, _ts("2024-01-01 10:30:00")),  # unmatched, old -> final
            (3, _ts("2024-01-01 11:55:00")),  # unmatched, young -> pending
            (4, _ts("2024-01-01 09:00:00")),  # matched (late left, still matched)
        ],
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 10:05:00")),
            (4, _ts("2024-01-01 12:00:00")),  # max right ts
        ],
    )
    # frontier = 12:00 - 1h = 11:00
    out = {
        r.k: r.join_status
        for r in join_completeness(left, right, ["k"], "t", "t", "1 hour").collect()
    }
    assert out == {
        1: "matched",
        2: "unmatched_final",
        3: "pending",
        4: "matched",
    }


def test_empty_right_all_pending(spark):
    left = _mk(spark, [(1, _ts("2024-01-01 10:00:00"))])
    right = _mk(spark, [], "k bigint, t timestamp")
    out = join_completeness(left, right, ["k"], "t", "t", "1 hour").collect()
    assert [r.join_status for r in out] == ["pending"]
    rep = join_completeness_report(
        left, right, ["k"], "t", "t", "1 hour"
    ).head()
    assert rep.n_pending == 1 and rep.completeness is None


def test_fixture_audit_matches_duckdb(spark, tables):
    """events (left) vs the high-value events as an 'ack' stream keyed by
    event_id, 1-day watermark — status counts match the oracle SQL that
    spells the same semantics."""
    ev = tables["events"]
    acks = ev.where(F.col("value") > 100.0).select("event_id", "ts")
    got = {
        r.join_status: r.n
        for r in join_completeness(
            ev, acks, ["event_id"], "ts", "ts", "1 day"
        )
        .groupBy("join_status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    _, rows = duckdb_run(
        """
        WITH r AS (SELECT DISTINCT event_id FROM events WHERE value > 100.0),
             f AS (SELECT MAX(ts) - INTERVAL 1 DAY AS fr FROM events WHERE value > 100.0)
        SELECT CASE WHEN r.event_id IS NOT NULL THEN 'matched'
                    WHEN e.ts <= f.fr THEN 'unmatched_final'
                    ELSE 'pending' END st, COUNT(*) n
        FROM events e LEFT JOIN r USING (event_id) CROSS JOIN f
        GROUP BY 1
        """,
        SF_DIR,
    )
    assert got == {st: n for st, n in rows}
    assert got.get("matched") and got.get("unmatched_final")


def test_report_by_day_and_completeness(spark, tables):
    ev = tables["events"].withColumn("d", F.to_date("ts"))
    acks = ev.where(F.col("value") > 100.0).select("event_id", "ts")
    rep = join_completeness_report(
        ev, acks, ["event_id"], "ts", "ts", "1 day", by=["d"]
    ).collect()
    assert len(rep) == ev.select("d").distinct().count()
    for r in rep:
        assert r.n_left == r.n_matched + r.n_unmatched_final + r.n_pending
        if r.n_matched + r.n_unmatched_final:
            assert abs(
                r.completeness
                - r.n_matched / (r.n_matched + r.n_unmatched_final)
            ) < 1e-12


def test_foreachbatch_form_equals_batch(spark, tables, tmp_path):
    """The documented production shape: the same kernel inside
    foreachBatch with an explicit frontier classifies exactly as the
    one-shot batch audit."""
    ev = tables["events"].select("event_id", "user_id", "ts", "value")
    acks = ev.where(F.col("value") > 100.0).select("event_id", "ts")
    frontier = acks.agg(
        (F.max("ts") - F.expr("INTERVAL 1 DAY")).alias("f")
    ).head()["f"]
    expected = {
        r.event_id: r.join_status
        for r in join_completeness(
            ev, acks, ["event_id"], "ts", "ts", "1 day", frontier=frontier
        ).collect()
    }

    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    sink: dict[int, str] = {}

    def audit_batch(batch, _bid):
        for r in join_completeness(
            batch, acks, ["event_id"], "ts", "ts", "1 day", frontier=frontier
        ).collect():
            sink[r.event_id] = r.join_status

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(audit_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert sink == expected
