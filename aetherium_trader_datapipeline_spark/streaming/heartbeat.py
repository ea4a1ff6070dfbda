"""Streaming heartbeat (op H1 under Structured Streaming).

Reference: the worker updates heartbeat_at before each unit of work
(backfill_service.rs:183-185); a supervisor marks jobs stalled past the
threshold. Under Structured Streaming the natural heartbeat cadence is
micro-batch progress: a StreamingQueryListener beats the control table on
every progress event, so a hung query stops beating and the stalled scan
(`ControlTable.stalled_jobs`) surfaces it — same externally visible
semantics, zero user code in the data path."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

from aetherium_trader_datapipeline_spark.plans.control_table import ControlTable


class HeartbeatListener(StreamingQueryListener):
    """Beats ``control[key]`` on every micro-batch progress event of the
    query with ``query_id`` (or all queries if None)."""

    def __init__(self, control: ControlTable, key: str, instance_id: str,
                 query_id: str | None = None):
        self.control = control
        self.key = key
        self.instance_id = instance_id
        self.query_id = query_id
        self.beats = 0

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        if self.query_id is None or str(event.progress.id) == self.query_id:
            try:
                self.control.heartbeat(self.key, self.instance_id)
                self.beats += 1
            except Exception:
                # a fenced-out (stale) instance must not crash the listener
                pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
