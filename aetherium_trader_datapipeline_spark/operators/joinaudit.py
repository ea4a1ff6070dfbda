"""Watermark-aware join-completeness audit.

A stream-stream (or fact-to-late-dim) join under a watermark silently
drops left rows whose match never arrives inside the delay horizon —
Structured Streaming emits no tombstone for them.  This operator answers,
from data at rest, "how complete is the join, and is any missing match
still allowed to arrive?":

- ``matched``          — a right row with the key exists.
- ``unmatched_final``  — no match AND the left event time is at or before
  the frontier ``max(right event time) - delay``: under the watermark
  contract a matching right row can no longer be accepted, so the miss is
  permanent (this is exactly the population a streaming outer join would
  have emitted with NULLs / dropped).
- ``pending``          — no match but the left row is newer than the
  frontier; the match may still arrive.

The reference's gap detector (detectors/gap.rs) plays this role for its
single tick stream — "which expected partitions never arrived"; this is
the two-stream generalization.

Scale shape: one scalar aggregate on the right (the frontier — footer-
backed max for parquet), one DISTINCT key projection of the right
(map-side partial), one shuffle LEFT join; no windows.  AQE broadcasts
the key set when small.  In production the same kernel runs inside
``foreachBatch`` with ``frontier`` passed from the query's watermark
(``query.lastProgress["eventTime"]["watermark"]``) instead of the
rescan.  With an EMPTY right side the frontier is NULL and every left
row is ``pending`` — no evidence has arrived that anything is late, so
nothing may be declared finally unmatched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_COL = "join_status"


def join_completeness(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    delay: str,
    frontier=None,
) -> DataFrame:
    """Append ``join_status`` (matched / unmatched_final / pending) to
    every left row.  ``delay`` is a SQL interval body, e.g. ``'1 day'``
    or ``'15 minutes'``; ``frontier`` (a timestamp) overrides the
    ``max(right_time) - delay`` scan when the caller already knows the
    watermark."""
    if frontier is None:
        frontier = (
            right.agg(
                (F.max(right_time) - F.expr(f"INTERVAL {delay}")).alias("f")
            ).head()["f"]
        )
    keys = right.select(*on).distinct().withColumn("__matched", F.lit(True))
    return (
        left.join(keys, on, "left")
        .withColumn(
            STATUS_COL,
            F.when(F.col("__matched"), F.lit("matched"))
            .when(
                F.col(left_time) <= F.lit(frontier), F.lit("unmatched_final")
            )
            .otherwise(F.lit("pending")),
        )
        .drop("__matched")
    )


def join_completeness_report(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    delay: str,
    by: list[str] | None = None,
    frontier=None,
) -> DataFrame:
    """Aggregate the audit to counts — one row (or one per ``by`` group,
    e.g. per day for a lateness trend): n_left, n_matched,
    n_unmatched_final, n_pending, completeness (matched / final-decided
    rows; NULL until anything is final)."""
    flagged = join_completeness(
        left, right, on, left_time, right_time, delay, frontier
    )
    decided = F.col("n_matched") + F.col("n_unmatched_final")
    aggs = [
        F.count(F.lit(1)).alias("n_left"),
        *[
            F.coalesce(
                F.sum(F.when(F.col(STATUS_COL) == s, 1)), F.lit(0)
            ).alias(f"n_{s}")
            for s in ("matched", "unmatched_final", "pending")
        ],
    ]
    out = flagged.groupBy(*by).agg(*aggs) if by else flagged.agg(*aggs)
    return out.withColumn(
        "completeness",
        F.when(
            decided > 0, F.col("n_matched").cast("double") / decided
        ),
    )
