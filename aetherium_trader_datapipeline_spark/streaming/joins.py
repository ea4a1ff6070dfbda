"""Stream-stream joins with watermark-bounded state.

The reference's pipelines never join two live streams, but its documented
OLAP layer (K-bar + tick replay) implies enrichment patterns — e.g. "for
each trade/click, attach the quotes/views seen in the preceding N
minutes". In Spark this is the watermarked interval join: both sides
declare watermarks, the join condition carries a time range, and the state
store keeps only rows inside the watermark horizon — bounded state, the
only formulation that survives unbounded streams at scale.

Batch DataFrames run through the identical code path (watermarks are
no-ops in batch), which is how the tests verify stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_enrich(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    lookback: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Join each left row to right rows with the same key whose timestamp
    falls in ``(left.ts - lookback, left.ts]``.

    One shuffle per side on ``key_cols``; streaming state is bounded by
    ``watermark + lookback`` per key. Right columns are suffixed.
    """
    lw = left.withWatermark(ts_col, watermark) if left.isStreaming else left
    rw = right.withWatermark(ts_col, watermark) if right.isStreaming else right
    rw = rw.select([F.col(c).alias(f"{c}{right_suffix}") for c in rw.columns])

    conds = [F.col(k) == F.col(f"{k}{right_suffix}") for k in key_cols]
    rts = F.col(f"{ts_col}{right_suffix}")
    lts = F.col(ts_col)
    conds.append(rts <= lts)
    conds.append(rts > lts - F.expr(f"INTERVAL {lookback}"))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return lw.join(rw, cond, how)


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a live stream with a dimension table.

    The dim side is broadcast-hinted — stream-static joins are stateless
    (each micro-batch joins against the current dim snapshot), and a
    broadcast keeps the stream side shuffle-free, which is the only plan
    that holds up when the stream is 1000-executor wide and the dim is a
    few MB. No watermark needed: no state accumulates.
    """
    return stream.join(F.broadcast(dim), on=on, how=how)
