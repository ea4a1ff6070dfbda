"""Custom stateful streaming operator: live sequential test (Wald SPRT).

Streaming form of x491 — per key, the integer log-likelihood-ratio walk
carries across micro-batches and the DECISION row (key, step index,
decision, final LLR) is emitted exactly once, at the micro-batch where
the walk first crosses a boundary.  After deciding, the key's state is
latched and later events are ignored — the sequential test's "stop
sampling" semantics, which a batch recomputation cannot express.

The fold is the shared integer ``sprt_step`` kernel
(operators/timeseries.py): increments and boundaries are 1e9-quantized
BIGINTs fixed at operator construction, so the stream, the batch SQL
key, and a plain sequential replay agree bit-for-bit.

State per key: three int64s (llr, steps, decided) — O(1), the
reference's per-key admission-state shape (limiter.rs:130-192) applied
to sequential inference.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from aetherium_trader_datapipeline_spark.operators.timeseries import sprt_step

_STATE_SCHEMA = StructType(
    [
        StructField("llr_fp", LongType()),
        StructField("steps", LongType()),
        StructField("decided", LongType()),
    ]
)


def stateful_sprt(
    stream: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    hit_col: str,
    inc_hit: int,
    inc_miss: int,
    a_fp: int,
    b_fp: int,
) -> DataFrame:
    """One shuffle on ``key_cols``; emits ONE decision row per key
    (append mode) at the step where the LLR walk first crosses a
    boundary."""

    out_schema = StructType(
        [stream.schema[c] for c in key_cols]
        + [
            StructField("decided_at_step", LongType()),
            StructField("decision", StringType()),
            StructField("final_llr_fp", LongType()),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            llr, steps, decided = state.get
        else:
            llr, steps, decided = 0, 0, 0
        rows = []
        if not decided:
            chunks = [c for c in pdfs if len(c)]
            if chunks:
                pdf = pd.concat(chunks).sort_values(order_cols)
                for hit in pdf[hit_col].tolist():
                    steps += 1
                    llr, decision = sprt_step(
                        llr, bool(hit), inc_hit, inc_miss, a_fp, b_fp
                    )
                    if decision is not None:
                        decided = 1
                        rows.append(key + (steps, decision, llr))
                        break
        state.update((llr, steps, decided))
        if rows:
            yield pd.DataFrame(rows, columns=[c.name for c in out_schema])

    return (
        stream.groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
