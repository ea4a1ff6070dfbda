"""Streaming per-key cursor (high-water mark) as a custom stateful operator.

The reference advances a per-job cursor to the last persisted tick's
timestamp after every batch (backfill_service.rs:191-196, CAS-guarded in
state/redis.rs:184-236). This operator is that semantic as a Structured
Streaming stateful operator: per key, keep the max event time seen so far
in GroupState and EMIT ONLY WHEN IT ADVANCES — the control plane observes
a monotone stream of (key, cursor) rows instead of polling storage.

Built on ``applyInPandasWithState`` (Spark 4.1 also offers
``transformWithStateInPandas``, but its driver worker needs protobuf,
which this environment does not ship; GroupState carries the identical
semantics). State is one long per key — bounded, checkpointed, and
instance-fenced by the query's checkpoint ownership, the Spark-native form
of the reference's Z1 zombie fencing.
"""

from __future__ import annotations

# tws (transformWithStateInPandas) serializes state over the protobuf wire
# format; in environments without the google.protobuf runtime the vendored
# pure-Python shim must be on sys.path/PYTHONPATH BEFORE the SparkSession
# is built (workers inherit PYTHONPATH through the JVM).  Importing this
# module early is enough; activate() is a no-op when real protobuf exists.
from aetherium_trader_datapipeline_spark._vendor import protoshim as _protoshim

_protoshim.activate()

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

CURSOR_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("cursor_us", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("cursor_us", LongType())])


def cursor_updates(stream: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """(key, cursor_us) rows, one per key per micro-batch in which the
    key's max event time advanced. Epoch-µs longs keep state width fixed."""
    prepared = stream.select(
        F.col(key_col).cast("long").alias("key"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mx = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["ts_us"].max())
                mx = m if mx is None else max(mx, m)
        prev = state.get[0] if state.exists else None
        if mx is not None and (prev is None or mx > prev):
            state.update((mx,))
            yield pd.DataFrame({"key": [key[0]], "cursor_us": [mx]})

    return prepared.groupBy("key").applyInPandasWithState(
        fn, CURSOR_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
