"""Custom Spark Python Data Source for synthetic ticks.

The reference abstracts market data behind gateway ports
(`application/src/ports.rs:17`, `historical_data.rs:7-15`) with mock
implementations (`gateways/market_data.rs:56-78`, `historical.rs:49-76`).
Spark 4's Python Data Source API is the idiomatic counterpart: the
gateway becomes a registered source usable as
``spark.read.format("aetherium_ticks")`` / ``spark.readStream.format(...)``
— planning on the driver, row generation on executors, one input
partition per day (the reference's fetch unit, `backfill_service.rs:177`).

Generation matches `sources/ticks.py` exactly (price = base + epoch_sec
% 100, 0.25 spread, sizes 10/15/5, 1 tick/minute — `historical.rs:19-44`),
so DataFrame-level tests can assert the two sources produce identical
rows. The streaming reader's offset is a absolute minute index, giving
replayable, deterministic micro-batches (the reference's cursor concept,
`job_state.rs:42`, as a streaming offset).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from aetherium_trader_datapipeline_spark.sources.ticks import (
    BASE_PRICE,
    SPREAD,
    TICKS_PER_DAY,
)

TICK_SCHEMA = StructType(
    [
        StructField("timestamp", TimestampType(), False),
        StructField("symbol", StringType(), False),
        StructField("bid_price", DecimalType(10, 4), False),
        StructField("bid_size", IntegerType(), False),
        StructField("ask_price", DecimalType(10, 4), False),
        StructField("ask_size", IntegerType(), False),
        StructField("last_price", DecimalType(10, 4), False),
        StructField("last_size", IntegerType(), False),
    ]
)

_EPOCH = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)


def _tick_row(minute_index: int, symbol: str) -> tuple:
    """Deterministic tick for an absolute minute-since-epoch index —
    the same formula `sources/ticks.py` evaluates JVM-side."""
    ts = _EPOCH + dt.timedelta(minutes=minute_index)
    epoch_s = minute_index * 60
    bid = Decimal(f"{BASE_PRICE + (epoch_s % 100):.4f}")
    ask = Decimal(f"{BASE_PRICE + SPREAD + (epoch_s % 100):.4f}")
    return (ts.replace(tzinfo=None), symbol, bid, 10, ask, 15, bid, 5)


class _DayPartition(InputPartition):
    def __init__(self, day_start_minute: int):
        self.day_start_minute = day_start_minute


class _TickBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbol = options.get("symbol", "NQ")
        self.start = dt.date.fromisoformat(options["start"])
        self.end = dt.date.fromisoformat(options.get("end", options["start"]))

    def partitions(self):
        days = (self.end - self.start).days + 1
        first = (self.start - _EPOCH.date()).days * TICKS_PER_DAY
        return [_DayPartition(first + i * TICKS_PER_DAY) for i in range(days)]

    def read(self, partition: _DayPartition):
        for m in range(partition.day_start_minute, partition.day_start_minute + TICKS_PER_DAY):
            yield _tick_row(m, self.symbol)


class _TickStreamReader(SimpleDataSourceStreamReader):
    """Offset = next absolute minute index to emit; each micro-batch
    carries ``ticksPerBatch`` rows. Deterministic given the offset, so a
    restarted query replays identical batches from its checkpoint."""

    def __init__(self, options: dict):
        self.symbol = options.get("symbol", "NQ")
        start = dt.date.fromisoformat(options.get("start", "2024-01-01"))
        self.per_batch = int(options.get("ticksPerBatch", "60"))
        self.start_minute = (start - _EPOCH.date()).days * TICKS_PER_DAY

    def initialOffset(self) -> dict:
        return {"minute": self.start_minute}

    def read(self, start: dict):
        lo = start["minute"]
        hi = lo + self.per_batch
        rows = [_tick_row(m, self.symbol) for m in range(lo, hi)]
        return iter(rows), {"minute": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            _tick_row(m, self.symbol) for m in range(start["minute"], end["minute"])
        )


class AetheriumTickDataSource(DataSource):
    """``spark.dataSource.register(AetheriumTickDataSource)`` then
    ``spark.read.format("aetherium_ticks")`` with options:

    - ``symbol`` (default NQ)
    - ``start`` / ``end``: ISO dates (batch: inclusive day range, one
      input partition per day; stream: replay start)
    - ``ticksPerBatch``: stream micro-batch size (default 60)
    """

    @classmethod
    def name(cls) -> str:
        return "aetherium_ticks"

    def schema(self):
        return TICK_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _TickBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _TickStreamReader(self.options)
