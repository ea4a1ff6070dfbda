"""aetherium_trader_datapipeline_spark — a PySpark-native analytics/ETL engine.

A brand-new Spark-first engine reproducing the query and data-processing
capabilities of the reference market-data ingestion platform (see SURVEY.md):
relational query surface (Spark SQL / DataFrame via Catalyst), time-series
operators (OHLCV, as-of join, gap detection, sessionization), ingestion
pipelines (Structured Streaming with hourly-partitioned parquet sinks,
control-table job state with instance fencing), and large-scale
training-data operations (dedup, similarity search, text analysis,
multimodal column plumbing).

Design point: a 1000-executor cluster over ~100 TB. Everything is declared
through the DataFrame/SQL API so Catalyst handles pushdown, pruning, join
strategy, partial aggregation, and AQE; Python appears only in Arrow-batched
Pandas UDFs where built-ins genuinely can't express the semantics.
"""

from aetherium_trader_datapipeline_spark.session import get_spark
from aetherium_trader_datapipeline_spark.tables import TABLE_NAMES, load_tables

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
