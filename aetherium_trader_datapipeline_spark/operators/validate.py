"""Row validation (op V1) — the reference's domain constraints as filters.

Reference: Tick::new rejects empty symbol and non-positive prices
(domain/src/tick.rs:27-49). Spark-first: validation is a predicate; valid
rows flow on, invalid rows route to a quarantine sink — no per-row
exceptions, the predicate stays inside codegen.

The same contract is also exposed through the Python-UDF surface (plain
UDF, Arrow-batched pandas_udf) to cover op Q38; the built-in-expression
form is the production path, the UDFs exist to verify UDF plumbing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, DoubleType


TICK_SCHEMA_DDL = (
    "timestamp TIMESTAMP, symbol STRING, bid_price DECIMAL(10,4), bid_size INT, "
    "ask_price DECIMAL(10,4), ask_size INT, last_price DECIMAL(10,4), last_size INT"
)


def tick_valid_expr(
    symbol_col: str = "symbol",
    price_cols: tuple[str, ...] = ("bid_price", "ask_price", "last_price"),
) -> Column:
    cond = (F.col(symbol_col).isNotNull()) & (F.trim(F.col(symbol_col)) != "")
    for c in price_cols:
        cond = cond & F.col(c).isNotNull() & (F.col(c) > 0)
    return cond


def validate_ticks(
    df: DataFrame,
    symbol_col: str = "symbol",
    price_cols: tuple[str, ...] = ("bid_price", "ask_price", "last_price"),
) -> tuple[DataFrame, DataFrame]:
    """Returns (valid, quarantine) DataFrames."""
    cond = tick_valid_expr(symbol_col, price_cols)
    return df.where(cond), df.where(~cond)


# DataType OBJECTS, not DDL strings: a string return type is parsed
# through the active SparkContext at DECORATION time, which made
# importing this module crash in any process that had not built its
# session yet — every standalone CLI invocation (r10; pytest never
# saw it because conftest creates the session first)
@pandas_udf(BooleanType())
def tick_valid_pandas(symbol: pd.Series, price: pd.Series) -> pd.Series:
    """Arrow-batched validation kernel (Q38 UDF surface): same contract as
    tick_valid_expr for a single price column."""
    return symbol.notna() & (symbol.str.strip() != "") & price.notna() & (price > 0)


@pandas_udf(DoubleType())
def sum_of_squares(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF (Q38 UDAF surface): Σ v² per group."""
    return float((v * v).sum())


def demean_by_group(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str = "dvalue"
) -> DataFrame:
    """Grouped normalization via applyInPandas (Q38/Q39 surface): subtract
    the per-group mean. Production code would use a window AVG (built-in);
    this exists to exercise the grouped-pandas path with an SQL oracle."""
    schema_df = df.withColumn(out_col, F.col(value_col).cast("double"))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # exact-deterministic mean: 1e6-quantized integer sum, then two
        # divisions in a fixed order — pandas' .mean() (pairwise numpy
        # summation) differed from the oracle's sequential AVG in the
        # last ulp and flipped a ROUND boundary at sf0.1 (r7)
        q = np.floor(pdf[value_col].to_numpy(dtype="float64") * 1e6)
        n = int(np.count_nonzero(~np.isnan(q)))
        mean = (np.nansum(q) / n / 1e6) if n else float("nan")
        # half-up integer rounding, not .round(4): pandas rounds
        # half-even while DuckDB's ROUND rounds half away from zero —
        # the synthetic values land exactly on .xxxx5 (r7 sweep)
        pdf[out_col] = np.floor((pdf[value_col] - mean) * 1e4 + 0.5) / 1e4
        return pdf

    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema_df.schema)
