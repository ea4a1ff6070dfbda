"""Twenty-fifth extension wave — the last two Python execution tiers.

With these, the Q38 UDF surface covers EVERY Python tier Spark 4
offers: row udf (x40), Arrow-optimized udf (x155), pandas_udf scalar
(x41), pandas_udf scalar-iterator (x180 — amortizes per-batch setup,
the tier used when a model/tokenizer must be loaded once per worker),
pandas UDAF (x56), applyInPandas (x77/x138), mapInPandas (x142/x173),
mapInArrow (x179 — zero-copy RecordBatch access, the tier below pandas
when conversion overhead matters), cogrouped pandas (operators/asof.py),
applyInPandasWithState (x63/x171 kernels), transformWithStateInPandas
(streaming/sessionizer.py), and UDTF (x174). Both new tiers compute
SQL-replayable arithmetic so the full path hash-verifies.
"""

# NOTE: no `from __future__ import annotations` here — pyspark's pandas_udf
# type-hint inference resolves the SCALAR_ITER signature via
# typing.get_type_hints against module globals, so the Iterator/Tuple/pd
# names must be importable at module scope and annotations must not be
# stringified by PEP 563.
from typing import Iterator, Tuple  # noqa: UP035

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x179: mapInArrow (RecordBatch-level Python) ----------------------------

_X179_ORACLE = """
    SELECT doc_id,
           CAST(n_chars * 2 + length(lang) AS BIGINT) AS feat
    FROM documents ORDER BY doc_id LIMIT 300
"""


@register("x179_map_in_arrow", oracle=_X179_ORACLE, tags=("udf", "arrow"))
def x179_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    t = load_tables(spark, sf_dir)

    def fn(batches):  # Iterator[pa.RecordBatch] -> Iterator[pa.RecordBatch]
        import pyarrow.compute as pc

        for b in batches:
            feat = pc.add(
                pc.multiply(b.column("n_chars"), pa.scalar(2, pa.int64())),
                pc.utf8_length(b.column("lang")).cast(pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), feat], names=["doc_id", "feat"]
            )

    out = t["documents"].select("doc_id", "n_chars", "lang").mapInArrow(
        fn, "doc_id BIGINT, feat BIGINT"
    )
    return out.orderBy("doc_id").limit(300)


# -- x180: pandas_udf scalar-iterator tier ----------------------------------

_X180_ORACLE = """
    SELECT doc_id,
           ROUND(CAST(n_chars AS DOUBLE) / (7.0 + length(source)), 4) AS ratio
    FROM documents ORDER BY doc_id LIMIT 300
"""


@register("x180_pandas_iter_udf", oracle=_X180_ORACLE, tags=("udf", "pandas"))
def x180_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # per-worker setup happens ONCE here (the tier's reason to exist:
        # tokenizer/model load amortized across batches), then each batch
        # streams through
        offset = 7.0
        for n_chars, source in it:
            yield n_chars.astype("float64") / (offset + source.str.len())

    t = load_tables(spark, sf_dir)
    out = t["documents"].select(
        "doc_id", F.round(ratio("n_chars", "source"), 4).alias("ratio")
    )
    return out.orderBy("doc_id").limit(300)
