"""Public expression helpers (column functions) — the engine's dialect
surface. All JVM-side built-ins; no Python in the row path."""

from aetherium_trader_datapipeline_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = ["dot", "l2_norm", "cosine_similarity"]
