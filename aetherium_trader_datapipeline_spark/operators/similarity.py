"""Similarity search over embedding columns (array<float>).

- ``pairwise_cosine_topk``: exact brute force — the correctness baseline.
  O(n²) pairs; fine for verification SFs, NOT the 100 TB path.
- ``ann_lsh_topk``: the scale path — random-hyperplane LSH (SimHash for
  cosine) buckets vectors so only same-bucket pairs are scored. Recall is
  tunable via (n_planes, n_tables); verified against the exact baseline in
  tests by recall threshold, not hash equality.

All vector math stays JVM-side: `zip_with` for elementwise product,
`aggregate` for the sequential fold (deterministic summation order — the
DuckDB oracle folds in the same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    e = F.col(vec_col).cast("array<double>")
    sq_sum = F.aggregate(
        F.zip_with(e, e, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return df.select(F.col(id_col), e.alias("e"), F.sqrt(sq_sum).alias("nrm"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def pairwise_cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, k: int = 20, round_digits: int = 4
) -> DataFrame:
    """Exact top-k most-similar pairs by cosine. Output (a, b, sim)."""
    v = _with_norm(df, id_col, vec_col)
    a = v.select(F.col(id_col).alias("a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = v.select(F.col(id_col).alias("b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    sim = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), round_digits)
    return (
        pairs.select("a", "b", sim.alias("sim"))
        .orderBy(F.desc("sim"), "a", "b")
        .limit(k)
    )


def cosine_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9, round_digits: int = 4
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection)."""
    v = _with_norm(df, id_col, vec_col)
    a = v.select(F.col(id_col).alias("a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = v.select(F.col(id_col).alias("b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    sim = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), round_digits)
    return (
        pairs.select("a", "b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
        .orderBy(F.desc("sim"), "a", "b")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (pure python so the
    plan is reproducible across runs/engines; no numpy RNG state)."""
    import hashlib
    import struct

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()[:8]
            (u,) = struct.unpack(">q", h)
            row.append((u / 2**63))  # uniform-ish in [-1, 1)
        planes.append(row)
    return planes


def lsh_signature(df: DataFrame, vec_col: str, dim: int, n_planes: int = 16, seed: int = 42):
    """Random-hyperplane signature as a packed BIGINT column `sig`."""
    planes = _hyperplanes(dim, n_planes, seed)
    e = F.col(vec_col).cast("array<double>")
    bits = []
    for i, plane in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in plane])
        dot = _dot(e, pl)
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn("sig", sig.cast("long"))


def ann_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """Candidate pairs from any of ``n_tables`` LSH tables, scored exactly.

    Plan: per table, shuffle on the (table, signature) bucket — same-bucket
    join only. At 100 TB the bucket join replaces the quadratic cross join;
    skewed buckets are split by AQE.
    """
    v = _with_norm(df, id_col, vec_col)
    candidates = None
    for t in range(n_tables):
        sig = lsh_signature(v, "e", dim, n_planes, seed=1000 + t).select(
            F.col(id_col), F.col("sig"), F.lit(t).alias("tbl")
        )
        a = sig.select(F.col(id_col).alias("a"), "sig", "tbl")
        b = sig.select(F.col(id_col).alias("b"), "sig", "tbl")
        cand = a.join(b, ["sig", "tbl"]).where(F.col("a") < F.col("b")).select("a", "b")
        candidates = cand if candidates is None else candidates.unionByName(cand)
    candidates = candidates.distinct()
    av = v.select(F.col(id_col).alias("a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    bv = v.select(F.col(id_col).alias("b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    scored = candidates.join(av, "a").join(bv, "b")
    sim = F.round(_dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), round_digits)
    return scored.select("a", "b", sim.alias("sim"))


def ann_lsh_topk(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int = 20, **kw
) -> DataFrame:
    return ann_lsh_pairs(df, id_col, vec_col, dim, **kw).orderBy(
        F.desc("sim"), "a", "b"
    ).limit(k)
