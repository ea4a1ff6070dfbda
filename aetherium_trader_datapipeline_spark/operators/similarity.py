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

import math

import pandas as pd
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


def _floored_block_count(df: DataFrame, n: int, block_size: int) -> int:
    """Block count for the triangle all-pairs kernels: max(memory bound,
    PARALLELISM FLOOR), capped at n.

    The memory bound alone (ceil(n / block_size)) degenerates at
    small-to-mid n: few blocks → few applyInPandas groups → a stage of a
    handful of single-core GEMM tasks (workers run
    OPENBLAS_NUM_THREADS=1 by design) that tracks the host's PER-CORE
    speed instead of the cluster's parallelism — the measured r7/r8
    x307 and r9 q35 bench anomalies (BASELINE.md).  The floor sizes B so
    the triangle offers >= 2x defaultParallelism tasks; total GEMM flops
    are invariant in B (each block pair is computed exactly once), so
    extra blocks cost only O(B) = O(sqrt(cores)) row replication.  At
    production n the memory bound dominates and nothing changes: n=1M,
    block_size=2048 → B=489 >> the floor of 11 on 32 cores.
    """
    par = max(1, df.sparkSession.sparkContext.defaultParallelism)
    b_mem = max(1, -(-n // block_size))
    # smallest B with B(B+1)/2 >= 2*par  (exact integer form)
    b_par = int(math.ceil((math.sqrt(16.0 * par + 1.0) - 1.0) / 2.0))
    return min(max(b_mem, b_par), max(n, 1))


def _block_pair_sims(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_blocks: int | None = None,
    block_size: int = 2048,
    k_local: int | None = None,
    threshold: float | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """All-pairs cosine via blocked matrix multiply (Arrow + numpy).

    The scalable all-pairs scheme: hash ids into B blocks; each row is
    replicated to every block-pair group (ga <= gb) its block belongs to
    (the classic triangle-replication all-pairs layout), and
    ``applyInPandas`` runs one dense matmul per group → B(B+1)/2
    independent tasks the scheduler spreads over a cluster. Per-task
    memory is bounded at 2·block_size·dim doubles. Per block pair we emit
    only the local top-k (any global top-k pair lives in exactly one
    block pair, so the union of local top-k contains the global top-k)
    or threshold survivors.

    Data stays in flat Arrow columns (id:int64, e:list<double>) end to
    end — packing whole blocks into one ``collect_list(struct(...))``
    cell serializes 10-100× slower through Arrow→pandas than the same
    bytes as ordinary rows.
    """
    if (k_local is None) == (threshold is None):
        raise ValueError("exactly one of k_local / threshold required")

    n = df.count()
    if n_blocks is None:
        # q35's r9 bench anomaly: 2,000 rows < block_size 2048 gave B=1 →
        # ONE single-core GEMM task (BENCH_r09 2.25 s vs 0.687 s anchor).
        n_blocks = _floored_block_count(df, n, block_size)

    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("e")
    ).withColumn("blk", F.pmod(F.hash("id"), F.lit(n_blocks)))

    # Row with block b participates in groups {(i,b): i<=b} ∪ {(b,j): j>=b}.
    ga = F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("ga")
    rep_a = v.select("id", "e", "blk", ga).withColumn("gb", F.col("blk"))
    gb = F.explode(F.sequence(F.col("blk") + 1, F.lit(n_blocks - 1))).alias("gb")
    rep_b = (
        v.where(F.col("blk") < n_blocks - 1)
        .select("id", "e", "blk", gb)
        .withColumn("ga", F.col("blk"))
    )
    rep = rep_a.unionByName(rep_b)

    kl, thr, rd = k_local, threshold, round_digits

    def score(key, pdf):
        import numpy as np
        import pandas as pd

        ga_k, gb_k = key
        ids = pdf["id"].to_numpy()
        m = np.stack(pdf["e"].to_numpy())
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        blk = pdf["blk"].to_numpy()
        if ga_k == gb_k:
            sims = np.round(m @ m.T, rd)
            # unordered pair appears at (i,j) and (j,i): keep one
            mask = ids[:, None] < ids[None, :]
        else:
            sel_a, sel_b = blk == ga_k, blk == gb_k
            ia, ib = ids[sel_a], ids[sel_b]
            sims = np.round(m[sel_a] @ m[sel_b].T, rd)
            # disjoint blocks (id determines block): every cell is a
            # distinct pair; orient as (min,max) below
            ids, mask = None, None
            i_idx, j_idx = np.nonzero(np.ones_like(sims, dtype=bool))
            pa = np.minimum(ia[i_idx], ib[j_idx])
            pb = np.maximum(ia[i_idx], ib[j_idx])
            svals = sims[i_idx, j_idx]
            return _topk_frame(pa, pb, svals, kl, thr)
        i_idx, j_idx = np.nonzero(mask)
        pa = ids[i_idx]
        pb = ids[j_idx]
        svals = sims[i_idx, j_idx]
        return _topk_frame(pa, pb, svals, kl, thr)

    # Pre-partition on the grouping keys to EXACTLY the group count:
    # applyInPandas otherwise inherits spark.sql.shuffle.partitions tasks,
    # and every task — including the empty ones — claims a Python worker.
    # A burst of fresh workers each pays ~2-3 s of one-time pandas/numpy/
    # BLAS init, which showed up as q35's bimodal 0.7 s / 2.4-5 s bench
    # readings (r7 profile, BASELINE.md). With the child already
    # hash-partitioned on (ga, gb), EnsureRequirements inserts no further
    # exchange, so the stage runs at most n_groups tasks, ~one group per
    # task (hash partitioning permits collisions — two groups can land in
    # one task — and empty partitions; the bound that matters is that no
    # task exceeds a handful of bounded dense GEMMs, also the right shape
    # on a cluster).
    n_groups = n_blocks * (n_blocks + 1) // 2
    return (
        rep.repartition(n_groups, "ga", "gb")
        .groupBy("ga", "gb")
        .applyInPandas(score, schema="a long, b long, sim double")
    )


def _topk_frame(pa, pb, svals, kl, thr):
    import numpy as np
    import pandas as pd

    if thr is not None:
        keep = svals >= thr
    elif kl is not None and len(svals) > kl:
        # keep everything >= the k-th value so boundary ties survive to
        # the exact global (sim, a, b) sort
        kth = np.partition(svals, len(svals) - kl)[len(svals) - kl]
        keep = svals >= kth
    else:
        keep = slice(None)
    return pd.DataFrame({"a": pa[keep], "b": pb[keep], "sim": svals[keep]})


def pairwise_cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, k: int = 20, round_digits: int = 4
) -> DataFrame:
    """Exact top-k most-similar pairs by cosine. Output (a, b, sim)."""
    sims = _block_pair_sims(df, id_col, vec_col, k_local=k, round_digits=round_digits)
    return sims.orderBy(F.desc("sim"), "a", "b").limit(k)


def cosine_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9, round_digits: int = 4
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection)."""
    sims = _block_pair_sims(df, id_col, vec_col, threshold=threshold, round_digits=round_digits)
    return sims.orderBy(F.desc("sim"), "a", "b")


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


def _lsh_sig_expr(e, dim: int, n_planes: int, seed: int):
    """Packed-BIGINT random-hyperplane signature expression over an
    array<double> column expression ``e`` (shared by lsh_signature and the
    one-pass multi-table form in ann_lsh_pairs)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i, plane in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in plane])
        dot = _dot(e, pl)
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def lsh_signature(df: DataFrame, vec_col: str, dim: int, n_planes: int = 16, seed: int = 42):
    """Random-hyperplane signature as a packed BIGINT column `sig`."""
    e = F.col(vec_col).cast("array<double>")
    return df.withColumn("sig", _lsh_sig_expr(e, dim, n_planes, seed))


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
    # r14: the per-table loop re-derived the signature frame TWICE per
    # table (once per self-join side), so n_tables=12 recomputed the
    # norm+signature projection 24x and the plan scanned the input 26x
    # (guide §2.4 duplicated subtrees). One materialized (id, e, nrm)
    # pass + one exploded (id, tbl, sig) frame + ONE self-join on
    # (sig, tbl) produces the identical candidate set: same per-table
    # seeds, and the union over per-table equality joins IS the equality
    # join on the (tbl, sig) compound key.
    v = _with_norm(df, id_col, vec_col).localCheckpoint(eager=True)
    e = F.col("e")
    structs = [
        F.struct(
            F.lit(t).alias("tbl"),
            _lsh_sig_expr(e, dim, n_planes, seed=1000 + t).alias("sig"),
        )
        for t in range(n_tables)
    ]
    sigs = (
        v.select(F.col(id_col), F.explode(F.array(*structs)).alias("s"))
        .select(F.col(id_col), F.col("s.tbl").alias("tbl"), F.col("s.sig").alias("sig"))
        # both self-join sides read this in one job: eager, not lazy
        # (a lazy checkpoint could be computed twice concurrently)
        .localCheckpoint(eager=True)
    )
    a = sigs.select(F.col(id_col).alias("a"), "sig", "tbl")
    b = sigs.select(F.col(id_col).alias("b"), "sig", "tbl")
    candidates = (
        a.join(b, ["sig", "tbl"]).where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_iter: int = 2,
):
    """k-means coarse quantizer, deterministically seeded.

    Seeds = the ``n_centroids`` vectors with the smallest ids (stable across
    runs/partitionings). Each Lloyd step is distributed: assignment is an
    Arrow-batched pandas_udf argmax over a broadcast centroid matrix;
    the per-cluster means come back via posexplode + groupBy(cid, pos) —
    only the k×dim centroid matrix ever reaches the driver (model state,
    same footprint class as a broadcast dimension table).
    """
    import numpy as np

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("e"))
    seed_rows = v.orderBy("id").limit(n_centroids).collect()
    cents = np.stack([np.asarray(r["e"]) for r in seed_rows])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    for _ in range(n_iter):
        assigned = _ivf_assign(v, cents, n_probe=1).select(
            F.col("cid"), F.posexplode("e").alias("pos", "x")
        )
        mean_rows = (
            assigned.groupBy("cid", "pos").agg(F.avg("x").alias("m")).collect()
        )
        new = cents.copy()
        for r in mean_rows:
            new[r["cid"], r["pos"]] = r["m"]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = new / norms
    return cents


def _ivf_assign(v: DataFrame, cents, n_probe: int):
    """Add ``cid`` (n_probe=1) or exploded probe ``cid``s to (id, e) rows.
    Centroid matrix rides the closure → Spark broadcasts it to executors."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = cents  # numpy (k, dim), unit rows
    if n_probe == 1:

        @pandas_udf("int")
        def best(e: pd.Series) -> pd.Series:
            import numpy as np

            m = np.stack(e.to_numpy())
            return pd.Series(np.argmax(m @ cmat.T, axis=1))

        return v.withColumn("cid", best("e"))

    @pandas_udf("array<int>")
    def probes(e: pd.Series) -> pd.Series:
        import numpy as np

        m = np.stack(e.to_numpy())
        sims = m @ cmat.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series(list(top))

    return v.withColumn("cid", F.explode(probes("e")))


def ann_ivf_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """IVF candidate pairs scored exactly. One side of each pair probes its
    ``n_probe`` nearest cells; the other side lives in its single home cell
    — so a pair is found iff b's home cell is among a's probes (the
    standard IVF query pattern, self-join form). The join key is the cell
    id: shuffle is on cid, never all-pairs. Bucket skew → AQE split."""
    cents = ivf_train_centroids(df, id_col, vec_col, n_centroids, n_iter)
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("e"))
    home = _ivf_assign(v, cents, n_probe=1).select(
        F.col("id").alias("b"), F.col("e").alias("eb"), "cid"
    )
    probe = _ivf_assign(v, cents, n_probe=n_probe).select(
        F.col("id").alias("a"), F.col("e").alias("ea"), "cid"
    )
    cand = (
        probe.join(home, "cid")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ea", "eb")
        .dropDuplicates(["a", "b"])
    )
    na = F.sqrt(_dot(F.col("ea"), F.col("ea")))
    nb = F.sqrt(_dot(F.col("eb"), F.col("eb")))
    sim = F.round(_dot(F.col("ea"), F.col("eb")) / (na * nb), round_digits)
    return cand.select("a", "b", sim.alias("sim"))


def ann_ivf_topk(
    df: DataFrame, id_col: str, vec_col: str, k: int = 20, **kw
) -> DataFrame:
    return (
        ann_ivf_pairs(df, id_col, vec_col, **kw)
        .orderBy(F.desc("sim"), "a", "b")
        .limit(k)
    )


def knn_search(
    df: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k cosine search for ONE query vector.

    The query is a literal array baked into the plan (no join, no shuffle):
    one scan + TakeOrderedAndProject, which is the optimal distributed plan
    — each partition computes its local top-k, the driver merges. For
    batched query sets use ann_lsh_topk/ann_ivf_topk instead.
    """
    from aetherium_trader_datapipeline_spark.functions.vectors import cosine_similarity

    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_similarity(F.col(vec_col), q), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), id_col)
        .limit(k)
    )


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    toks_col: str,
    threshold_num: int = 8,
    threshold_den: int = 10,
    block_size: int = 2048,
) -> DataFrame:
    """EXACT set-similarity self-join (all pairs with Jaccard >= num/den)
    via the same triangle-replicated block-GEMM layout as
    :func:`_block_pair_sims` — replacing the token equi-join + pair
    groupBy formulation, whose shuffle is quadratic in the hot-token
    bucket sizes (measured 9.5 s warm at sf0.1 on x307's fixture vs
    ~1.3 s for this form).

    Each row carries its integer token-id SET (``toks_col``, array<long>,
    caller-deduped); rows hash into B blocks and replicate to the block
    pairs of the triangle, and each ``applyInPandas`` group densifies
    only its LOCAL token universe (np.unique over the group's ids — so
    the dense matrix is bounded by group rows x group-distinct tokens no
    matter how large the GLOBAL vocabulary is) and computes every
    pairwise intersection in one float32 GEMM (exact: counts < 2^24).
    The Jaccard filter is integer math on (c, sa, sb) — no float
    threshold ambiguity. Output: (a, b, n_common, sz_a, sz_b) with
    a < b, one row per surviving pair.

    100 TB posture: B(B+1)/2 independent GEMM tasks, per-task memory
    bounded by block_size x local-vocab; the threshold prunes inside the
    kernel so only surviving pairs leave the worker. Reference parity:
    same exactness contract as the reference's dedup verify pass
    (dedup.rs candidate verification), expressed as a dense kernel
    instead of a row join.

    Block count comes from :func:`_floored_block_count` (memory bound
    with a parallelism floor — the r7/r8 x307 bench anomaly was a
    3-block triangle running six single-core GEMM tasks on 32 cores;
    see the helper's docstring for the measured argument).
    """
    n = df.count()
    n_blocks = _floored_block_count(df, n, block_size)

    v = df.select(
        F.col(id_col).alias("id"),
        F.col(toks_col).cast("array<long>").alias("toks"),
    ).withColumn("blk", F.pmod(F.hash("id"), F.lit(n_blocks)))

    ga = F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("ga")
    rep_a = v.select("id", "toks", "blk", ga).withColumn("gb", F.col("blk"))
    gb = F.explode(F.sequence(F.col("blk") + 1, F.lit(n_blocks - 1))).alias("gb")
    rep_b = (
        v.where(F.col("blk") < n_blocks - 1)
        .select("id", "toks", "blk", gb)
        .withColumn("ga", F.col("blk"))
    )
    rep = rep_a.unionByName(rep_b)

    tn, td = threshold_num, threshold_den

    def score(key, pdf):
        import numpy as np
        import pandas as pd

        ga_k, gb_k = key
        ids = pdf["id"].to_numpy()
        blk = pdf["blk"].to_numpy()
        toks = [np.asarray(t, dtype=np.int64) for t in pdf["toks"]]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        if len(ids) == 0:
            return pd.DataFrame(
                {"a": [], "b": [], "n_common": [], "sz_a": [], "sz_b": []}
            )
        all_t = np.concatenate(toks)
        uniq, inv = np.unique(all_t, return_inverse=True)
        m = np.zeros((len(ids), len(uniq)), dtype=np.float32)
        m[np.repeat(np.arange(len(ids)), lens), inv] = 1.0
        if ga_k == gb_k:
            c = (m @ m.T).astype(np.int64)
            ia = ib = ids
            sa = sb = lens
            keep = ia[:, None] < ib[None, :]
        else:
            sel_a, sel_b = blk == ga_k, blk == gb_k
            ia, ib = ids[sel_a], ids[sel_b]
            sa, sb = lens[sel_a], lens[sel_b]
            c = (m[sel_a] @ m[sel_b].T).astype(np.int64)
            keep = np.ones_like(c, dtype=bool)
        # integer Jaccard threshold: c/ (sa+sb-c) >= tn/td
        union = sa[:, None] + sb[None, :] - c
        keep &= c * td >= tn * union
        i_idx, j_idx = np.nonzero(keep)
        pa, pb = ia[i_idx], ib[j_idx]
        ra, rb_ = sa[i_idx], sb[j_idx]
        cc = c[i_idx, j_idx]
        swap = pa > pb
        pa2 = np.where(swap, pb, pa)
        pb2 = np.where(swap, pa, pb)
        ra2 = np.where(swap, rb_, ra)
        rb2 = np.where(swap, ra, rb_)
        return pd.DataFrame(
            {"a": pa2, "b": pb2, "n_common": cc, "sz_a": ra2, "sz_b": rb2}
        )

    # Pin the exchange width: the grouped rows total only a few tens of
    # MB at test SFs, so AQE's coalescePartitions folds the groupBy
    # shuffle down to ~3 partitions (>= 1 MB each) and the B(B+1)/2 GEMM
    # groups execute 3-at-a-time regardless of B — observed as 3-task
    # stages even after the parallelism floor raised the group count to
    # 66.  An explicit numbered repartition on the grouping keys is
    # preserved by AQE (REPARTITION_BY_NUM origin) and already satisfies
    # applyInPandas's ClusteredDistribution, so no second shuffle is
    # added.  Width 2x parallelism (capped by the group count) keeps
    # per-task group counts balanced at any n.
    tri = n_blocks * (n_blocks + 1) // 2
    par = max(1, df.sparkSession.sparkContext.defaultParallelism)
    return (
        rep.repartition(min(tri, 2 * par), "ga", "gb")
        .groupBy("ga", "gb")
        .applyInPandas(
            score, schema="a long, b long, n_common long, sz_a long, sz_b long"
        )
    )
