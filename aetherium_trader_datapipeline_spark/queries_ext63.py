"""Wave 63 (x283–x285): weighted sampling, gap interpolation, and sketch
accuracy — three primitives a training-data pipeline reaches for between
dedup and packing.

x283 is sequential Poisson sampling (Ohlsson): inclusion probability
proportional to weight via the key u/w over a uniform integer u — here
integer-exact (u DIV w on a 48-bit md5 prefix) so both engines rank the
identical sample. x284 extends x78's forward-fill spine to LINEAR
interpolation between known points. x285 closes the MinHash story with the
estimator itself: per candidate pair, signature agreement (the J estimate's
numerator) next to the exact intersection/sizes — every column an integer,
every value engine-identical under the portable hash family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.queries_ext14 import _NB, _NP, _X129_CTES
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x283: weighted reservoir (sequential Poisson sampling) ------------------
# key(d) = u(d) DIV w(d): u = 48-bit md5 prefix (uniform, portable), w =
# doc length in chars. Bottom-10 keys per language stratum = a
# weight-biased sample (long docs ~proportionally likelier), reproducible
# on any cluster layout and identical in both engines (integer division,
# doc_id tiebreak).

_X283_FMT = """
    WITH keyed AS (
      SELECT lang, doc_id, length(text) AS w,
             {u} AS u
      FROM documents WHERE length(text) > 0
    )
    SELECT lang, doc_id, CAST(w AS BIGINT) AS w, rk FROM (
      SELECT lang, doc_id, w,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY u // w, doc_id
             ) AS BIGINT) AS rk
      FROM keyed
    ) t WHERE rk <= 10
    ORDER BY lang, rk
"""

register_sql(
    "x283_weighted_reservoir",
    spark_sql=_X283_FMT.format(
        u="CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
    ).replace("u // w", "u DIV w"),
    duckdb_sql=_X283_FMT.format(
        u="('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT"
    ),
    tags=("sampling", "curation"),
)

# -- x284: spine resample with LINEAR interpolation ---------------------------
# x78's hourly spine, but gaps are lerped between the previous and next
# known points (ends fall back to nearest known). prev/next carry (h, v)
# as a struct through IGNORE NULLS window frames — one window pass each
# direction, no self-join. ALL arithmetic in integer micro-units with a
# single floor division (pv*(t1-t) + nv*(t-t0)) DIV (t1-t0): the float
# form tied at the 4th decimal and the two engines' double-rounding split
# (Spark BigDecimal HALF_UP vs DuckDB scaled-double) — integers cannot.

_X284_FMT = """
    WITH bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN({ts})) AS h0,
             date_trunc('hour', MAX({ts})) AS h1
      FROM events GROUP BY user_id),
    spine AS (
      SELECT user_id, {explode} AS h FROM bounds),
    hourly AS (
      SELECT user_id, date_trunc('hour', {ts}) AS h,
             SUM(CAST(ROUND(value * 10000) AS BIGINT)) {div} COUNT(*) AS v
      FROM events GROUP BY user_id, date_trunc('hour', {ts})),
    joined AS (
      SELECT s.user_id, s.h, hr.v FROM spine s
      LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h),
    ctx AS (
      SELECT user_id, h, v,
             {last_pv} OVER (PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             {first_nv} OVER (PARTITION BY user_id ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      FROM joined)
    SELECT user_id, h,
           CAST(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv.v
             WHEN nv IS NULL THEN pv.v
             ELSE (pv.v * (({epoch_nv}) - ({epoch_h}))
                   + nv.v * (({epoch_h}) - ({epoch_pv})))
                  {div} (({epoch_nv}) - ({epoch_pv}))
           END AS BIGINT) AS v_lerp_micro
    FROM ctx ORDER BY user_id, h LIMIT 500
"""

_X284_SPARK_FMT = _X284_FMT.format(
    ts="ts",
    div="DIV",
    # {{parts}} survives this .format pass; the runner below fills it with a
    # spine-derived width (see x284_resample_linear).
    explode="explode(sequence(h0, h1, interval 1 hour))",
    last_pv="LAST(CASE WHEN v IS NOT NULL THEN named_struct('h', h, 'v', v) END, TRUE)",
    first_nv="FIRST(CASE WHEN v IS NOT NULL THEN named_struct('h', h, 'v', v) END, TRUE)",
    epoch_h="unix_seconds(h)",
    epoch_pv="unix_seconds(pv.h)",
    epoch_nv="unix_seconds(nv.h)",
).replace(
    "SELECT user_id, explode(sequence(h0, h1, interval 1 hour)) AS h FROM bounds",
    "SELECT /*+ REPARTITION({parts}) */ user_id,"
    " explode(sequence(h0, h1, interval 1 hour)) AS h FROM bounds",
).replace(
    "SELECT s.user_id, s.h, hr.v FROM spine s",
    "SELECT /*+ REPARTITION({parts}, s.user_id) */ s.user_id, s.h, hr.v FROM spine s",
)

_X284_ORACLE = _X284_FMT.format(
        ts="CAST(ts AS TIMESTAMP)",
        div="//",
        explode="unnest(generate_series(h0, h1, INTERVAL 1 HOUR))",
        last_pv="LAST_VALUE(CASE WHEN v IS NOT NULL THEN {'h': h, 'v': v} END IGNORE NULLS)",
        first_nv="FIRST_VALUE(CASE WHEN v IS NOT NULL THEN {'h': h, 'v': v} END IGNORE NULLS)",
        epoch_h="CAST(FLOOR(epoch(h)) AS BIGINT)",
        epoch_pv="CAST(FLOOR(epoch(pv.h)) AS BIGINT)",
        epoch_nv="CAST(FLOOR(epoch(nv.h)) AS BIGINT)",
)


@register("x284_resample_linear", oracle=_X284_ORACLE, tags=("timeseries", "gapfill"))
def x284_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-sizing spine: the gap-fill GENERATES users × hours rows, so the
    right shuffle width depends on data the optimizer can't see before the
    explode (32 default partitions hit a GC wall on the ~74 M-row spine the
    100× replica generates; AQE coalesces down but never splits up). The
    spine row count is one bounded scalar over `bounds` (|users| input
    rows), and both data-proportional exchanges — the exploded spine and the
    pre-window join output — get a REPARTITION hint derived from it
    (~1.5 M spine rows per partition, floored at the session default)."""
    load_tables(spark, sf_dir)  # registers the temp views spark.sql reads
    n_spine = spark.sql(
        """
        SELECT SUM(hours) FROM (
          SELECT CAST((unix_seconds(date_trunc('hour', MAX(ts)))
                       - unix_seconds(date_trunc('hour', MIN(ts)))) / 3600 AS BIGINT) + 1
                 AS hours
          FROM events GROUP BY user_id)
        """
    ).collect()[0][0] or 0
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    parts = min(4096, max(default_parts, -(-int(n_spine) // 1_500_000)))
    return spark.sql(_X284_SPARK_FMT.format(parts=parts))

# -- x285: MinHash Jaccard ESTIMATOR accuracy ---------------------------------
# For the top candidate pairs, put the estimator's numerator (signature
# agreement over 16 perms) NEXT TO the exact intersection and set sizes —
# all integers, all engine-identical under the portable hash family, so
# the sketch's accuracy itself is hash-verified (the analytic complement
# of x280's recall curve).

_AGREE_SQL = " + ".join(
    f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(_NP)
)

_X285_ORACLE = (
    _X129_CTES
    + f""",
    bucket_min AS (
      SELECT band, bk, MIN(id) AS rep FROM bands GROUP BY band, bk
    ),
    pairs AS (
      SELECT DISTINCT m.rep AS pa, e.id AS pb
      FROM bands e JOIN bucket_min m ON e.band = m.band AND e.bk = m.bk
      WHERE m.rep < e.id
      ORDER BY pa, pb LIMIT 100
    ),
    agree AS (
      SELECT p.pa, p.pb,
             CAST({_AGREE_SQL} AS BIGINT) AS n_agree
      FROM pairs p JOIN sig a ON a.id = p.pa JOIN sig b ON b.id = p.pb
    ),
    sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
    -- intersections ONLY for the <=100 selected pairs: the original
    -- all-pairs form (sh a JOIN sh b over the whole corpus) is quadratic
    -- in hot-shingle df and filled the sf1 sweep host's disk (r9); the
    -- pair-scoped probe is |pairs| x set-size work and value-identical
    -- for every selected pair.  MATERIALIZED so DuckDB does not
    -- re-inline the probe per outer reference.
    inter AS MATERIALIZED (
      SELECT p.pa, p.pb, CAST(COUNT(*) AS BIGINT) AS inter
      FROM pairs p
      JOIN sh a ON a.id = p.pa
      JOIN sh b ON b.id = p.pb AND b.sh = a.sh
      GROUP BY p.pa, p.pb
    )
    SELECT g.pa AS a, g.pb AS b, g.n_agree,
           COALESCE(i.inter, 0) AS inter,
           CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b
    FROM agree g
    LEFT JOIN inter i ON i.pa = g.pa AND i.pb = g.pb
    JOIN sizes sa ON sa.id = g.pa JOIN sizes sb ON sb.id = g.pb
    ORDER BY a, b
"""
)


@register("x285_minhash_estimate", oracle=_X285_ORACLE, tags=("dedup", "lsh"))
def x285_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        _shingles,
        minhash_portable_assignments,
        portable_perm_consts,
    )
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        PORTABLE_MINHASH_P,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    # candidate pairs = the LINEAR assignment edges (member → bucket-min),
    # not the all-pairs bucket enumeration: the pair form went quadratic
    # on the dup-heavy 10× replica (26.7 s; this form is flat)
    pairs = (
        minhash_portable_assignments(docs, "doc_id", num_perm=_NP, bands=_NB)
        .select(F.col("rep").alias("a"), F.col("id").alias("b"))
        .orderBy("a", "b")
        .limit(100)
        .localCheckpoint(eager=False)
    )
    # portable signatures (same construction as the oracle's sig CTE).
    # ONE checkpointed shingle frame feeds signatures, sizes, and the
    # intersection probe — without the cut each consumer re-derives the
    # tokenize→gram pipeline (measured 58.6 s vs ~20 s at 100×)
    sh = _shingles(docs, "doc_id", "text", 2).localCheckpoint(eager=False)
    A, B = portable_perm_consts(_NP)
    hashed = sh.select(
        "id",
        F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    # sz rides the SAME groupBy("id") that builds the signature — shingles
    # are distinct per doc, so COUNT(*) here IS the set size, and the
    # separate sizes aggregation (one more pass over sh) disappears.
    sig = hashed.groupBy("id").agg(
        *[
            F.min((F.lit(A[i]) * F.col("h") + F.lit(B[i])) % PORTABLE_MINHASH_P).alias(
                f"mh{i}"
            )
            for i in range(_NP)
        ],
        F.count(F.lit(1)).alias("sz"),
    ).localCheckpoint(eager=False)
    agree_expr = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(_NP)
    )
    agree = (
        pairs.join(sig.alias("sa"), F.col("a") == F.col("sa.id"))
        .join(sig.alias("sb"), F.col("b") == F.col("sb.id"))
        .select(
            "a",
            "b",
            agree_expr.cast("bigint").alias("n_agree"),
            F.col("sa.sz").alias("sz_a"),
            F.col("sb.sz").alias("sz_b"),
        )
    )
    # intersections probed FROM the 100 candidate pairs (|pairs| × shingles
    # rows), never via the quadratic all-pairs self-join (x280's lesson)
    inter = (
        pairs.join(sh.select(F.col("id").alias("a"), "sh"), "a")
        .join(sh.select(F.col("id").alias("b"), "sh"), ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        agree.join(inter, ["a", "b"], "left")
        .select(
            "a",
            "b",
            "n_agree",
            F.coalesce(F.col("inter"), F.lit(0)).alias("inter"),
            "sz_a",
            "sz_b",
        )
        .orderBy("a", "b")
    )
