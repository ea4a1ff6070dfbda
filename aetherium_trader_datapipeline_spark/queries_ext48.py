"""Forty-eighth extension wave — corporate actions, spectral iteration,
and distribution matching:

x244 split adjust     back-adjust price history for deterministic 2:1
                      splits (divide by the cumulative future split
                      factor) — exact decimal halving, no float drift
x245 power iteration  top eigenvector direction of the 64×64 embedding
                      gram matrix via 3 unrolled matvec rounds; vectors
                      carried as nano-scaled BIGINTs (FLOOR-quantized
                      after the max-abs normalization) so both engines
                      iterate identically
x246 quantile normalize map each event-type's value distribution onto the
                      pooled distribution by rank position — the classic
                      quantile-normalization feature transform, exact
                      integer rank lookups

Scale shapes: x244 is map-only. x245 reduces the data to a 4096-row gram
relation in ONE pass (the only data-sized stage); the iteration then
works on 64-row vectors. x246 is two rank windows + an integer-rank join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x244: split back-adjustment --------------------------------------------
# Splits (synthesized deterministically — events carry no corporate
# actions): instruments ≡0 mod 3 split 2:1 at 2024-02-01; those ≡0 mod 6
# split again at 2024-03-01. Rows strictly before a split divide by its
# factor: cumulative divisor 2^k with k = future splits for that row.

_X244_BODY = """
    WITH px AS (
      SELECT user_id, event_id, ts, CAST(ROUND(value, 4) AS DECIMAL(18,4)) AS p
      FROM events WHERE value > 0
    ),
    adj AS (
      SELECT user_id, event_id, p,
             CAST(CASE WHEN user_id % 3 = 0 AND ts < TIMESTAMP '2024-02-01 00:00:00'
                       THEN 1 ELSE 0 END AS INT)
             + CAST(CASE WHEN user_id % 6 = 0 AND ts < TIMESTAMP '2024-03-01 00:00:00'
                         THEN 1 ELSE 0 END AS INT) AS k
      FROM px
    )
    SELECT user_id, event_id,
           ROUND(CAST(p AS DOUBLE), 4) AS raw_px, k AS n_future_splits,
           ROUND(CAST(CASE k WHEN 0 THEN p
                             WHEN 1 THEN p / 2
                             ELSE p / 4 END AS DOUBLE), 6) AS adj_px
    FROM adj ORDER BY user_id, event_id LIMIT 500
"""

register_sql(
    "x244_split_adjust",
    spark_sql=_X244_BODY,
    duckdb_sql=_X244_BODY,
    tags=("finance", "corporate-actions"),
)

# -- x245: power iteration on the embedding gram matrix ---------------------


def _x245(dim_src: str) -> str:
    rounds = []
    prev = "v0"
    for r in range(1, 4):
        rounds.append(f"""
    w{r} AS (
      SELECT g.i, SUM(g.g * v.v) AS w
      FROM gram g JOIN {prev} v ON g.j = v.i GROUP BY g.i
    ),
    m{r} AS (SELECT MAX(ABS(CAST(w AS DOUBLE))) AS m FROM w{r}),
    v{r} AS (
      SELECT w.i,
             CAST(FLOOR(1e8 * (CAST(w.w AS DOUBLE) / m.m)) AS BIGINT) AS v
      FROM w{r} w CROSS JOIN m{r} m
    )""")
        prev = f"v{r}"
    return f"""
    WITH dims AS (
      SELECT vec_id, d.pos AS p,
             CAST(ROUND(CAST(d.x AS DOUBLE), 6) AS DECIMAL(12,6)) AS xq
      FROM ({dim_src}) d
    ),
    gram AS (
      SELECT a.p AS i, b.p AS j, SUM(a.xq * b.xq) AS g
      FROM dims a JOIN dims b ON a.vec_id = b.vec_id
      GROUP BY a.p, b.p
    ),
    v0 AS (SELECT DISTINCT i, CAST(100000000 AS BIGINT) AS v FROM gram),{",".join(rounds)}
    SELECT i AS dim_pos, v AS v_nano FROM v3 ORDER BY i
"""


# Spark side: DataFrame rounds over a localCheckpoint'd gram relation —
# Spark replans a multiply-referenced CTE from scratch per round (the
# x212 lesson: the SQL form re-ran the data-scale self-join three times,
# 9.7 s vs ~1 s at sf0.1). The oracle keeps the unrolled-CTE form; the
# per-round max-abs is the only driver traffic (3 scalars).


@register(
    "x245_power_iteration",
    oracle=_x245(
        "SELECT vec_id, CAST(u.i - 1 AS BIGINT) AS pos, u.x FROM embeddings, "
        "LATERAL (SELECT UNNEST(embedding) AS x, "
        "GENERATE_SUBSCRIPTS(embedding, 1) AS i) u"
    ),
    tags=("embedding", "spectral", "iterative"),
)
def x245_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # small-SF parquet arrives as one file -> one partition; the 64x-row
    # posexplode fan-out and the vec_id self-join would then run serially.
    # Repartition on the join key BEFORE exploding: the pair fan-out and
    # the (i,j) partial aggregation parallelize, and the self-join is
    # co-partitioned (measured 9.3 s -> ~1 s at sf0.1).
    dims = (
        t["embeddings"]
        .repartition(32, "vec_id")
        .select("vec_id", F.posexplode("embedding").alias("p", "x"))
        .select(
            "vec_id",
            "p",
            F.round(F.col("x").cast("double"), 6).cast("decimal(12,6)").alias("xq"),
        )
    )
    a = dims.alias("a")
    b = dims.alias("b")
    gram = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.p").alias("i"), F.col("b.p").alias("j"))
        .agg(F.sum(F.col("a.xq") * F.col("b.xq")).alias("g"))
        # lazy (r13 job diet): round 1's broadcast build of v is the first
        # action and materializes the gram in the same job
        .localCheckpoint(eager=False)
    )
    v = gram.select(F.col("i")).distinct().withColumn(
        "v", F.lit(100000000).cast("bigint")
    )
    for _ in range(3):
        w = (
            gram.join(F.broadcast(v.withColumnRenamed("i", "j")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("w"))
            # lazy: the max-abs collect right below materializes w
        ).localCheckpoint(eager=False)
        m = w.agg(F.max(F.abs(F.col("w").cast("double")))).collect()[0][0]
        v = w.select(
            "i",
            F.floor(F.lit(1e8) * (F.col("w").cast("double") / F.lit(float(m))))
            .cast("bigint")
            .alias("v"),
        )
    return v.select(F.col("i").alias("dim_pos"), F.col("v").alias("v_nano")).orderBy(
        "dim_pos"
    )

# -- x246: quantile normalization -------------------------------------------
# Each row's within-type rank maps to the pooled sorted values at the same
# fractional position. All rank arithmetic is integer; the fractional
# position uses one double product floored to an integer reference rank.

_X246_BODY = """
    WITH s AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    g AS (
      SELECT event_id, event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM s
    ),
    bycents AS (
      SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY cents
    ),
    cgrid AS (
      -- pooled-rank offsets over the distinct-cents grid (sub-linear
      -- frame per the global-band policy); the r7 rewrite of the r6
      -- ROW_NUMBER() OVER (ORDER BY cents, event_id) — a
      -- single-partition sort of every event
      SELECT cents, SUM(c) OVER (ORDER BY cents) - c AS cum_before
      FROM bycents
    ),
    pooled AS (
      SELECT s.cents AS ref_cents,
             cg.cum_before
             + ROW_NUMBER() OVER (PARTITION BY s.cents
                                  ORDER BY s.event_id) AS prk
      FROM s JOIN cgrid cg ON s.cents = cg.cents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM s),
    mapped AS (
      SELECT g.event_id, g.event_type, g.cents,
             1 + CAST(FLOOR((CAST(g.rk - 1 AS DOUBLE) / (g.n - 1))
                            * (t.N - 1)) AS BIGINT) AS ref_rk
      FROM g CROSS JOIN tot t WHERE g.n > 1
    )
    SELECT m.event_id, m.event_type, m.cents, p.ref_cents AS qnorm_cents
    FROM mapped m JOIN pooled p ON m.ref_rk = p.prk
    ORDER BY m.event_id LIMIT 400
"""

register_sql(
    "x246_quantile_normalize",
    spark_sql=_X246_BODY,
    duckdb_sql=_X246_BODY,
    tags=("ml", "window"),
)
