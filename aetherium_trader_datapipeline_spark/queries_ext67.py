"""Wave 67 (x297–x301): community structure, incremental ingest dedup, the
multimodal resize stage, tokenizer payoff accounting, and an optimizer
cost-model diagnostic — each backed by a first-class operator where the
semantics live outside SQL.

x297 is synchronous frequency-based label propagation (Raghavan et al.
2007) — `operators/graph.label_propagation` — on the customer–supplier
bipartite graph x172 ranks: two fixed rounds, most-frequent-neighbor-label
with smallest-label tie-break, so the classic async algorithm's
nondeterminism is gone and the result hash-verifies.  Community detection
proper, distinct from connected components' min-id flooding.

x298 is the INCREMENTAL LSH dedup path —
`operators/dedup.minhash_incremental_assignments` — the shape a growing
corpus actually runs daily: new batch (doc_id % 10 = 7) probes the
existing corpus' bucket-min signature table; never corpus × corpus.  Same
portable md5 hash family as x129, so DuckDB replays it exactly.

x299 is the resize stage of the multimodal ingest set (decode /
feature-extract / RESIZE / frame-sample): real PNG decode → integer 2×2
box downsample (`operators/multimodal.box_downsample`) → stats, with the
closed-form pixel function making the whole path arithmetically
verifiable.

x300 extends x292's BPE chain with the payoff accounting: corpus symbol
count before vs after the two learned merges, savings in basis points —
the number a tokenizer-training run is judged by.

x301 validates the System-R join-size estimator the optimizer's cost
model rests on: 64-bucket key histograms, est = Σ_b c_a·c_b / max(d_a,d_b)
under the containment assumption, compared against the true join
cardinality for a FK join and a 1:N join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.queries_ext14 import _X129_CTES
from aetherium_trader_datapipeline_spark.queries_ext66 import (
    _X292_CHR_DUCK,
    _X292_CHR_SPARK,
    _X292_TOK_DUCK,
    _X292_TOK_SPARK,
    _bpe_round,
)
from aetherium_trader_datapipeline_spark.tables import load_tables

# -- x297: frequency-LPA communities -----------------------------------------

_X297_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (
      SELECT src AS node, dst AS nbr FROM e0
      UNION
      SELECT dst AS node, src AS nbr FROM e0
    ),
    l0 AS (SELECT DISTINCT node, node AS lab FROM e),
    c1 AS (
      SELECT e.node, l.lab, COUNT(*) AS c
      FROM e JOIN l0 l ON e.nbr = l.node GROUP BY e.node, l.lab
    ),
    l1 AS (
      SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
        FROM c1
      ) t WHERE rn = 1
    ),
    c2 AS (
      SELECT e.node, l.lab, COUNT(*) AS c
      FROM e JOIN l1 l ON e.nbr = l.node GROUP BY e.node, l.lab
    ),
    l2 AS (
      SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
        FROM c2
      ) t WHERE rn = 1
    )
    SELECT CAST(lab AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(node) AS BIGINT) AS min_node
    FROM l2 GROUP BY lab ORDER BY n_members DESC, community LIMIT 100
"""


@register("x297_label_propagation", oracle=_X297_ORACLE, tags=("graph", "clustering"))
def x297_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.graph import label_propagation

    t = load_tables(spark, sf_dir)
    e1 = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e1.union(e1.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = label_propagation(edges, rounds=2)
    return (
        labels.groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("min_node"),
        )
        .orderBy(F.desc("n_members"), "community")
        .limit(100)
    )


# -- x298: incremental (new-batch vs corpus) LSH dedup -----------------------

_X298_ORACLE = (
    _X129_CTES
    + """,
    newb AS (SELECT * FROM bands WHERE id % 10 = 7),
    oldmin AS (
      SELECT band, bk, MIN(id) AS rep
      FROM bands WHERE id % 10 <> 7 GROUP BY band, bk
    ),
    matched AS (
      SELECT n.id, MIN(o.rep) AS matched_old
      FROM newb n JOIN oldmin o ON n.band = o.band AND n.bk = o.bk
      GROUP BY n.id
    )
    SELECT d.doc_id, m.matched_old,
           m.matched_old IS NOT NULL AS is_dup
    FROM documents d LEFT JOIN matched m ON d.doc_id = m.id
    WHERE d.doc_id % 10 = 7
    ORDER BY d.doc_id LIMIT 500
"""
)


@register("x298_incremental_minhash", oracle=_X298_ORACLE, tags=("dedup", "lsh"))
def x298_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.dedup import (
        minhash_incremental_assignments,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    new = docs.where(F.col("doc_id") % 10 == 7)
    old = docs.where(F.col("doc_id") % 10 != 7)
    asg = minhash_incremental_assignments(new, old, "doc_id", "text")
    matched = asg.groupBy("id").agg(F.min("rep").alias("matched_old"))
    return (
        new.select("doc_id")
        .join(matched, new["doc_id"] == matched["id"], "left")
        .select(
            "doc_id",
            "matched_old",
            F.col("matched_old").isNotNull().alias("is_dup"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


# -- x299: PNG decode → 2×2 box resize ---------------------------------------
# Same synthesis scheme as x281 (w = 4 + d%5, h = 3 + d%4,
# pixel(d,x,y,c) = (d*31 + x*7 + y*13 + c*17) % 256, filters cycled);
# the oracle computes the floor-mean of each 2×2 block in closed form, so
# a wrong decode OR a wrong resize fails the value hash.

_X299_ORACLE = """
    WITH d AS (
      SELECT doc_id, (4 + doc_id % 5) // 2 AS ow, (3 + doc_id % 4) // 2 AS oh
      FROM documents WHERE doc_id <= 200
    ),
    px AS (
      SELECT doc_id, ow, oh,
             list_transform(range(0, ow * oh * 3), i ->
               ( (doc_id * 31 + ((i // 3) % ow) * 2 * 7
                  + (i // (3 * ow)) * 2 * 13 + (i % 3) * 17) % 256
               + (doc_id * 31 + (((i // 3) % ow) * 2 + 1) * 7
                  + (i // (3 * ow)) * 2 * 13 + (i % 3) * 17) % 256
               + (doc_id * 31 + ((i // 3) % ow) * 2 * 7
                  + ((i // (3 * ow)) * 2 + 1) * 13 + (i % 3) * 17) % 256
               + (doc_id * 31 + (((i // 3) % ow) * 2 + 1) * 7
                  + ((i // (3 * ow)) * 2 + 1) * 13 + (i % 3) * 17) % 256
               ) // 4) AS v
      FROM d
    )
    SELECT doc_id,
           CAST(ow AS INTEGER) AS out_width, CAST(oh AS INTEGER) AS out_height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(v) AS BIGINT) AS px_sum,
           CAST(list_min(v) AS INTEGER) AS px_min,
           CAST(list_max(v) AS INTEGER) AS px_max
    FROM px ORDER BY doc_id
"""


@register("x299_image_resize_box", oracle=_X299_ORACLE, tags=("multimodal", "decode"))
def x299_image_resize_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_png,
        image_resize_stats_synth,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    ids = docs.select("doc_id").where(F.col("doc_id") <= 200)

    def make_blob(d: int) -> bytes:
        w, h = 4 + d % 5, 3 + d % 4
        px = bytes(
            (d * 31 + x * 7 + y * 13 + c * 17) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        return encode_png(w, h, pixels=px, cycle_filters=True)

    # r13: fused synth→decode→resize→stats — one MapInPandas, blob stays
    # in the worker (guide §4.1/§8); same encoder/decoder path as before.
    return image_resize_stats_synth(ids, make_blob, factor=2).orderBy("doc_id")


# -- x300: BPE compression payoff --------------------------------------------


def _x300_sql(tok_gen: str, chr_gen: str) -> str:
    return f"""
    WITH w0 AS ({tok_gen}),
    wf AS (SELECT word, COUNT(*) AS f FROM w0 WHERE length(word) > 0 GROUP BY word),
    seq0 AS ({chr_gen}),
    {_bpe_round(1)},
    {_bpe_round(2)},
    tot0 AS (
      SELECT CAST(SUM(length(word) * f) AS BIGINT) AS syms0,
             CAST(SUM(f) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_words
      FROM wf
    ),
    len2 AS (SELECT word, MAX(p) AS l2 FROM seq2 GROUP BY word),
    tot2 AS (
      SELECT CAST(SUM(l.l2 * w.f) AS BIGINT) AS syms2
      FROM len2 l JOIN wf w ON l.word = w.word
    )
    SELECT t0.n_words, t0.n_distinct_words,
           t0.syms0 AS syms_chars, t2.syms2 AS syms_after_2_merges,
           CAST((t0.syms0 - t2.syms2) * 10000 {{div}} t0.syms0 AS BIGINT)
             AS saved_bp,
           b1.s1 || '+' || b1.s2 AS merge1,
           b2.s1 || '+' || b2.s2 AS merge2
    FROM tot0 t0, tot2 t2, best1 b1, best2 b2
"""


@register(
    "x300_bpe_compression",
    oracle=_x300_sql(_X292_TOK_DUCK, _X292_CHR_DUCK).format(div="//"),
    tags=("text", "llm", "tokenizer"),
)
def x300_bpe_compression(spark, sf_dir):
    """r14 restructure (guide §2.4): same CTE-inlining blowup as x292
    (whose merge-round machinery this key extends) — 15 documents scans,
    74 exchanges.  Runs the two BPE rounds iteratively with wf/seq{q}/
    pc{q} checkpointed (the x292 device, x300-prefixed views), then the
    payoff accounting reads the checkpoints; oracle unchanged."""
    load_tables(spark, sf_dir)["documents"].createOrReplaceTempView(
        "documents"
    )
    wf = spark.sql(
        f"""
    WITH w0 AS ({_X292_TOK_SPARK})
    SELECT word, COUNT(*) AS f FROM w0 WHERE length(word) > 0
    GROUP BY word"""
    ).localCheckpoint()
    wf.createOrReplaceTempView("x300_wf")
    seq = spark.sql(
        _X292_CHR_SPARK.replace("FROM wf", "FROM x300_wf wf")
    ).localCheckpoint()
    seq.createOrReplaceTempView("x300_seq0")
    pair_counts = """
      SELECT t.s1, t.s2, SUM(w.f) AS cnt
      FROM (
        SELECT word, p, sym AS s1,
               LEAD(sym) OVER (PARTITION BY word ORDER BY p) AS s2
        FROM x300_seq{p}
      ) t JOIN x300_wf w ON t.word = w.word
      WHERE t.s2 IS NOT NULL GROUP BY t.s1, t.s2"""
    for q in (1, 2):
        p = q - 1
        pc = spark.sql(pair_counts.format(p=p)).localCheckpoint()
        pc.createOrReplaceTempView(f"x300_pc{q}")
        seq = spark.sql(
            f"""
    WITH best AS (
      SELECT s1, s2 FROM x300_pc{q} ORDER BY cnt DESC, s1, s2 LIMIT 1
    ),
    m AS (
      SELECT s.word, s.p, s.sym,
             CASE WHEN s.sym = b.s1
                   AND LEAD(s.sym) OVER (PARTITION BY s.word ORDER BY s.p) = b.s2
                  THEN 1 ELSE 0 END AS cand
      FROM x300_seq{p} s CROSS JOIN best b
    ),
    r AS (
      SELECT *, p - ROW_NUMBER() OVER (PARTITION BY word, cand ORDER BY p) AS grp
      FROM m
    ),
    mm AS (
      SELECT *,
             CASE WHEN cand = 1
                   AND ROW_NUMBER() OVER (PARTITION BY word, cand, grp ORDER BY p) % 2 = 1
                  THEN 1 ELSE 0 END AS do_merge
      FROM r
    ),
    n AS (
      SELECT word, p,
             CASE WHEN do_merge = 1 THEN sym || next_sym ELSE sym END AS sym,
             LAG(do_merge) OVER (PARTITION BY word ORDER BY p) AS consumed
      FROM (
        SELECT *, LEAD(sym) OVER (PARTITION BY word ORDER BY p) AS next_sym
        FROM mm
      ) z
    )
    SELECT word, ROW_NUMBER() OVER (PARTITION BY word ORDER BY p) AS p, sym
    FROM n WHERE consumed IS NULL OR consumed = 0"""
        ).localCheckpoint()
        seq.createOrReplaceTempView(f"x300_seq{q}")
    return spark.sql(
        """
    WITH best1 AS (
      SELECT s1, s2 FROM x300_pc1 ORDER BY cnt DESC, s1, s2 LIMIT 1
    ),
    best2 AS (
      SELECT s1, s2 FROM x300_pc2 ORDER BY cnt DESC, s1, s2 LIMIT 1
    ),
    tot0 AS (
      SELECT CAST(SUM(length(word) * f) AS BIGINT) AS syms0,
             CAST(SUM(f) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_words
      FROM x300_wf
    ),
    len2 AS (SELECT word, MAX(p) AS l2 FROM x300_seq2 GROUP BY word),
    tot2 AS (
      SELECT CAST(SUM(l.l2 * w.f) AS BIGINT) AS syms2
      FROM len2 l JOIN x300_wf w ON l.word = w.word
    )
    SELECT t0.n_words, t0.n_distinct_words,
           t0.syms0 AS syms_chars, t2.syms2 AS syms_after_2_merges,
           CAST((t0.syms0 - t2.syms2) * 10000 DIV t0.syms0 AS BIGINT)
             AS saved_bp,
           b1.s1 || '+' || b1.s2 AS merge1,
           b2.s1 || '+' || b2.s2 AS merge2
    FROM tot0 t0, tot2 t2, best1 b1, best2 b2"""
    )

# -- x301: System-R join-size estimate vs truth ------------------------------
# est = Σ_buckets c_a · c_b / max(d_a, d_b): exact when each bucket's keys
# join uniformly (containment assumption).  The FK join (orders ⋈
# customer) and the 1:N join (orders ⋈ lineitem) bracket the estimator's
# behavior; err_bp is the signed error the cost model would act on.


def _x301_join(name: str, ta: str, ka: str, tb: str, kb: str) -> str:
    return f"""
    ha_{name} AS (
      SELECT {ka} % 64 AS b, COUNT(*) AS c, COUNT(DISTINCT {ka}) AS d
      FROM {ta} GROUP BY {ka} % 64
    ),
    hb_{name} AS (
      SELECT {kb} % 64 AS b, COUNT(*) AS c, COUNT(DISTINCT {kb}) AS d
      FROM {tb} GROUP BY {kb} % 64
    ),
    est_{name} AS (
      SELECT CAST(SUM(a.c * b.c {{div}} GREATEST(a.d, b.d)) AS BIGINT) AS est_rows
      FROM ha_{name} a JOIN hb_{name} b ON a.b = b.b
    ),
    act_{name} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
      FROM {ta} JOIN {tb} ON {ka} = {kb}
    ),
    row_{name} AS (
      SELECT '{name}' AS join_name, e.est_rows, a.actual_rows,
             CAST((e.est_rows - a.actual_rows) * 10000 {{div}} a.actual_rows
                  AS BIGINT) AS err_bp
      FROM est_{name} e, act_{name} a
    )"""


_X301 = f"""
    WITH
    {_x301_join("orders_customer", "orders", "o_custkey", "customer", "c_custkey")},
    {_x301_join("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey")}
    SELECT * FROM row_orders_customer
    UNION ALL SELECT * FROM row_orders_lineitem
    ORDER BY join_name
"""

register_sql(
    "x301_join_size_estimate",
    spark_sql=_X301.format(div="DIV"),
    duckdb_sql=_X301.format(div="//"),
    tags=("ops", "optimizer"),
)
