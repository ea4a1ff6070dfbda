"""Wave 70 (x305–x306): shard topology change + vocabulary growth law.

x305 is RENDEZVOUS (highest-random-weight) sharding and its rebalance
guarantee: each doc goes to argmax_j h(doc, j), so adding a 9th shard to
an 8-shard layout moves ONLY the docs whose new shard wins — in
expectation 1/9 of the corpus — while mod-N sharding would reshuffle
~8/9 of it.  The query assigns both topologies with the portable md5
family, counts per-shard membership before/after and the inflow each
shard receives, making the minimal-movement property an oracle-checked
number (the reason production stores shard by HRW/consistent hashing;
x159's static shard assignment is the complementary fixed-topology op).

x306 is the Heaps'-law vocabulary growth curve: distinct word-bigram
count V(T) at growing corpus checkpoints, with the incremental exponent
beta = Δln V / Δln T between consecutive checkpoints (V ≈ K·T^β, β ≈
0.5–0.8 for natural text).  The number a tokenizer/vocab budget is sized
from; deterministic because ln runs on exact BIGINT counts (per-row IEEE
double, no float aggregation).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql
from aetherium_trader_datapipeline_spark.queries_ext66 import _md5i_duck, _md5i_spark

# -- x305: rendezvous-hash shard rebalance -----------------------------------


def _x305_sql(md5i) -> str:
    h = md5i("CAST(d.doc_id AS STRING) || '-' || CAST(s.j AS STRING)", 1, 12)
    return f"""
    WITH d AS (SELECT doc_id FROM documents),
    s9 AS ({{gen9}}),
    w AS (
      SELECT d.doc_id, s.j, {h} AS h
      FROM d CROSS JOIN s9 s
    ),
    a8 AS (
      SELECT doc_id, j AS j8 FROM (
        SELECT doc_id, j,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, j) AS rn
        FROM w WHERE j < 8
      ) t WHERE rn = 1
    ),
    a9 AS (
      SELECT doc_id, j AS j9 FROM (
        SELECT doc_id, j,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, j) AS rn
        FROM w
      ) t WHERE rn = 1
    ),
    joined AS (
      SELECT a8.doc_id, a8.j8, a9.j9 FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id
    )
    SELECT CAST(s.j AS BIGINT) AS shard,
           CAST(COUNT(CASE WHEN joined.j8 = s.j THEN 1 END) AS BIGINT) AS n_before,
           CAST(COUNT(CASE WHEN joined.j9 = s.j THEN 1 END) AS BIGINT) AS n_after,
           CAST(COUNT(CASE WHEN joined.j9 = s.j AND joined.j8 <> s.j THEN 1 END)
                AS BIGINT) AS moved_in
    FROM s9 s LEFT JOIN joined ON joined.j8 = s.j OR joined.j9 = s.j
    GROUP BY s.j ORDER BY shard
"""


register_sql(
    "x305_rendezvous_shard",
    spark_sql=_x305_sql(_md5i_spark).format(
        gen9="SELECT explode(sequence(0, 8)) AS j"
    ),
    duckdb_sql=_x305_sql(_md5i_duck)
    .replace("AS STRING", "AS VARCHAR")
    .format(gen9="SELECT unnest(range(0, 9)) AS j"),
    tags=("ops", "sharding"),
)

# -- x306: Heaps'-law vocabulary growth --------------------------------------

_X306_FMT = """
    WITH cps AS ({gen_cp}),
    toks AS (
      SELECT doc_id, idx, w FROM ({tok_gen}) z
    ),
    grams AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS g
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
    ),
    curve AS (
      SELECT c.cp,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(DISTINCT g.g) AS BIGINT) AS v_distinct
      FROM cps c JOIN grams g ON g.doc_id < c.cp
      GROUP BY c.cp
    )
    SELECT cp AS n_docs, n_grams, v_distinct,
           ROUND(
             (LN(v_distinct) - LN(LAG(v_distinct) OVER (ORDER BY cp)))
             / (LN(n_grams) - LN(LAG(n_grams) OVER (ORDER BY cp))), 4
           ) AS heaps_beta
    FROM curve ORDER BY n_docs
"""

register_sql(
    "x306_heaps_law",
    # doc_id < 300 (the max checkpoint) is pushed into the token CTE by
    # hand: the bound lives in a 4-row values relation Catalyst cannot see
    # through, and without it the gram build runs over the WHOLE corpus —
    # measured 22.4 s at 100× vs flat with the pushdown.
    spark_sql=_X306_FMT.format(
        gen_cp="SELECT explode(array(50, 100, 200, 300)) AS cp",
        tok_gen="""
      SELECT doc_id, idx, w FROM (SELECT * FROM documents WHERE doc_id < 300) d
      LATERAL VIEW posexplode(split(lower(text), ' ')) t AS idx, w""",
    ),
    duckdb_sql=_X306_FMT.format(
        gen_cp="SELECT unnest([50, 100, 200, 300]) AS cp",
        tok_gen="""
      SELECT doc_id, i AS idx, ws[i] AS w FROM (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
        WHERE doc_id < 300),
        LATERAL unnest(generate_series(1, len(ws))) AS t(i)""",
    ),
    tags=("text", "stats", "llm"),
)
