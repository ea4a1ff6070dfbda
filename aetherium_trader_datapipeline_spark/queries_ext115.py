"""Wave 115 (x418–x420): index & columnar-storage planning.

The retrieval stack (x120 TF-IDF, x178 BM25, x199/x200 phrase & boolean)
gets its physical-layout layer: before building a 100 TB inverted index
or choosing parquet encodings, a data team sizes them from statistics.

x418 — posting-list delta compression: per term, doc-id gaps (postings
sorted by doc_id; LAG within the term partition) costed in Elias-gamma
bits 2·⌊log2 v⌋+1, computed exactly as 2·(LENGTH(bin(v))−1)+1 — both
engines' bin() drops leading zeros, so the bit count is pure integer.
Reports gamma vs plain-64-bit cost per high-df term.

x419 — parquet-style encoding decision per column: distinct count sizes
the dictionary (index width = ⌈log2 ndv⌉ via bin(ndv−1)), value-change
runs WITHIN each l_orderkey group size RLE (parquet RLE state resets per
page, so per-group runs is the honest model — and it keeps the window
partitioned, never a single global sort), plain is n·width.  Emits the
argmin encoding per column, the planner's actual choice.

x420 — MaxScore/WAND static prunability: per term, the max impact score
(tf · 1e9-quantized idf — an exact BIGINT product) and the share of
postings scoring below half the max, i.e. skippable under a θ = max/2
top-k threshold.  The classic justification for impact-ordered posting
lists.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_TOK_SPARK = """
      SELECT doc_id, w AS term
      FROM documents LATERAL VIEW explode(split(lower(text), ' ')) t AS w
      WHERE w != ''
"""
_TOK_DUCK = """
      SELECT doc_id, w AS term FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents) u
      WHERE w != ''
"""

# -- x418: Elias-gamma posting-list sizing --------------------------------------

_X418 = """
    WITH tok AS ({tok}),
    postings AS (
      SELECT DISTINCT term, doc_id FROM tok
    ),
    gaps AS (
      SELECT term,
             COALESCE(doc_id - LAG(doc_id)
                      OVER (PARTITION BY term ORDER BY doc_id),
                      doc_id + 1) AS gap
      FROM postings
    ),
    costed AS (
      SELECT term,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(2 * (LENGTH({bin}(gap)) - 1) + 1) AS BIGINT)
               AS gamma_bits,
             CAST(64 * COUNT(*) AS BIGINT) AS plain_bits
      FROM gaps GROUP BY term
    )
    SELECT term, df, gamma_bits, plain_bits,
           ROUND(CAST(plain_bits AS DOUBLE) / gamma_bits, 4)
             AS compression_x
    FROM costed ORDER BY df DESC, term LIMIT 30
"""

register_sql(
    "x418_posting_delta_bits",
    spark_sql=_X418.format(tok=_TOK_SPARK, bin="bin"),
    duckdb_sql=_X418.format(tok=_TOK_DUCK, bin="bin"),
    tags=("retrieval", "storage"),
)

# -- x419: columnar encoding decision -------------------------------------------

_X419 = """
    WITH flags AS (
      -- ONE windowed pass: all four LAGs share the (l_orderkey,
      -- l_linenumber) sort, so the table is shuffled once, not 4x
      SELECT
        CASE WHEN l_returnflag = LAG(l_returnflag) OVER w
             THEN 0 ELSE 1 END AS chg_rf,
        CASE WHEN l_linestatus = LAG(l_linestatus) OVER w
             THEN 0 ELSE 1 END AS chg_ls,
        CASE WHEN l_quantity = LAG(l_quantity) OVER w
             THEN 0 ELSE 1 END AS chg_qt,
        CASE WHEN l_partkey = LAG(l_partkey) OVER w
             THEN 0 ELSE 1 END AS chg_pk
      FROM lineitem
      -- value-column tiebreakers make the layout a TOTAL order (the
      -- synthetic (l_orderkey, l_linenumber) pair is NOT unique — the
      -- x574 convention): without them the LAG order inside ties is
      -- engine-nondeterministic and the run counts diverged at sf0.01
      -- (caught by the r7 full-registry driver-style sweep)
      WINDOW w AS (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_returnflag, l_linestatus,
                            l_quantity, l_partkey)
    ),
    runs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(chg_rf) AS BIGINT) AS runs_rf,
             CAST(SUM(chg_ls) AS BIGINT) AS runs_ls,
             CAST(SUM(chg_qt) AS BIGINT) AS runs_qt,
             CAST(SUM(chg_pk) AS BIGINT) AS runs_pk
      FROM flags
    ),
    -- each ndv scan prunes to one column and collapses map-side
    ndv_rf AS (SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS ndv
               FROM lineitem),
    ndv_ls AS (SELECT CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS ndv
               FROM lineitem),
    ndv_qt AS (SELECT CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv
               FROM lineitem),
    ndv_pk AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv
               FROM lineitem),
    onerow AS (
      -- the expensive windowed scan is referenced exactly ONCE: engines
      -- inline CTEs, so a 4-branch UNION ALL over `runs` would recompute
      -- the window shuffle four times (measured 36 s vs 11 s at 100x)
      SELECT r.n, r.runs_rf, r.runs_ls, r.runs_qt, r.runs_pk,
             a.ndv AS ndv_rf, b.ndv AS ndv_ls, c.ndv AS ndv_qt,
             d.ndv AS ndv_pk
      FROM runs r CROSS JOIN ndv_rf a CROSS JOIN ndv_ls b
      CROSS JOIN ndv_qt c CROSS JOIN ndv_pk d
    ),
    dims AS (
      SELECT 'l_returnflag' AS col, 1 AS width
      UNION ALL SELECT 'l_linestatus', 1
      UNION ALL SELECT 'l_quantity', 8
      UNION ALL SELECT 'l_partkey', 8
    ),
    cols AS (
      SELECT d.col, d.width, o.n,
             CASE d.col WHEN 'l_returnflag' THEN o.ndv_rf
                        WHEN 'l_linestatus' THEN o.ndv_ls
                        WHEN 'l_quantity' THEN o.ndv_qt
                        ELSE o.ndv_pk END AS ndv,
             CASE d.col WHEN 'l_returnflag' THEN o.runs_rf
                        WHEN 'l_linestatus' THEN o.runs_ls
                        WHEN 'l_quantity' THEN o.runs_qt
                        ELSE o.runs_pk END AS runs
      FROM onerow o CROSS JOIN dims d
    ),
    sized AS (
      SELECT col, n, ndv, runs,
             CAST(n * width * 8 AS BIGINT) AS plain_bits,
             CAST(ndv * width * 8
                  + n * (CASE WHEN ndv > 1
                              THEN LENGTH({bin}(ndv - 1)) ELSE 1 END)
                  AS BIGINT) AS dict_bits,
             CAST(runs * (width * 8 + 8) AS BIGINT) AS rle_bits
      FROM cols
    )
    SELECT col, n, ndv, runs, plain_bits, dict_bits, rle_bits,
           CASE WHEN rle_bits <= dict_bits AND rle_bits <= plain_bits
                  THEN 'rle'
                WHEN dict_bits <= plain_bits THEN 'dict'
                ELSE 'plain' END AS best_encoding
    FROM sized ORDER BY col
"""


register_sql(
    "x419_encoding_size_estimate",
    headline=True,
    spark_sql=_X419.format(bin="bin"),
    duckdb_sql=_X419.format(bin="bin"),
    tags=("storage", "profiling"),
)

# -- x420: MaxScore static prunability ------------------------------------------

_X420 = """
    WITH tok AS ({tok}),
    tf AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY term, doc_id
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
    scored AS (
      -- impact score tf * idf_fp is an exact BIGINT product
      SELECT tf.term, df.df,
             tf.tf * CAST(FLOOR(LN((n.n + 1.0) / (df.df + 1.0)) * 1e9)
                          AS BIGINT) AS score_fp
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    tmax AS (
      -- groupBy, not a window: the fixture vocabulary is small, so a
      -- per-term window would sort the full posting set in a handful of
      -- hot partitions; the partial-agg MAX collapses map-side and the
      -- tiny frame joins back (broadcast under AQE)
      SELECT term, CAST(MAX(score_fp) AS BIGINT) AS max_fp
      FROM scored GROUP BY term
    ),
    per_term AS (
      SELECT s.term, s.df,
             CAST(MAX(t.max_fp) AS BIGINT) AS max_score_fp,
             CAST(SUM(CASE WHEN 2 * s.score_fp < t.max_fp THEN 1 ELSE 0 END)
                  AS BIGINT) AS prunable
      FROM scored s JOIN tmax t ON s.term = t.term
      GROUP BY s.term, s.df
    )
    SELECT term, df,
           ROUND(max_score_fp / 1e9, 6) AS max_score,
           ROUND(CAST(prunable AS DOUBLE) / df, 6) AS prunable_share
    FROM per_term ORDER BY df DESC, term LIMIT 30
"""

register_sql(
    "x420_maxscore_prune",
    spark_sql=_X420.format(tok=_TOK_SPARK),
    duckdb_sql=_X420.format(tok=_TOK_DUCK),
    tags=("retrieval", "storage"),
)
