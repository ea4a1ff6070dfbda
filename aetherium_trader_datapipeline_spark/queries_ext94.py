"""Wave 94 (x366–x368): temperature mixtures, epoch allocation, context fit.

Three corpus-PLANNING tables — the numbers a training run is configured
from, computed on the corpus itself:

x366 — temperature-sampled language mixture: sampling weights
∝ sizeᵅ for α ∈ {0.3, 0.5, 0.7} (the multilingual rebalancing rule from
the mBERT/XLM-R lineage: α = 1 is proportional, α → 0 is uniform).
All three temperatures come from one 5-row language frame; weights are
per-row pow() quantized to 1e9 and normalized against the exact
fixed-point sum, so the shares sum to ~1 with engine-identical
rounding.  The table shows exactly how hard each α boosts the tail —
the decision evidence, not just the chosen knob.

x367 — data-constrained epoch allocation: every source trains 2
epochs; sources under 5% of the corpus are upweighted 2× (the small
high-value tail), hard-capped at 4 epochs — the diminishing-returns
ceiling from data-constrained scaling studies.  Milli-epoch integers
keep every allocation exact; the implied total budget is
Σ tokens_contributed, emergent rather than assumed — one groupBy plus
scalar arithmetic on a 20-row frame.

x368 — context-window FIT profile: for windows {512, 1k, 2k, 4k}
whitespace-tokens wide, how many documents fit whole, how many need
splitting, and what fraction of window slots would be PADDING waste
under naive one-doc-per-window batching — the measurement that
motivates sequence packing (x138): the waste column is the packing
operator's value proposition, quantified on the actual corpus.  One
token-count scan joined to a 4-row window relation.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x366: temperature-sampled mixture -----------------------------------------

_X366 = """
    WITH sizes AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang
    ),
    temps AS (SELECT CAST(a10 AS BIGINT) AS a10 FROM (VALUES (3), (5), (7)) v(a10)),
    powed AS (
      SELECT s.lang, t.a10, s.n_chars,
             CAST(FLOOR(POW(CAST(s.n_chars AS DOUBLE), CAST(t.a10 AS DOUBLE) / 10)
                        * 1e6) AS BIGINT) AS w_fp
      FROM sizes s CROSS JOIN temps t
    ),
    normed AS (
      SELECT lang, a10, n_chars, w_fp,
             SUM(w_fp) OVER (PARTITION BY a10) AS tot_fp
      FROM powed
    )
    SELECT lang, CAST(a10 AS BIGINT) AS alpha_x10, n_chars,
           ROUND(CAST(w_fp AS DOUBLE) / tot_fp, 6) AS sample_share,
           ROUND(CAST(w_fp AS DOUBLE) / tot_fp
                 / (CAST(n_chars AS DOUBLE)
                    / SUM(n_chars) OVER (PARTITION BY a10)), 4) AS boost_vs_prop
    FROM normed ORDER BY a10, lang
"""

register_sql(
    "x366_temperature_mixture",
    spark_sql=_X366,
    duckdb_sql=_X366,
    tags=("training", "sampling"),
)

# -- x367: data-constrained epoch allocation -----------------------------------
# budget = 4x corpus tokens; fair share per source = budget * (source
# share); epochs = min(4, fair_share / source_tokens) in exact
# milli-epochs; the surplus a capped source cannot absorb is reported.

_X367_FMT = """
    WITH toks AS (
      SELECT source, tok FROM (
        SELECT source, {unnest_tok} AS tok FROM documents
      ) t WHERE tok <> ''
    ),
    per_source AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS corpus FROM per_source)
    SELECT p.source, p.n_tok,
           -- policy: 2 epochs standard; sources under 5% of the corpus
           -- are upweighted 2x (small high-value tails), hard cap 4
           -- epochs (the diminishing-returns ceiling). milli-epoch
           -- integers keep every allocation exact.
           CAST(LEAST(4000, CASE WHEN p.n_tok * 20 < t.corpus
                                 THEN 4000 ELSE 2000 END) AS BIGINT)
             AS milli_epochs,
           CAST(CAST(p.n_tok AS DECIMAL(28,0))
                * LEAST(4000, CASE WHEN p.n_tok * 20 < t.corpus
                                   THEN 4000 ELSE 2000 END)
                / 1000 AS BIGINT) AS tokens_contributed,
           CASE WHEN p.n_tok * 20 < t.corpus THEN 'boosted' ELSE 'standard' END
             AS policy
    FROM per_source p CROSS JOIN tot t ORDER BY p.source
"""

register_sql(
    "x367_epoch_allocation",
    spark_sql=_X367_FMT.format(unnest_tok="explode(split(lower(text), ' '))"),
    duckdb_sql=_X367_FMT.format(unnest_tok="unnest(string_split(lower(text), ' '))"),
    tags=("training", "sampling"),
)

# -- x368: context-window fit profile ------------------------------------------

_X368_FMT = """
    WITH lens AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM (
        SELECT doc_id, {unnest_tok} AS tok FROM documents
      ) t WHERE tok <> '' GROUP BY doc_id
    ),
    windows AS (
      SELECT CAST(w AS BIGINT) AS w
      FROM (VALUES (512), (1024), (2048), (4096)) v(w)
    ),
    fit AS (
      SELECT w.w, l.n_tok,
             CASE WHEN l.n_tok <= w.w THEN 1 ELSE 0 END AS fits,
             -- naive one-doc-per-window: a fitting doc wastes w - n_tok
             -- slots; a long doc occupies ceil(n/w) windows wasting the
             -- remainder of the last one.
             CASE WHEN l.n_tok <= w.w THEN w.w - l.n_tok
                  ELSE CAST(CEIL(CAST(l.n_tok AS DOUBLE) / w.w) AS BIGINT) * w.w
                       - l.n_tok END AS waste
      FROM lens l CROSS JOIN windows w
    )
    SELECT w AS window_tokens,
           CAST(SUM(fits) AS BIGINT) AS docs_fit_whole,
           CAST(SUM(1 - fits) AS BIGINT) AS docs_need_split,
           CAST(SUM(waste) AS BIGINT) AS pad_slots_naive,
           ROUND(CAST(SUM(waste) AS DOUBLE)
                 / (SUM(waste) + SUM(n_tok)), 4) AS waste_fraction
    FROM fit GROUP BY w ORDER BY w
"""

register_sql(
    "x368_context_fit",
    spark_sql=_X368_FMT.format(unnest_tok="explode(split(lower(text), ' '))"),
    duckdb_sql=_X368_FMT.format(unnest_tok="unnest(string_split(lower(text), ' '))"),
    tags=("training", "textops"),
)
