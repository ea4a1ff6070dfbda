"""Wave 85 (x339–x341): point-in-time features, source KL, hapax screening.

x339 is the POINT-IN-TIME-correct feature join — the feature-store
primitive whose absence causes silent train-serve skew: each label
event must see the latest feature value STRICTLY before its timestamp
(a feature written at the same instant is not yet visible).  Same-ts
correctness is encoded in the sort key, not a filter: the tagged
log-merge orders (ts, tag) with labels BEFORE features at equal ts, so
the ignore-nulls last_value window (the asof.py kernel) structurally
cannot leak a same-instant write.  Staleness rides along by carrying
the feature's own timestamp through a second identical window — both
windows share one (user, ts, tag) sort.  Epoch arithmetic is exact
BIGINT microseconds (unix_micros / epoch_us).

x340 is per-source unigram KL divergence from the corpus distribution —
the drift score used to spot a crawl source whose language shifted.
KL is a sum of MANY per-token float terms, so each term is quantized to
1e12 fixed-point FIRST (FLOOR is direction-consistent for the negative
terms too) and the cross-token sum is exact BIGINT — the x321
quantize-before-sum discipline applied to an information measure.

x341 is hapax concentration — the share of a document's tokens that
are corpus-wide singletons.  OCR garbage, mojibake, and synthetic spam
sit at the top of this ranking (every mangled word is a hapax), making
it the cheap lexical screen next to entropy (x276) and repetition
(x136).  Corpus counts and per-doc shares are exact integers; top 20
by rounded ratio with doc_id tiebreak.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x339: point-in-time feature join ------------------------------------------
# Labels: event_id % 10 = 0; features: the rest. tag 0 = label sorts
# BEFORE tag 1 = feature at equal ts => strict-before visibility.

_X339_FMT = """
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 10 = 0 THEN 0 ELSE 1 END AS tag,
             CASE WHEN event_id % 10 <> 0
                  THEN CAST(ROUND(value * 1000000, 0) AS BIGINT) END AS feat_micro,
             CASE WHEN event_id % 10 <> 0 THEN {epoch_us} END AS feat_us
      FROM events WHERE value IS NOT NULL
    ),
    merged AS (
      SELECT user_id, ts, event_id, tag,
             {lv_feat} AS last_feat_micro,
             {lv_ts} AS last_feat_us
      FROM tagged
    ),
    labels AS (
      SELECT user_id, event_id, last_feat_micro,
             {epoch_us} - last_feat_us AS staleness_us
      FROM merged WHERE tag = 0
    )
    SELECT CAST(user_id % 100 AS BIGINT) AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_labels,
           CAST(SUM(CASE WHEN last_feat_micro IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_with_feature,
           CAST(CAST(SUM(CASE WHEN staleness_us IS NOT NULL
                              THEN CAST(staleness_us AS DECIMAL(28,0)) END)
                AS DECIMAL(38,0)) AS STRING) AS total_staleness_us,
           CAST(CAST(SUM(CASE WHEN last_feat_micro IS NOT NULL
                              THEN CAST(last_feat_micro AS DECIMAL(28,0)) END)
                AS DECIMAL(38,0)) AS STRING) AS feat_checksum_micro
    FROM labels GROUP BY user_id % 100 ORDER BY user_bucket
"""


register_sql(
    "x339_pit_feature_join",
    spark_sql=_X339_FMT.format(
        epoch_us="unix_micros(ts)",
        lv_feat=(
            "last_value(feat_micro, true) OVER (PARTITION BY user_id "
            "ORDER BY ts, tag, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
        lv_ts=(
            "last_value(feat_us, true) OVER (PARTITION BY user_id "
            "ORDER BY ts, tag, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
    ),
    duckdb_sql=_X339_FMT.format(
        epoch_us="epoch_us(ts)",
        lv_feat=(
            "last_value(feat_micro IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, tag, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
        lv_ts=(
            "last_value(feat_us IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, tag, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ),
    ),
    tags=("training", "asof", "window"),
)

# -- x340: per-source unigram KL from corpus -----------------------------------

_X340_FMT = """
    WITH toks AS (
      SELECT source, tok FROM (
        SELECT source, {unnest_tok} AS tok FROM documents
      ) t WHERE tok <> ''
    ),
    src_tok AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM toks GROUP BY source, tok
    ),
    src_tot AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM src_tok GROUP BY source
    ),
    glob_tok AS (
      SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM src_tok GROUP BY tok
    ),
    glob_tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM glob_tok),
    terms AS (
      SELECT st.source,
             CAST(FLOOR(
               (CAST(st.c_st AS DOUBLE) / t.n_s)
               * LN((CAST(st.c_st AS DOUBLE) / t.n_s)
                    / (CAST(g.c_t AS DOUBLE) / gt.n))
               * 1e12) AS BIGINT) AS term_fp
      FROM src_tok st
      JOIN src_tot t ON st.source = t.source
      JOIN glob_tok g ON st.tok = g.tok
      CROSS JOIN glob_tot gt
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(CAST(CAST(SUM(CAST(term_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / 1e12, 8) AS kl_from_corpus
    FROM terms GROUP BY source ORDER BY source
"""

register_sql(
    "x340_kl_source_divergence",
    spark_sql=_X340_FMT.format(unnest_tok="explode(split(lower(text), ' '))"),
    duckdb_sql=_X340_FMT.format(unnest_tok="unnest(string_split(lower(text), ' '))"),
    tags=("quality", "textops"),
)

# -- x341: hapax concentration per document ------------------------------------

_X341_FMT = """
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, {unnest_tok} AS tok FROM documents
      ) t WHERE tok <> ''
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ),
    per_doc AS (
      SELECT tk.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(CASE WHEN v.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      FROM toks tk JOIN vocab v ON tk.tok = v.tok
      GROUP BY tk.doc_id HAVING COUNT(*) >= 20
    )
    SELECT doc_id, n_tok, n_hapax,
           ROUND(CAST(n_hapax AS DOUBLE) / n_tok, 6) AS hapax_ratio
    FROM per_doc
    ORDER BY hapax_ratio DESC, doc_id LIMIT 20
"""

register_sql(
    "x341_hapax_concentration",
    spark_sql=_X341_FMT.format(unnest_tok="explode(split(lower(text), ' '))"),
    duckdb_sql=_X341_FMT.format(unnest_tok="unnest(string_split(lower(text), ' '))"),
    tags=("quality", "textops"),
)
