"""Forty-first extension wave — keyword extraction and lexical statistics:

x227 rake keywords    RAKE-style scoring: phrases are maximal stopword-free
                      token runs (gaps-and-islands over token positions,
                      stopwords = boundaries); word degree = Σ phrase
                      length over phrases containing the word; score =
                      degree/frequency. Pure SQL in both engines.
x228 lexical diversity per-doc type-token ratio, hapax fraction, mean word
                      length — the lexical-richness quality signals

Scale shapes: one posexplode per doc (linear in tokens), islands via the
pos − ROW_NUMBER() counter (one window pass keyed by doc), then token-level
aggregation. No joins wider than token->phrase membership.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_STOPWORDS = "('a', 'the')"

# -- x227: RAKE keyword scores ----------------------------------------------

_X227_FMT = """
    WITH toks AS (
      SELECT doc_id, pos, tok FROM ({tok_src}) t
    ),
    content AS (
      SELECT doc_id, pos, tok,
             CAST(pos AS BIGINT)
               - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM toks WHERE tok NOT IN {stop}
    ),
    phr AS (
      SELECT doc_id, island, CAST(COUNT(*) AS BIGINT) AS plen
      FROM content GROUP BY doc_id, island
    ),
    member AS (
      SELECT c.tok, p.plen
      FROM content c JOIN phr p ON c.doc_id = p.doc_id AND c.island = p.island
    ),
    scores AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS degree
      FROM member GROUP BY tok
    )
    SELECT tok, freq, degree,
           CAST(FLOOR(1e6 * (CAST(degree AS DOUBLE) / freq)) AS BIGINT) AS rake_micro
    FROM scores
    ORDER BY rake_micro DESC, tok LIMIT 50
"""

register_sql(
    "x227_rake_keywords",
    spark_sql=_X227_FMT.format(
        tok_src="SELECT doc_id, posexplode(split(text, ' ')) AS (pos, tok) FROM documents",
        stop=_STOPWORDS,
    ),
    duckdb_sql=_X227_FMT.format(
        tok_src=(
            "SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, u.tok FROM documents, "
            "LATERAL (SELECT UNNEST(string_split(text, ' ')) AS tok, "
            "GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS i) u"
        ),
        stop=_STOPWORDS,
    ),
    tags=("text", "ir", "window"),
)

# -- x228: lexical diversity -------------------------------------------------

_X228_FMT = """
    WITH toks AS (
      SELECT doc_id, tok FROM ({tok_src}) t WHERE tok <> ''
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, tok
    ),
    stats AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             CAST(SUM(c * length(tok)) AS BIGINT) AS char_sum
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types, n_hapax,
           CAST(FLOOR(1e6 * (CAST(n_types AS DOUBLE) / n_tokens)) AS BIGINT) AS ttr_micro,
           CAST(FLOOR(1e6 * (CAST(n_hapax AS DOUBLE) / n_types)) AS BIGINT) AS hapax_micro,
           CAST(FLOOR(1e3 * (CAST(char_sum AS DOUBLE) / n_tokens)) AS BIGINT) AS mean_wordlen_milli
    FROM stats ORDER BY doc_id LIMIT 500
"""

register_sql(
    "x228_lexical_diversity",
    spark_sql=_X228_FMT.format(
        tok_src="SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents"
    ),
    duckdb_sql=_X228_FMT.format(
        tok_src="SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents"
    ),
    tags=("text", "quality"),
)
