"""Wave 102 (x387–x389): text-quality screens — readability, encoding
damage, lexical diversity.

Three per-document curation features the quality-scoring tier (x43,
x158) doesn't cover, each a standard pretraining-corpus filter signal:

x387 — Flesch-Kincaid grade via the vowel-group syllable heuristic:
words = whitespace tokens, sentences = 1 + terminal-punctuation count
(floored at 1 — the fixture corpus has no sentence punctuation, and a
zero denominator is a real production hazard worth encoding), syllables
= maximal [aeiouy]+ runs.  FK = 0.39·(W/S) + 11.8·(Syl/W) − 15.59.
All three counts are integer regexp/array counts (engine-identical);
the grade is one per-ROW IEEE expression — no cross-row float
accumulation, so no quantization needed.

x388 — mojibake/encoding-damage screen: C0 control characters (minus
tab/newline/CR), U+FFFD replacement characters, and the non-ASCII
share.  The classic symptoms of a bad charset transcode; CCNet and
Gopher both gate on variants of this.  Counts via codepoint-class
regexp (Java regex and RE2 agree on these classes); the flag is pure
integer logic.

x389 — lexical diversity: type-token ratio and hapax-legomena share
per document (one explode + per-doc/word groupBy — the word-histogram
shuffle is bounded by total token count, same shape as x36/x120).  A
low TTR on a long document is boilerplate/template spam; high hapax
share on a short one is gibberish — the two-sided screen Gopher's
repetition rules approximate.

Scale: x387/x388 are map-only column expressions (whole-stage codegen,
no shuffle); x389 is one token-level groupBy with partial aggregation.
All emit one row per document (bounded projections ride the scan).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x387: Flesch-Kincaid grade -------------------------------------------------

_X387_FMT = """
    WITH f AS (
      SELECT doc_id,
             CAST({n_words} AS BIGINT) AS n_words,
             CAST(GREATEST(1, {n_sents}) AS BIGINT) AS n_sents,
             CAST({n_syll} AS BIGINT) AS n_syll
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, n_words, n_sents, n_syll,
           ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sents)
                 + 11.8 * (CAST(n_syll AS DOUBLE) / n_words) - 15.59, 4)
             AS fk_grade
    FROM f WHERE n_words > 0 ORDER BY doc_id
"""

register_sql(
    "x387_fk_readability",
    spark_sql=_X387_FMT.format(
        n_words="size(split(lower(text), '\\\\s+'))",
        n_sents="regexp_count(text, '[.!?]')",
        n_syll="regexp_count(lower(text), '[aeiouy]+')",
    ),
    duckdb_sql=_X387_FMT.format(
        n_words="len(string_split_regex(lower(text), '\\s+'))",
        n_sents="length(regexp_extract_all(text, '[.!?]'))",
        n_syll="length(regexp_extract_all(lower(text), '[aeiouy]+'))",
    ),
    tags=("curation", "text"),
)

# -- x388: mojibake / encoding-damage screen -----------------------------------

_X388_FMT = """
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST({n_ctrl} AS BIGINT) AS n_ctrl,
             CAST({n_repl} AS BIGINT) AS n_replacement,
             CAST({n_nonascii} AS BIGINT) AS n_non_ascii
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, n_chars, n_ctrl, n_replacement, n_non_ascii,
           ROUND(CAST(n_non_ascii AS DOUBLE) / n_chars, 6) AS non_ascii_ratio,
           CASE WHEN n_ctrl > 0 OR n_replacement > 0
                     OR n_non_ascii * 10 > n_chars * 3
                THEN 1 ELSE 0 END AS suspect
    FROM f ORDER BY doc_id
"""

# Spark SQL string literals process backslash escapes (the regex engine
# must receive \x00, so the SQL text needs \\x00); DuckDB standard
# literals do not (the SQL text carries \x00 directly). Verified
# empirically: regexp_count('A', '[\\x41]') is 0 on Spark / 1-per-A on
# DuckDB, and vice versa for the doubled form.
_CTRL_SPARK = "[\\\\x00-\\\\x08\\\\x0B\\\\x0C\\\\x0E-\\\\x1F]"
_CTRL_DUCK = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

register_sql(
    "x388_mojibake_screen",
    spark_sql=_X388_FMT.format(
        n_ctrl=f"regexp_count(text, '{_CTRL_SPARK}')",
        n_repl="regexp_count(text, '�')",
        n_nonascii="regexp_count(text, '[^\\\\x00-\\\\x7F]')",
    ),
    duckdb_sql=_X388_FMT.format(
        n_ctrl=f"length(regexp_extract_all(text, '{_CTRL_DUCK}'))",
        n_repl="length(regexp_extract_all(text, '�'))",
        n_nonascii="length(regexp_extract_all(text, '[^\\x00-\\x7F]'))",
    ),
    tags=("curation", "text"),
)

# -- x389: lexical diversity (TTR + hapax share) -------------------------------

_X389_FMT = """
    WITH words AS (
      SELECT doc_id, w
      FROM ({tok_gen}) z WHERE w <> ''
    ),
    hist AS (
      SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
           ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_share
    FROM hist GROUP BY doc_id ORDER BY doc_id
"""

_TOKS_SPARK = """
      SELECT doc_id, explode(split(lower(text), '\\\\s+')) AS w
      FROM documents WHERE length(text) > 0"""
_TOKS_DUCK = """
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
      FROM documents WHERE length(text) > 0"""

register_sql(
    "x389_lexical_diversity",
    spark_sql=_X389_FMT.format(tok_gen=_TOKS_SPARK),
    duckdb_sql=_X389_FMT.format(tok_gen=_TOKS_DUCK),
    tags=("curation", "text"),
)
