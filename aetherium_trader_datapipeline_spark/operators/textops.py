"""Text analysis operators for the training-data pipeline surface.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
codegen) — no Python in the per-row path. Each operator has an equivalent
ANSI-SQL formulation used as its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language function-word lexicons for the n-gram/stopword heuristic.
LANG_LEXICON: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "los", "las", "es", "un", "una", "en", "que"],
}
CJK_PATTERN = r"[一-鿿]"

STOPWORDS_EN = LANG_LEXICON["en"]

# "BPE-ish" tokenizer: word pieces OR single non-space punctuation — the
# standard pre-tokenization regex shape.
BPE_TOKEN_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def _lex_hits(words_col, lexicon: list[str]):
    arr = ", ".join(f"'{w}'" for w in lexicon)
    return F.expr(f"size(filter({words_col}, w -> w IN ({arr})))")


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Heuristic language ID: CJK char presence → zh, else argmax of
    function-word hits with a fixed tie order (de, es, fr, else en)."""
    with_words = df.withColumn("__w", F.split(F.lower(F.col(text_col)), " "))
    scored = (
        with_words.withColumn("__s_en", _lex_hits("__w", LANG_LEXICON["en"]))
        .withColumn("__s_de", _lex_hits("__w", LANG_LEXICON["de"]))
        .withColumn("__s_fr", _lex_hits("__w", LANG_LEXICON["fr"]))
        .withColumn("__s_es", _lex_hits("__w", LANG_LEXICON["es"]))
        .withColumn("__zh", F.col(text_col).rlike(CJK_PATTERN))
    )
    pred = (
        F.when(F.col("__zh"), F.lit("zh"))
        .when(F.expr("__s_de > greatest(__s_en, __s_es, __s_fr)"), F.lit("de"))
        .when(F.expr("__s_es > greatest(__s_en, __s_fr)"), F.lit("es"))
        .when(F.expr("__s_fr > __s_en"), F.lit("fr"))
        .otherwise(F.lit("en"))
    )
    return scored.withColumn(out_col, pred).drop(
        "__w", "__s_en", "__s_de", "__s_fr", "__s_es", "__zh"
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features per document.

    Adds: n_chars_m, n_tokens, avg_token_len, punct_ratio, stop_ratio,
    quality (a simple composite in [0,1])."""
    words = F.split(F.lower(F.col(text_col)), " ")
    n_chars = F.length(text_col)
    n_tokens = F.size(words)
    stripped = F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", "")
    punct_ratio = F.round(F.length(stripped) / n_chars, 4)
    stop_ratio = F.round(_lex_hits(f"split(lower({text_col}), ' ')", STOPWORDS_EN) / n_tokens, 4)
    avg_tok = F.round(n_chars / n_tokens, 4)
    quality = F.round(
        F.when(n_tokens >= 5, 1.0).otherwise(0.2)
        * (1.0 - F.least(punct_ratio * 2, F.lit(1.0)))
        * F.when(avg_tok.between(2.0, 12.0), 1.0).otherwise(0.5),
        4,
    )
    return (
        df.withColumn("n_chars_m", n_chars.cast("bigint"))
        .withColumn("n_tokens", n_tokens.cast("bigint"))
        .withColumn("avg_token_len", avg_tok)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality", quality)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per row."""
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.col(text_col), r"\s+")).cast("bigint")
    ).withColumn(
        "bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)).cast("bigint"),
    )


FINGERPRINT_MOD = 1_000_000_007


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint, engine-portable.

    Position-weighted token hash: sum_i i * (131*len(w_i) + ascii(w_i[0]))
    mod 1e9+7. Commutative addition keeps the aggregation order-independent
    (deterministic under any partitioning) while position weights keep the
    fingerprint order-sensitive — unlike a left-fold rolling hash, this
    parallelizes as a plain partial+final SUM.
    """
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "w"),
    )
    term = (F.col("pos") + 1) * (F.length("w") * 131 + F.coalesce(F.ascii("w"), F.lit(0)))
    return (
        words.groupBy(id_col)
        .agg((F.sum(term) % FINGERPRINT_MOD).alias("fp"))
    )
