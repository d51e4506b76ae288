"""Text-analysis operators over a document corpus (documents.text).

All hot-path logic is built-in pyspark.sql.functions (JVM, codegen):
tokenization via regex split, language-ID via marker-word regexp
counts, quality scoring from integer counts (int arithmetic → identical
doubles on any engine), fingerprinting via md5 (hex-identical across
Spark and DuckDB, which the oracle twins rely on).

Beyond-reference capability (SURVEY.md §7 phase 3 / BASELINE.json
north star). No reference citation — the reference has no text ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker words per language, checked in this preference order (first
# max wins ties). The oracle SQL mirrors the exact same order.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|is|and|of)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}
# CJK codepoint presence; Java regex syntax (oracle uses RE2's \x{...}).
CJK_PATTERN_JAVA = "[一-鿿]"

EN_STOPWORDS_PATTERN = r"\b(the|a|is|and|of|to|in|that|it|for)\b"
PUNCT_PATTERN = r"[.,;:!?]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lower-cased, trimmed text.

    Matches DuckDB ``regexp_split_to_array(trim(lower(x)), '\\s+')``
    exactly, including the empty-string → [''] edge.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = tokens(text_col)
    return df.withColumn("n_tokens", F.size(t).cast("long")).withColumn(
        "n_distinct_tokens", F.size(F.array_distinct(t)).cast("long")
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-hit counts (bigint) over lowercased text."""
    low = F.lower(F.col(text_col))
    scores = {
        lang: F.regexp_count(low, F.lit(pat)).cast("long")
        for lang, pat in LANG_MARKERS.items()
    }
    scores["zh"] = F.regexp_count(low, F.lit(CJK_PATTERN_JAVA)).cast("long")
    return scores


def predict_lang(text_col: str = "text") -> Column:
    """Argmax language with deterministic preference-order tie-break;
    'unknown' when no marker hits at all."""
    s = lang_scores(text_col)
    order = ["en", "de", "fr", "es", "zh"]
    all_zero = None
    for lang in order:
        z = s[lang] == 0
        all_zero = z if all_zero is None else (all_zero & z)
    expr = F.when(all_zero, F.lit("unknown"))
    for i, lang in enumerate(order):
        cond = None
        for other in order[i + 1 :]:
            c = s[lang] >= s[other]
            cond = c if cond is None else (cond & c)
        expr = expr.when(cond if cond is not None else F.lit(True), F.lit(lang))
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer-count features + a deterministic [0,1] quality score.

    Score: length prior (saturating at 50 tokens) × (1 − punct ratio)
    × (0.5 + 0.5 × stopword-hit ratio). All ratios are int/int
    divisions → bit-identical doubles on Spark and DuckDB.
    """
    low = F.lower(F.col(text_col))
    t = tokens(text_col)
    out = (
        df.withColumn("n_chars_obs", F.length(text_col).cast("long"))
        .withColumn("n_tokens", F.size(t).cast("long"))
        .withColumn("n_punct", F.regexp_count(low, F.lit(PUNCT_PATTERN)).cast("long"))
        .withColumn(
            "n_stopwords",
            F.regexp_count(low, F.lit(EN_STOPWORDS_PATTERN)).cast("long"),
        )
    )
    return out.withColumn(
        "quality_score",
        F.least(F.lit(1.0), F.col("n_tokens") / F.lit(50.0))
        * (F.lit(1.0) - F.col("n_punct") / F.col("n_tokens"))
        * (F.lit(0.5) + F.lit(0.5) * (F.col("n_stopwords") / F.col("n_tokens"))),
    )


def fingerprint(col: Column | str) -> Column:
    """Full-text md5 hex fingerprint (engine-portable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def fingerprint32(col: Column | str) -> Column:
    """First 32 bits of the md5 as a bigint — compact dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
