"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All JVM-side Column expressions (whole-stage-codegen friendly, no Python
in the hot path) and all reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword profiles for heuristic language ID
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}

#: BPE-ish token pattern: alnum runs OR single non-space punctuation —
#: approximates subword pre-tokenization for budget estimation.
BPE_ISH_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def whitespace_token_count(col: Column) -> Column:
    """Whitespace token count (0 for blank)."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (regexp-based, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def _word_array(col: Column) -> Column:
    t = F.trim(F.lower(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    words = _word_array(col)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def mean_word_len(col: Column) -> Column:
    words = _word_array(col)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(words) > 0, total / F.size(words)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: length band + low punctuation +
    sane mean word length + some stopwords (Gopher-rules-style heuristic
    mix; each component clamped to [0,1] and averaged)."""
    n_words = whitespace_token_count(col)
    len_component = F.least(n_words / F.lit(50.0), F.lit(1.0)) * F.when(
        n_words <= 10000, F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_component = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    mwl = mean_word_len(col)
    mwl_component = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    sw_component = F.least(stopword_ratio(col, "en") * 5, F.lit(1.0))
    return (len_component + punct_component + mwl_component + sw_component) / 4


def lang_id(col: Column) -> Column:
    """Heuristic language ID: the profile with the highest stopword hit
    ratio, 'und' when nothing hits."""
    words = _word_array(col)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in LANG_STOPWORDS:
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        sc = F.when(
            F.size(words) > 0,
            F.size(F.filter(words, lambda w: F.array_contains(sw, w))) / F.size(words),
        ).otherwise(F.lit(0.0))
        better = sc > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, sc).otherwise(best_score)
    return best_lang


def fingerprint(col: Column) -> Column:
    """Deterministic 64-bit-ish document fingerprint: md5 of the
    normalized text, first 16 hex digits (content-defined identity for
    exact dedup across shards; md5 matches DuckDB bit-for-bit)."""
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.substring(F.md5(norm), 1, 16)


def robust_fingerprint(col: Column, shingle_n: int = 3) -> Column:
    """Order-robust fingerprint: minimum shingle hash (MinHash with one
    permutation) — stable under small edits far from the minimum."""
    from emailindexer_spark.operators.dedup import md5_int32, word_shingles

    return F.array_min(F.transform(word_shingles(col, shingle_n), md5_int32))


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass quality profile of a document table."""
    c = F.col(text_col)
    return df.select(
        "*",
        whitespace_token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio_en"),
        mean_word_len(c).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
