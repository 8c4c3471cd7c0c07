"""Text-analysis operators over a document table (training-data pipeline
surface; no counterpart in the reference — SURVEY §7.4 extensions).

All column builders are pure Catalyst expressions (split / higher-order
array functions / md5) — no Python UDFs, so they run JVM-side inside
whole-stage codegen and scale linearly with input size. Everything keys off
a single ``text`` column and is embarrassingly parallel: no shuffles at
all except where a caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_shingles(text: Column, n: int) -> Column:
    """Word n-gram shingles as strings; a document with fewer than n tokens
    yields its full text as the single shingle."""
    t = tokens(text)
    m = F.greatest(F.size(t) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )


def stopword_ratio(text: Column) -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return hits / F.size(t)


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-space chars / token count."""
    return F.length(F.regexp_replace(text, " ", "")).cast("double") / token_count(text)


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0, ~1]: rewards stopword presence
    (fluency proxy) and moderate token length; penalizes very short docs."""
    n = token_count(text)
    return (
        0.5 * stopword_ratio(text)
        + 0.3 * F.least(n / F.lit(40.0), F.lit(1.0))
        + 0.2 * F.least(avg_token_len(text) / F.lit(6.0), F.lit(1.0))
    )


def lang_guess(text: Column) -> Column:
    """Stopword-presence language heuristic (the corpus vocabulary is
    English-ish regardless of the labeled ``lang`` column)."""
    return F.when(stopword_ratio(text) > 0.05, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint_md5(text: Column) -> Column:
    """Whole-document content fingerprint."""
    return F.md5(text)


def shingle_fingerprint(text: Column, n: int = 5) -> Column:
    """Min-hash-style content fingerprint over word n-gram shingles: the
    lexicographic min of the shingle md5s (stable under reordering of
    surrounding content; the rolling-hash analog of the reference-free
    document fingerprint)."""
    return F.array_min(F.transform(word_shingles(text, n), F.md5))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document text statistics table."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        avg_token_len(t).alias("avg_token_len"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality_score"),
        lang_guess(t).alias("lang_guess"),
        fingerprint_md5(t).alias("fingerprint"),
    )
