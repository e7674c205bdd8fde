"""Text-analysis column expressions: tokenization, n-gram shingles,
portable token hashing, language-ID heuristic, quality scoring,
document fingerprinting.

All of these are *native* column expressions (split / transform / filter /
aggregate higher-order functions), so they run JVM-side inside whole-stage
codegen — no Python boundary — and every one has an exact ANSI-SQL twin,
which is what makes the dedup/text queries oracle-checkable.

Token hashing uses md5 (available and identical in Spark and DuckDB) rather
than Spark's xxhash64/hash, which have no portable SQL equivalent. The
60-bit integer from the first 15 hex chars is uniform enough for bucketing,
MinHash, and SimHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def md5_long(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit integer hash of a string, portable to ANSI SQL
    (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    base = F.concat(F.lit(salt), _c(col)) if salt else _c(col)
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("long")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text
    — the exact-dedup key. Collapse \\s+ BEFORE trim: trim only strips
    spaces, so leading/trailing tabs/newlines would otherwise leak into
    the hash."""
    return F.md5(F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " ")))


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; distinct-ified by the caller when
    set semantics are wanted. Empty array when fewer than n tokens."""
    return F.when(F.size(tok) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.array_join(F.slice(tok, i, n), " "),
        )
    )


def stopword_ratio(tok: Column, words: tuple[str, ...]) -> Column:
    """Fraction of tokens that are in ``words``."""
    return F.size(F.filter(tok, lambda t: t.isin(*words))) / F.greatest(
        F.size(tok), F.lit(1)
    )


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars."""
    c = _c(col)
    return F.length(F.regexp_replace(c, r"[^.,!?;:'\"()\[\]{}-]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )


def mean_token_len(tok: Column) -> Column:
    return F.aggregate(
        tok, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.greatest(F.size(tok), F.lit(1))


# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic, and small enough to inline into oracle SQL.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "on", "for"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"),
    "es": ("el", "la", "y", "los", "de", "que", "un", "una", "es", "en"),
    "de": ("der", "die", "und", "das", "ist", "ein", "eine", "von", "mit", "zu"),
}


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0, 1]: rewards mid-length docs and
    English-stopword presence, penalizes punctuation soup. Deterministic
    and SQL-expressible; the formula itself is a heuristic."""
    c = _c(col)
    tok = tokens(c)
    length_score = F.least(F.size(tok) / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(
        stopword_ratio(tok, LANG_STOPWORDS["en"]) * 5.0, F.lit(1.0)
    )
    punct_penalty = F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    return (
        length_score * 0.4 + stop_score * 0.4 + (1.0 - punct_penalty) * 0.2
    )
