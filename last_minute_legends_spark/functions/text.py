"""Pure-column text helpers: normalization, tokenization, shingles,
stopword counts. Everything is a native Spark SQL expression (JVM,
whole-stage codegen) — no Python UDFs — so the same semantics are
expressible 1:1 in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword vote sets for language ID. text_langid counts them via
# one split-tokenize + in-array membership (single text pass); the
# derived \b-patterns below serve count_matches consumers
# (text_quality's stop_ratio). Derivation from ONE word list keeps
# the two formulations provably in sync.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "une"),
}

# The word-boundary patterns are ASCII-only on purpose: Java regex
# (Spark) and RE2 (DuckDB) agree on \b for ASCII.
STOPWORDS_EN = r"\b(" + "|".join(LANG_STOPWORDS["en"]) + r")\b"
STOPWORDS_DE = r"\b(" + "|".join(LANG_STOPWORDS["de"]) + r")\b"
STOPWORDS_FR = r"\b(" + "|".join(LANG_STOPWORDS["fr"]) + r")\b"

# BPE-ish pre-tokenizer: letter runs | digit runs | single symbol
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_text(col: Column) -> Column:
    """lower + trim + collapse whitespace — the canonical form used
    for fingerprints and exact dedup."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def words(col: Column) -> Column:
    """Array of whitespace-delimited tokens of the normalized text."""
    return F.split(normalize_text(col), " ")


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined) of the normalized text.
    Texts shorter than n words yield an empty array."""
    w = words(col)
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(w, i, n), " "))
    return F.array_distinct(F.when(F.size(w) >= n, sh).otherwise(F.array()))


def count_matches(col: Column, pattern: str) -> Column:
    """Number of regex matches in the column (group 0 = full match)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")
