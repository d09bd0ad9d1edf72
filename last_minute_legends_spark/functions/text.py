"""Pure-column text helpers: normalization, tokenization, shingles,
stopword counts. Everything is a native Spark SQL expression (JVM,
whole-stage codegen) — no Python UDFs — so the same semantics are
expressible 1:1 in the DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The word-boundary patterns are ASCII-only on purpose: Java regex
# (Spark) and RE2 (DuckDB) agree on \b for ASCII.
STOPWORDS_EN = r"\b(the|and|of|to|in|is|was|for)\b"
STOPWORDS_DE = r"\b(der|die|das|und|ist|nicht|mit|ein)\b"
STOPWORDS_FR = r"\b(le|la|les|et|est|pas|pour|une)\b"

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
