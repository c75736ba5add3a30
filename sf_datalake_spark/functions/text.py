"""Text-analysis column helpers for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) — language ID, quality
scoring, token counting, fingerprinting run at full scan speed with no
Python in the hot path. These extend the engine beyond the reference's
surface (the reference has no text processing) per the large-scale
training-data-pipeline requirement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language
#: heuristic. Deliberately small and deterministic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "a"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "los", "de", "que", "es", "un", "una"],
}


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, strip — canonical form for dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(col))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined), for MinHash/Jaccard.

    Implementation note (hot path at corpus scale): higher-order
    functions are interpreted, and a lambda that references an outer
    expression re-evaluates it PER ELEMENT — the naive
    ``transform(sequence(...), i -> slice(toks, i, n))`` retokenizes the
    document once per shingle (quadratic). Here the lambda touches only
    its own argument: ``arrays_zip`` of ``n`` shifted slices is built
    once per row, then each zipped struct is joined — tokenization cost
    is O(n) per row, not O(tokens).
    """
    toks = tokenize(col)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, F.size(toks) - n + 1) for i in range(n)]
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
        )
    )


def char_ngrams(col: Column | str, n: int = 4) -> Column:
    """Array of character n-grams of the normalized text.

    Same HOF discipline as :func:`word_shingles`: the lambda must not
    reference the normalized-text expression (interpreted HOFs
    re-evaluate captured outer expressions per element — O(len²) per
    row); ``arrays_zip`` of shifted character slices keeps normalization
    at O(n) evaluations per row."""
    c = normalize_text(col)
    chars = F.split(c, "")
    zipped = F.arrays_zip(
        *[F.slice(chars, i + 1, F.length(c) - n + 1) for i in range(n)]
    )
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(
        F.transform(zipped, lambda s: F.concat(*[s[str(i)] for i in range(n)]))
    )


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """Count of stopword occurrences (word-boundary regex, case-insensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(1)))


def text_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))
