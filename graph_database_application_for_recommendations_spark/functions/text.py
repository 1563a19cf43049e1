"""Text column expression helpers (native functions only, no Python UDFs).

The hashing primitives are deliberately built on ``md5`` (available with
identical semantics in Spark SQL and DuckDB) rather than Spark's murmur3
``hash()``, so every dedup/fingerprint operator stays oracle-checkable
cross-engine. 32-bit slices of md5 are plenty for MinHash permutations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny public stopword list per language for the n-gram/stopword language
# heuristic (SURVEY.md §7 phase 5 / text analysis). Deliberately short and
# frozen: it's part of the operator's deterministic contract.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}


def normalize(text: Column) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical text form."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens(text: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize(text), " ")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles as space-joined strings.

    Built from slices of the token array — stays entirely in codegen.
    """
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def canonical_fingerprint(text: Column) -> Column:
    """md5 over the sorted distinct token set — THE canonical-fingerprint
    expression; batch dedup and the streaming ingest twins must share one
    definition or they silently diverge."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def md5_hash32(s: Column, seed: int = 0) -> Column:
    """Deterministic 32-bit hash via md5 (cross-engine reproducible).

    DuckDB twin: CAST(('0x' || substr(md5(s || '#<seed>'), 1, 8)) AS BIGINT)
    """
    salted = F.concat(s, F.lit(f"#{seed}")) if seed else s
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def md5_hash60(s: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit hash via md5 (15 hex chars, fits signed int64)."""
    salted = F.concat(s, F.lit(f"#{seed}")) if seed else s
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
