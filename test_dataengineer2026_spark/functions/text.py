"""Text column-expression helpers: tokens, shingles, portable hashes.

All pure JVM-side expressions (no Python UDFs): tokenization via split,
shingling via sequence+slice higher-order functions, and md5-based
"hash family" h_i(s) = md5(i || '|' || s) which is bit-identical in any
engine that implements md5 — the property that keeps MinHash/SimHash
oracle-checkable across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles over a token array.

    transform(sequence(1, len-n+1), i -> concat_ws(' ', slice(tok, i, n)))
    — all JVM higher-order functions, no explode needed at this stage.
    Documents shorter than n tokens get an empty set (Spark's sequence()
    would run backwards for stop < start, so guard explicitly).
    """
    expr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
        )
    )
    return F.when(F.size(tok) >= F.lit(n), expr).otherwise(
        F.array().cast("array<string>")
    )


def hash_family(seed: int, value: Column) -> Column:
    """Portable deterministic hash h_seed(value) as a 32-hex-char string."""
    return F.md5(F.concat(F.lit(str(seed)), F.lit("|"), value))


def hash24(value: Column) -> Column:
    """Portable 24-bit integer hash (first 6 hex chars of md5)."""
    return F.conv(F.substring(F.md5(value), 1, 6), 16, 10).cast("int")
