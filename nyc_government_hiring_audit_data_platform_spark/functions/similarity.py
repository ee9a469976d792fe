"""Similarity measures as built-in Column expressions.

These are the oracle-checkable similarity primitives (``levenshtein``
exists in both Spark and DuckDB). The rapidfuzz-style scorers
(token_set_ratio / WRatio) that the reference uses live in
``operators.fuzzy`` as Pandas-UDF kernels - they are not SQL-expressible
and get rows-only checks per the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def levenshtein_similarity(a: Column | str, b: Column | str) -> Column:
    """100 * (1 - levenshtein(a,b) / max(len(a), len(b))) as double.

    DuckDB oracle: identical formula with ``levenshtein()`` /
    ``greatest(length(..))`` - integer inputs, one IEEE-double division,
    bit-identical across engines.
    """
    a, b = _c(a), _c(b)
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(100.0)).otherwise(
        100.0 * (1.0 - F.levenshtein(a, b) / denom)
    )


def token_jaccard(a_tokens: Column, b_tokens: Column) -> Column:
    """Jaccard similarity of two array<string> token sets (double 0-1)."""
    inter = F.size(F.array_intersect(a_tokens, b_tokens))
    union = F.size(F.array_union(a_tokens, b_tokens))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns via zip_with+aggregate
    (JVM-side, no UDF)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<numeric> columns (double).

    Cast inputs to double first for cross-engine float parity. Sequential
    left-to-right summation matches DuckDB's list_* evaluation order.
    """
    a = _c(a).cast("array<double>")
    b = _c(b).cast("array<double>")
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
