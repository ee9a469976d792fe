"""Cross-engine numeric canonicalization helpers.

The one rule that keeps rounded float outputs hash-identical between
Spark and DuckDB: a rounded column that can be NEGATIVE must normalize
negative zero on BOTH engines. Spark's ``round`` (BigDecimal HALF_UP)
returns ``0.0`` where DuckDB's ``ROUND`` keeps ``-0.0``, and the driver
value-hash distinguishes the sign (round-3 red ``zscore_normalize``).
IEEE ``-0.0 + 0.0 = +0.0`` makes the representation canonical, so the
normalization is literally ``+ 0``.

Use these helpers instead of hand-writing the incantation at each site;
nonnegative-by-construction outputs (counts, ratios, distances) can use
plain ``F.round`` / ``ROUND``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_round(col: Column | str, scale: int) -> Column:
    """``round(col, scale)`` with negative zero canonicalized to +0.0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale) + F.lit(0.0)


def norm_round_sql(expr: str, scale: int) -> str:
    """DuckDB twin of :func:`norm_round` for oracle SQL strings."""
    return f"ROUND({expr}, {scale}) + 0"
