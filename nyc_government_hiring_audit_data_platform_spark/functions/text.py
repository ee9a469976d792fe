"""Text normalization as built-in expression chains.

Replaces the reference's row-at-a-time Python ``normalize_title``
(reference: src/utils.py:20-29 - non-str -> "", lowercase, strip every
``string.punctuation`` char, collapse whitespace, trim) with a pure
Column expression: stays JVM-side / codegen'd, pushable, and exactly
reproducible in the DuckDB oracle with the same regexes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Character class covering Python's string.punctuation, escaped for both
# Java regex (Spark) and RE2 (DuckDB):  !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~
PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""


def normalize_text(col: Column | str) -> Column:
    """Lowercase, strip punctuation, collapse runs of whitespace, trim.

    Null-safe: null/non-string input behaves like the reference's
    ``""`` fallback (coalesce to empty string).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.coalesce(c.cast("string"), F.lit("")))
    c = F.regexp_replace(c, PUNCT_CLASS, "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    """The identical normalization as a DuckDB SQL expression (oracle)."""
    cls = PUNCT_CLASS.replace("'", "''")
    return (
        "trim(regexp_replace(regexp_replace("
        f"lower(coalesce(CAST({expr} AS VARCHAR), '')), '{cls}', '', 'g'), "
        "'\\s+', ' ', 'g'))"
    )


def tokens(col: Column | str) -> Column:
    """Normalized whitespace tokens as array<string> (empty strings removed).

    The unit of the token-set similarity family and of the
    token-blocking fuzzy join (SURVEY.md J1 scale path).
    """
    arr = F.split(normalize_text(col), " ")
    return F.filter(arr, lambda t: t != "")
