"""UDAF / UDTF surface (SURVEY.md §2.10 note: the reference has none;
the engine library exposes the two Spark-native patterns the
training-data extensions need).

- UDAF: Arrow grouped-agg ``pandas_udf`` - whole-group Series in, scalar
  out, usable inside ``groupBy(...).agg(...)`` and as a window function.
- UDTF: Python user-defined TABLE function (Spark 4 ``udtf``) - one
  input row to N output rows with a declared schema, usable standalone
  or in SQL ``LATERAL`` position.

Both are the SLOW path relative to built-in expressions (the engine's
default everywhere else); they exist for semantics expressions can't
reach - bespoke whole-group reductions and stateful row explosion.
Registration is lazy (factories, cached) because the UDTF decorator
requires an active SparkSession."""

from __future__ import annotations

import functools

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

# ---------------------------------------------------------------------------
# UDAF: weighted mean as an Arrow grouped-agg pandas_udf
# ---------------------------------------------------------------------------


@functools.cache
def weighted_mean_udaf():
    """sum(v*w)/sum(w) over the whole group (NaN-safe: rows with a null
    value or weight drop out, like SQL aggregate null semantics).
    Equivalent to the built-in ``sum(v*w)/sum(w)`` - the test asserts
    agreement - but demonstrates the grouped-agg contract: the function
    sees each group's FULL column as a pandas Series and returns one
    scalar; Spark handles the partial/shuffle plumbing."""

    @pandas_udf("double")
    def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
        mask = v.notna() & w.notna()
        tw = w[mask].sum()
        return float((v[mask] * w[mask]).sum() / tw) if tw else None

    return _weighted_mean


def weighted_mean(df, group_cols: list[str], value_col: str, weight_col: str):
    """groupBy + the UDAF, aliased ``weighted_mean``."""
    return df.groupBy(*group_cols).agg(
        weighted_mean_udaf()(F.col(value_col), F.col(weight_col)).alias(
            "weighted_mean"
        )
    )


# ---------------------------------------------------------------------------
# UDTF: n-gram exploder (one text row -> N ngram rows)
# ---------------------------------------------------------------------------


class _NgramExplode:
    """Word n-gram UDTF: yields (position, ngram) per input text. The
    declared schema makes the output a real relation - usable as
    ``ngram_explode()(lit(text), lit(2))`` or registered for SQL
    ``LATERAL ngrams(text, 2)``."""

    def eval(self, text: str, n: int):  # noqa: D102 - contract method
        if not text or not n or n < 1:
            return
        toks = [t for t in text.split(" ") if t]
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@functools.cache
def ngram_explode():
    """The UDTF-wrapped exploder (lazy: needs an active session)."""
    return udtf(_NgramExplode, returnType="pos int, ngram string")


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``ngrams`` in FROM/LATERAL)."""
    spark.udtf.register("ngrams", ngram_explode())
