"""Mergeable frequency sketches: Misra-Gries heavy hitters.

Completes the fixed-size-sketch family next to the HLL (distinct) and
KLL (quantile) bound queries: at 100 TB you cannot shuffle an exact
per-term count table whose domain is the open vocabulary of a corpus,
but k counters per partition plus a (term, est) merge - at most
k * n_partitions tiny rows - you always can.

Algorithm (public; Misra & Gries 1982, "Finding repeated elements"):
maintain at most k counters; an unseen term either claims a free
counter or decrements ALL counters by one (evicting zeros). Guarantees
per partition, for every term t with true count c_p(t) over the n_p
items: c_p(t) - n_p/(k+1) <= est_p(t) <= c_p(t) (est 0 if absent).
Summing per-partition summaries keeps both sides: the merged estimate
is exact-or-under by at most sum(n_p)/(k+1) = n/(k+1), so every term
with global count > n/(k+1) MUST survive in at least one partition's
summary. That deterministic bound - not the partition-order-dependent
estimates - is what the driver query checks.

The kernel is the batched mergeable-summaries formulation (Agarwal et
al. 2012): each Arrow batch's exact value_counts (vectorized C) merges
into the k-counter summary via :func:`mg_merge_counts`, preserving the
same one-sided bound. On a real cluster the same mapInPandas seam takes
datasketches' frequent-items unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge_counts(
    counters: dict[str, int], counts: dict[str, int], k: int
) -> dict[str, int]:
    """Merge exact ``counts`` into a Misra-Gries ``k``-counter summary.

    Mergeable-summaries rule: add pointwise, then if more than ``k``
    counters survive, subtract the (k+1)-th largest value and drop
    non-positives. Each compress removes >= m*(k+1) stream mass while
    lowering any counter by <= m, so the total underestimate stays
    <= n/(k+1) however the stream is batched or partitioned.

    Non-mutating: the caller's ``counters`` dict is never modified (the
    pre-fix version mutated it in place on the no-compression path but
    returned a fresh dict after compression - inconsistent aliasing)."""
    merged = dict(counters)
    for term, c in counts.items():
        merged[term] = merged.get(term, 0) + int(c)
    if len(merged) > k:
        m = sorted(merged.values(), reverse=True)[k]
        merged = {t: c - m for t, c in merged.items() if c > m}
    return merged


def misra_gries_summary(df: DataFrame, term_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries with k counters, merged by term.

    Returns (term, est) with est <= true count and
    est >= true - n/(k+1). One pass over the data, O(k) state per
    partition, and the only shuffle moves <= k rows per partition.
    """

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            counters = mg_merge_counts(
                counters, pdf[term_col].dropna().value_counts().to_dict(), k
            )
        yield pd.DataFrame(
            {term_col: list(counters), "est": list(counters.values())}
        )

    summaries = df.select(term_col).mapInPandas(
        partial, schema=f"{term_col} string, est long"
    )
    return summaries.groupBy(term_col).agg(F.sum("est").alias("est"))
