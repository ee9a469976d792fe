"""Byte-pair-encoding tokenizer training as an iterative Spark loop.

Completes the tokenizer-training surface next to the two driver
queries: ``bpe_pair_counts`` (one candidate scan) and
``bpe_apply_merge`` (one greedy apply). This operator runs the full
loop - N rounds of scan -> pick winner -> apply - carrying the corpus
symbol state in a DataFrame column between rounds, the same
driver-synced iteration shape as ``operators.graph`` (connected
components) and ``operators.ann.kmeans_iteration``: per round ONE
pair-count shuffle plus a 1-row collect of the winning pair.

Pair identity is the (left, right) SYMBOL STRUCT, never the
concatenation - ("ab","c") and ("a","bc") are different merges with
the same concat - and the winner order is the total order
(count DESC, left, right), so training is deterministic for a given
corpus. Greedy left-to-right application reuses the distinct-marker
wrapping proven by bpe_apply_merge (chr(30)/chr(31); by contract
absent from tokens).

At 100 TB each round is: map-side pair explode -> alphabet-bounded
(later vocab-bounded) count shuffle with partial aggregation ->
broadcast ONE winning pair -> map-only rewrite. N rounds = N such
passes; the reference BPE trainers (sentencepiece et al.) do the same
corpus passes single-node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPEN = "chr(30)"
_CLOSE = "chr(31)"


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a ``syms: array<string>`` column."""
    pairs = syms.select(
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN "
                "transform(sequence(1, size(syms) - 1), "
                "i -> named_struct('a', element_at(syms, i), "
                "'b', element_at(syms, i + 1))) "
                "ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"
            )
        ).alias("p")
    )
    return pairs.groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("cnt"))


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (a, b) -> a||b.

    Wrap each symbol OPEN||sym||CLOSE, one built-in replace of the
    wrapped pair (adjacent matches share no characters, so left-to-
    right non-overlapping replace IS greedy BPE), split back on the
    CLOSE||OPEN boundary and strip the outer markers.
    """
    # Spark SQL string literals process C-style escapes by default, so a
    # symbol containing a backslash (paths, escaped text) would corrupt
    # the literal unless doubled - escape backslashes BEFORE quotes.
    def _q(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "''")

    qa, qb = _q(a), _q(b)
    wrapped = (
        f"aggregate(syms, cast('' as string), "
        f"(acc, s) -> concat(acc, {_OPEN}, s, {_CLOSE}))"
    )
    merged = (
        f"replace({wrapped}, "
        f"concat({_OPEN}, '{qa}', {_CLOSE}, {_OPEN}, '{qb}', {_CLOSE}), "
        f"concat({_OPEN}, '{qa}', '{qb}', {_CLOSE}))"
    )
    unwrapped = (
        f"CASE WHEN size(syms) = 0 THEN syms ELSE "
        f"transform(split(substring({merged}, 2, length({merged}) - 2), "
        f"concat({_CLOSE}, {_OPEN})), x -> x) END"
    )
    return syms.select(F.expr(unwrapped).alias("syms"))


def train_bpe(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    materialize_final: bool = True,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges over whitespace tokens of
    ``text_col``; initial symbols are single characters.

    Returns (ordered merge list, final per-token symbol DataFrame).
    Each round: one pair-count shuffle + a 1-row winner collect + a
    map-only rewrite; the symbol state is persisted per round and the
    previous round's state unpersisted (the graph-loop protocol).

    ``materialize_final=False`` returns the last round's symbol state
    LAZY (unpersisted, recomputable from source): callers that only
    want the merge table (the training loop's actual deliverable)
    skip one full corpus rewrite pass - the merges themselves are
    identical either way, since the final state is never read by the
    winner selection (r13 optimization; guide §1.2 "don't compute
    things you throw away").
    """
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                lambda t: t != "",
            )
        ).alias("tok")
    )
    syms = toks.select(
        F.expr(
            "CASE WHEN length(tok) >= 1 THEN "
            "transform(sequence(1, length(tok)), i -> substring(tok, i, 1)) "
            "ELSE CAST(array() AS ARRAY<STRING>) END"
        ).alias("syms")
    ).persist()

    def _winner(state: DataFrame):
        return (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )

    # One full-corpus action per round, not two: round r+1's pair-count
    # job IS the action that materializes round r's persisted rewrite
    # (only then is the parent state unpersisted), so the loop runs
    # n_merges+1 corpus passes instead of 2*n_merges. Only the FINAL
    # state needs a dedicated materializing count().
    merges: list[tuple[str, str]] = []
    top = _winner(syms)
    while len(merges) < n_merges and top and top[0]["cnt"] >= 2:
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        last = len(merges) >= n_merges
        if last and not materialize_final:
            # Caller discards the state: hand back the lazy rewrite
            # (lineage reaches the source tables, so it stays valid
            # after the parent unpersists) without the extra pass.
            nxt = _apply_merge(syms, a, b)
        else:
            nxt = _apply_merge(syms, a, b).persist()
            if not last:
                top = _winner(nxt)  # materializes nxt as a side effect
            else:
                nxt.count()  # last round: materialize before dropping parent
        syms.unpersist()
        syms = nxt
    return merges, syms
