"""BPE trainer vs a from-first-principles Python reference.

The reference implements the classic algorithm directly (count adjacent
symbol pairs, merge the most frequent left-to-right, repeat) with the
operator's documented tie order (count DESC, left, right). The Spark
trainer must reproduce the exact merge sequence and final symbolization.
"""

from __future__ import annotations

from nyc_government_hiring_audit_data_platform_spark.operators.bpe import train_bpe


def _ref_bpe(tokens: list[str], n_merges: int):
    seqs = [list(t) for t in tokens if t]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + 1
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < 2:
            break
        merges.append(pair)
        a, b = pair
        new_seqs = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return merges, sorted(tuple(s) for s in seqs)


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_bpe_trainer_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
    ]
    docs = _docs(spark, texts)
    merges, syms = train_bpe(docs, "text", n_merges=6)
    want_merges, want_seqs = _ref_bpe(" ".join(texts).split(" "), 6)
    assert merges == want_merges
    got_seqs = sorted(tuple(r["syms"]) for r in syms.collect())
    assert got_seqs == want_seqs
    syms.unpersist()


def test_bpe_trainer_greedy_chain_and_stop(spark):
    """Chains merge greedily ('aaaa' -> [aa, aa]); training stops when
    no pair repeats (cnt < 2), returning fewer merges than asked."""
    docs = _docs(spark, ["aaaa aaa xyz"])
    merges, syms = train_bpe(docs, "text", n_merges=10)
    want_merges, want_seqs = _ref_bpe(["aaaa", "aaa", "xyz"], 10)
    assert merges == want_merges
    assert merges[0] == ("a", "a")
    got_seqs = sorted(tuple(r["syms"]) for r in syms.collect())
    assert got_seqs == want_seqs
    assert len(merges) < 10
    syms.unpersist()


def test_bpe_trainer_backslash_symbols(spark):
    """Symbols containing backslashes (paths, escaped text) must survive
    the SQL-literal interpolation in _apply_merge: Spark SQL processes
    C-style escapes inside string literals, so an unescaped backslash
    corrupts the replace pattern (ADVICE round 4)."""
    docs = _docs(spark, ["a\\b a\\b c\\\\d"])
    merges, syms = train_bpe(docs, "text", n_merges=3)
    want_merges, want_seqs = _ref_bpe(["a\\b", "a\\b", "c\\\\d"], 3)
    assert merges == want_merges
    got = sorted(tuple(r["syms"]) for r in syms.collect())
    assert got == want_seqs
    syms.unpersist()


def test_bpe_trainer_null_and_empty_text(spark):
    """NULL/empty documents contribute nothing and never crash the
    wrap/unwrap rewrite."""
    docs = _docs(spark, [None, "", "ab ab"])
    merges, syms = train_bpe(docs, "text", n_merges=2)
    assert merges == [("a", "b")]
    got = sorted(tuple(r["syms"]) for r in syms.collect())
    assert got == [("ab",), ("ab",)]
    syms.unpersist()


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcd", min_size=1, max_size=6)


@settings(max_examples=5, deadline=None)
@given(st.lists(_word, min_size=1, max_size=12), st.integers(1, 4))
def test_bpe_trainer_matches_reference_random(spark, words, n):
    """Random small corpora over a 4-letter alphabet: the Spark trainer
    and the Python reference produce identical merge sequences and
    final symbolizations (few examples - each drives real Spark jobs)."""
    docs = _docs(spark, [" ".join(words)])
    merges, syms = train_bpe(docs, "text", n_merges=n)
    want_merges, want_seqs = _ref_bpe(words, n)
    got_seqs = sorted(tuple(r["syms"]) for r in syms.collect())
    syms.unpersist()
    assert merges == want_merges
    assert got_seqs == want_seqs


@settings(max_examples=500, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=120),
    st.integers(2, 6),
    st.data(),
)
def test_mg_merge_counts_bound_any_batching(stream, k, data):
    """Misra-Gries invariant under ARBITRARY batch splits (pure Python,
    no Spark): for every term, exact - n/(k+1) <= est <= exact, and any
    term with exact count > n/(k+1) survives in the summary."""
    from nyc_government_hiring_audit_data_platform_spark.operators.sketches import (
        mg_merge_counts,
    )

    # random cut points -> batches
    cuts = sorted(
        data.draw(
            st.lists(st.integers(0, len(stream)), max_size=6), label="cuts"
        )
    )
    bounds = [0, *cuts, len(stream)]
    counters: dict[str, int] = {}
    for lo, hi in zip(bounds, bounds[1:]):
        batch = stream[lo:hi]
        counts: dict[str, int] = {}
        for t in batch:
            counts[t] = counts.get(t, 0) + 1
        counters = mg_merge_counts(counters, counts, k)
    assert len(counters) <= k
    n = len(stream)
    exact: dict[str, int] = {}
    for t in stream:
        exact[t] = exact.get(t, 0) + 1
    for t, c in exact.items():
        est = counters.get(t, 0)
        assert est <= c, (t, est, c)
        assert est >= c - n / (k + 1) - 1e-9, (t, est, c, n / (k + 1))
        if c > n / (k + 1):
            assert t in counters, f"heavy {t} lost (c={c}, bound={n/(k+1)})"
