"""Brute-force property checks for the sequence/temporal queries.

The oracle-parity suite proves Spark == DuckDB; these tests prove both
engines compute the SEMANTICS claimed, by re-deriving the answers with
naive in-Python algorithms over the real sf0.001 events (small enough
to brute-force, real enough to carry ties, bursts, and per-user
variety).
"""

from __future__ import annotations

from collections import defaultdict

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

_TOL = 3600
_SPAN = 900


@pytest.fixture(scope="module")
def events(spark, sf_smoke):
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import table

    rows = (
        table(spark, sf_smoke, "events")
        .selectExpr(
            "event_id", "user_id", "event_type", "unix_seconds(ts) AS sec"
        )
        .collect()
    )
    by_user: dict[int, list] = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.sec, r.event_id, r.event_type))
    for v in by_user.values():
        v.sort(key=lambda t: (t[0], t[1]))
    return by_user


def test_asof_nearest_is_truly_nearest(spark, sf_smoke, events):
    """Every emitted pair is the minimum-|gap| purchase within
    tolerance (ties backward), and every click with an eligible
    purchase IS emitted."""
    got = {
        r.event_id: (r.purchase_event_id, r.gap_sec)
        for r in QUERIES["asof_join_nearest"](spark, sf_smoke).collect()
    }
    expected = {}
    for seq in events.values():
        for i, (sec, eid, et) in enumerate(seq):
            if et != "click":
                continue
            back = next(
                (
                    (s, e)
                    for s, e, t in reversed(seq[:i])
                    if t == "purchase" and sec - s <= _TOL
                ),
                None,
            )
            fwd = next(
                (
                    (s, e)
                    for s, e, t in seq[i + 1 :]
                    if t == "purchase" and s - sec <= _TOL
                ),
                None,
            )
            if back is not None and (
                fwd is None or sec - back[0] <= fwd[0] - sec
            ):
                expected[eid] = (back[1], back[0] - sec)
            elif fwd is not None:
                expected[eid] = (fwd[1], fwd[0] - sec)
    assert got == expected


def test_interval_coalesce_spans_disjoint_and_cover(spark, sf_smoke, events):
    """Per user: spans are maximal, strictly separated (gap > 0 between
    consecutive spans), every event's interval is inside exactly one
    span, and n_events adds up to the user's event count."""
    spans = defaultdict(list)
    for r in QUERIES["interval_coalesce"](spark, sf_smoke).collect():
        spans[r.user_id].append((r.span_start, r.span_end, r.n_events))
    for uid, seq in events.items():
        got = sorted(spans[uid])
        assert sum(n for _, _, n in got) == len(seq)
        for (s1, e1, _), (s2, _, _) in zip(got, got[1:]):
            assert s2 > e1, f"user {uid}: spans touch/overlap"
        # brute-force merge of [sec, sec+span)
        merged = []
        for sec, _, _t in seq:
            if merged and sec <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], sec + _SPAN)
                merged[-1][2] += 1
            else:
                merged.append([sec, sec + _SPAN, 1])
        assert got == [tuple(m) for m in merged]


def test_weighted_median_matches_bruteforce(spark, sf_smoke):
    """The emitted median is the smallest price whose cumulative
    quantity weight reaches half the total, per return flag."""
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").selectExpr(
        "l_returnflag AS flag",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents",
        "CAST(ROUND(l_quantity) AS BIGINT) AS w",
    )
    data = defaultdict(list)
    for r in li.collect():
        data[r.flag].append((r.cents, r.w))
    got = {
        r.flag: (r.weighted_median, r.total_weight)
        for r in QUERIES["weighted_median"](spark, sf_smoke).collect()
    }
    for flag, pairs in data.items():
        pairs.sort()
        tot = sum(w for _, w in pairs)
        cum = 0
        med = None
        for cents, w in pairs:
            cum += w
            if 2 * cum >= tot:
                med = round(cents / 100.0, 2)
                break
        assert got[flag] == (med, tot)


def test_forward_fill_carries_last_good(spark, sf_smoke, events):
    """Filled value equals the most recent non-error reading; leading
    errors stay NULL."""
    vals = {
        r.event_id: r.value
        for r in spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("event_id", "value")
        .collect()
    }
    got = {
        r.event_id: r.filled_value
        for r in QUERIES["forward_fill"](spark, sf_smoke).collect()
    }
    for seq in events.values():
        last_good = None
        for _sec, eid, et in seq:
            # ignorenulls: a non-error row with a NULL reading is
            # skipped, not carried (events.value is nullable by schema
            # even though current datagen emits no NULLs)
            if et != "error" and vals[eid] is not None:
                last_good = vals[eid]
            assert got[eid] == last_good


def test_sharded_rank_equals_global_window_random(spark):
    """Property: sharded_rank's pos/rank/total reproduce the single
    global window EXACTLY - cumulative weight, row rank (with tiebreak),
    and total - on random data with heavy value ties, for both the
    keyed and the global (empty-keys) form. The operator is load-bearing
    for vocab_coverage / quantile_bucketize / weighted_median /
    epoch_shuffle, so the equivalence is pinned here once rather than
    per call site."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_government_hiring_audit_data_platform_spark.operators import (
        sequence as SEQ,
    )

    rng = random.Random(7)
    rows = [
        (
            rng.randrange(2),            # key (2 groups)
            rng.randrange(8),             # value: heavy ties
            f"t{rng.randrange(30)}_{i}",  # unique tiebreak
            rng.randrange(1, 9),          # weight
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k int, v int, tb string, wt int")

    # global form (keys=()): shard subdivides ties by tiebreak prefix
    got = (
        SEQ.sharded_rank(
            df,
            value="v",
            shard_expr="named_struct('v', v, 'p', substring(tb, 1, 2))",
            weight="wt",
            order_extra=("tb",),
            with_rank=True,
            with_total=True,
        )
        .select("v", "tb", "pos", "rank", "total")
        .collect()
    )
    w = Window.orderBy("v", "tb").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["v"], r["tb"]): (r["pos"], r["rank"], r["total"])
        for r in df.select(
            "v",
            "tb",
            F.sum("wt").over(w).alias("pos"),
            F.sum(F.lit(1)).over(w).alias("rank"),
            F.sum("wt").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("total"),
        ).collect()
    }
    assert len(got) == 300
    for r in got:
        assert (r["pos"], r["rank"], r["total"]) == want[(r["v"], r["tb"])], r

    # keyed form: per-key global ranks
    gotk = (
        SEQ.sharded_rank(
            df,
            value="v",
            shard_expr="v div 3",
            keys=("k",),
            weight="wt",
            order_extra=("tb",),
            with_rank=True,
        )
        .select("k", "v", "tb", "pos", "rank")
        .collect()
    )
    wk = Window.partitionBy("k").orderBy("v", "tb").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wantk = {
        (r["k"], r["v"], r["tb"]): (r["pos"], r["rank"])
        for r in df.select(
            "k",
            "v",
            "tb",
            F.sum("wt").over(wk).alias("pos"),
            F.sum(F.lit(1)).over(wk).alias("rank"),
        ).collect()
    }
    for r in gotk:
        assert (r["pos"], r["rank"]) == wantk[(r["k"], r["v"], r["tb"])], r


def test_operator_output_collision_guard(spark):
    """The sequence operators refuse inputs whose columns they would
    silently clobber (withColumn on an existing name replaces it with
    no error - wrong results otherwise)."""
    df = spark.range(3).selectExpr("id AS k", "id AS v", "id AS pos")
    with pytest.raises(ValueError, match="sharded_rank"):
        from nyc_government_hiring_audit_data_platform_spark.operators import (
            sequence as SEQ,
        )

        SEQ.sharded_rank(df, value="v", shard_expr="v div 10")
    from nyc_government_hiring_audit_data_platform_spark.operators import (
        sequence as SEQ,
    )

    with pytest.raises(ValueError, match="forward_fill"):
        SEQ.forward_fill(
            df.withColumnRenamed("pos", "filled_value"),
            keys=["k"],
            order=["v"],
            value="v",
        )


def test_bpe_apply_merge_greedy_chain(spark, tmp_path):
    """Left-to-right non-overlapping merge semantics: with winning pair
    'aa', the token 'aaaa' merges to [aa, aa] (2 symbols) and 'aaa' to
    [aa, a] (2 symbols) - never the overlapping [aa, aa] from 'aaa'."""
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    docs = spark.createDataFrame(
        [
            (0, "aaaa aaa", "en", "s", 8),  # pair 'aa' dominates
            (1, "ab", "en", "s", 2),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "bpe")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["bpe_apply_merge"](spark, d).collect()
    }
    assert rows[0]["pair"] == "aa"
    # 'aaaa' (4 chars) -> [aa, aa]; 'aaa' (3 chars) -> [aa, a]: 7 -> 4
    assert rows[0]["n_sym_before"] == 7 and rows[0]["n_sym_after"] == 4
    # 'ab' has no 'aa': untouched
    assert rows[1]["n_sym_before"] == 2 and rows[1]["n_sym_after"] == 2


def test_bpe_apply_merge_newline_chars(spark, tmp_path):
    """TRUE-count assertion (not cross-engine parity, which both engines
    could fail identically): tokens containing \\n/\\r must wrap every
    char - pre-fix, '(.)' skipped newlines in Java regex AND RE2, so the
    length arithmetic inflated the merge count and token '\\n\\n'
    reported 0 symbols for 2 (ADVICE round 4)."""
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    # space-tokenization keeps newlines INSIDE tokens: doc 0's tokens are
    # ['aa\naa', 'aaaa']; winning pair 'aa' (count: 2 in 'aa\naa' split by
    # the \n barrier... actually 'aa\naa' contains pairs aa,a\n,\na,aa).
    docs = spark.createDataFrame(
        [
            (0, "aa\naa aaaa", "en", "s", 10),
            (1, "\n\n", "en", "s", 2),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "bpe_nl")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["bpe_apply_merge"](spark, d).collect()
    }
    assert rows[0]["pair"] == "aa"
    # 'aa\naa' (5 symbols) -> [aa, \n, aa] (3); 'aaaa' (4) -> [aa, aa] (2)
    assert rows[0]["n_sym_before"] == 9 and rows[0]["n_sym_after"] == 5
    # doc 1: one token '\n\n' - 2 symbols, no 'aa', untouched (pre-fix
    # this reported n_sym_after == 0)
    assert rows[1]["n_sym_before"] == 2 and rows[1]["n_sym_after"] == 2
