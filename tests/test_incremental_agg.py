"""Incremental aggregate maintenance (operators/incremental.py).

The driver rows (driver_queries_incremental.py) hash the end-to-end
algebra against DuckDB full recomputes; these tests pin the operator
contracts the hashes cannot see: merge-order invariance, the min/max
retraction refusal, zombie-group dropping, the state-column contract,
and the plan-level guarantee that a refresh never re-reads base facts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators import (
    incremental as IVM,
)

SPECS = [
    ("n", "1", "count"),
    ("total", "v", "sum"),
    ("lo", "v", "min"),
    ("hi", "v", "max"),
    ("mean", "v", "avg"),
]


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _final(spark, rows, specs=SPECS):
    df = _facts(spark, rows)
    return {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.partial_agg_state(df, ["k"], specs), ["k"], specs
        ).collect()
    }


def test_state_columns_contract():
    assert IVM.state_columns(SPECS) == [
        "n__cnt", "total__sum", "lo__min", "hi__max", "mean__sum", "mean__cnt",
    ]
    with pytest.raises(ValueError, match="duplicate"):
        IVM.state_columns([("x", "v", "sum"), ("x", "v", "max")])
    with pytest.raises(ValueError, match="unknown agg kind"):
        IVM.state_columns([("x", "v", "median")])


def test_refresh_equals_full_recompute_any_batch_order(spark):
    rows = [("a", 1), ("a", 5), ("b", 10), ("b", 2), ("c", 7)]
    b1, b2, b3 = rows[:2], rows[2:4], rows[4:]
    want = _final(spark, rows)
    for order in ([b1, b2, b3], [b3, b1, b2], [b2, b3, b1]):
        state = IVM.partial_agg_state(_facts(spark, order[0]), ["k"], SPECS)
        for batch in order[1:]:
            state = IVM.incremental_agg_refresh(
                state, _facts(spark, batch), ["k"], SPECS
            )
        got = {
            tuple(r)
            for r in IVM.finalize_agg_state(state, ["k"], SPECS).collect()
        }
        assert got == want


def test_retraction_exact_and_zombie_groups_drop(spark):
    specs = [("n", "1", "count"), ("total", "v", "sum"), ("mean", "v", "avg")]
    keep = [("a", 1), ("a", 5), ("b", 10)]
    gone = [("a", 3), ("c", 7), ("c", 9)]  # c retracts to zero rows
    state = IVM.partial_agg_state(_facts(spark, keep + gone), ["k"], specs)
    state = IVM.incremental_agg_refresh(
        state, _facts(spark, gone), ["k"], specs, sign=-1
    )
    got = {
        tuple(r) for r in IVM.finalize_agg_state(state, ["k"], specs).collect()
    }
    assert got == _final(spark, keep, specs)  # c absent: no zombie zero-group
    # without drop_empty the zombie row IS there (count 0) - the bug
    # the default protects against
    raw = IVM.finalize_agg_state(state, ["k"], specs, drop_empty=False)
    assert raw.filter(F.col("k") == "c").count() == 1


def test_minmax_retraction_refused(spark):
    df = _facts(spark, [("a", 1)])
    for kind in ("min", "max", "approx_distinct"):
        with pytest.raises(ValueError, match="not retractable"):
            IVM.partial_agg_state(df, ["k"], [("x", "v", kind)], sign=-1)
    with pytest.raises(ValueError, match="sign"):
        IVM.partial_agg_state(df, ["k"], SPECS, sign=2)


def test_retractable_extremes_exact_within_synopsis(spark):
    """retractable_max/min: deletes of tracked extremes cancel exactly;
    groups retracting to zero rows drop via the paired count spec."""
    specs = [
        ("mx", "v", "retractable_max"),
        ("mn", "v", "retractable_min"),
        ("n", "1", "count"),
    ]
    ins = [("a", 1), ("a", 5), ("a", 9), ("b", 10), ("b", 2), ("c", 7)]
    rets = [("a", 9), ("b", 2), ("c", 7)]  # a's max, b's min, all of c
    state = IVM.partial_agg_state(_facts(spark, ins), ["k"], specs)
    state = IVM.incremental_agg_refresh(
        state, _facts(spark, rets), ["k"], specs, sign=-1
    )
    got = {
        tuple(r) for r in IVM.finalize_agg_state(state, ["k"], specs).collect()
    }
    assert got == {("a", 5, True, 1, True, 2), ("b", 10, True, 10, True, 1)}
    assert IVM.state_columns(specs[:1]) == [
        "mx__topi", "mx__topd", "mx__dropped", "__synopsis_r",
    ]


def test_retractable_synopsis_exhaustion_flags_not_lies(spark):
    """Synopsis overruns degrade LOUDLY (ok=false, null value), never
    into a silently wrong extreme: (a) the deletion side hitting its R
    cap, (b) a tracked retraction with no tracked partner (horizon-tie
    multiplicity), (c) every tracked insert cancelled."""
    specs = [("mx", "v", "retractable_max")]

    def run(ins, rets, r):
        st = IVM.partial_agg_state(_facts(spark, ins), ["k"], specs, synopsis_r=r)
        st = IVM.incremental_agg_refresh(
            st, _facts(spark, rets), ["k"], specs, sign=-1, synopsis_r=r
        )
        return IVM.finalize_agg_state(st, ["k"], specs, synopsis_r=r).collect()[0]

    # (a) deletion-side cap: R=2 deletions fill topd -> cannot certify
    row = run([("z", i) for i in range(1, 7)], [("z", 6), ("z", 5)], 2)
    assert row["mx"] is None and row["mx_ok"] is False
    # (b) horizon-tie miss: I=[9,8,5,5,5] R=4 tracks [9,8,5,5]; deleting
    # three 5s finds only two tracked partners -> flagged (true answer 9
    # exists, but the synopsis cannot PROVE it - conservative)
    row = run(
        [("z", 9), ("z", 8), ("z", 5), ("z", 5), ("z", 5)],
        [("z", 5), ("z", 5), ("z", 5)],
        4,
    )
    assert row["mx"] is None and row["mx_ok"] is False
    # (c) every tracked insert cancelled: survivors exist only below the
    # truncated horizon
    row = run(
        [("z", 9), ("z", 8), ("z", 3), ("z", 2)], [("z", 9), ("z", 8)], 2
    )
    assert row["mx"] is None and row["mx_ok"] is False
    # control: same shape with room in the synopsis is exact
    row = run(
        [("z", 9), ("z", 8), ("z", 3), ("z", 2)], [("z", 9), ("z", 8)], 4
    )
    assert row["mx"] == 3 and row["mx_ok"] is True


def test_retractable_state_merges_in_any_order(spark):
    """The synopsis is a commutative semigroup: insert and retraction
    batches fold in any order to the same finalized answer."""
    specs = [("mx", "v", "retractable_max"), ("n", "1", "count")]
    i1 = [("a", 1), ("a", 9)]
    i2 = [("a", 5), ("b", 4)]
    d1 = [("a", 9)]
    p = lambda rows, s: IVM.partial_agg_state(  # noqa: E731
        _facts(spark, rows), ["k"], specs, sign=s
    )
    for order in (
        [p(i1, 1), p(i2, 1), p(d1, -1)],
        [p(d1, -1), p(i2, 1), p(i1, 1)],
        [p(i2, 1), p(d1, -1), p(i1, 1)],
    ):
        got = {
            tuple(r)
            for r in IVM.finalize_agg_state(
                IVM.merge_agg_states(order, ["k"], specs), ["k"], specs
            ).collect()
        }
        assert got == {("a", 5, True, 2), ("b", 4, True, 1)}


def test_approx_median_state_merges_and_refuses_retraction(spark):
    """KLL sketch state: batches folded incrementally give a median
    whose rank over the true values is sane (exact here - k=200 is
    exact at tiny n), the joined merge path agrees, and retraction is
    refused like every sketch kind."""
    specs = [("med", "v", "approx_median")]
    rows = [("a", v) for v in [1, 3, 5, 7, 9, 11, 13]] + [("b", 100), ("b", 200)]
    b1, b2 = rows[:4], rows[4:]
    state = IVM.partial_agg_state(_facts(spark, b1), ["k"], specs)
    state = IVM.incremental_agg_refresh(state, _facts(spark, b2), ["k"], specs)
    med = {
        r["k"]: r["med"]
        for r in IVM.finalize_agg_state(state, ["k"], specs).collect()
    }
    assert med["a"] in (5, 7, 9) and med["b"] in (100, 200)
    joined = IVM.merge_states_joined(
        IVM.partial_agg_state(_facts(spark, b1), ["k"], specs),
        IVM.partial_agg_state(_facts(spark, b2), ["k"], specs),
        ["k"],
        specs,
    )
    med_j = {
        r["k"]: r["med"]
        for r in IVM.finalize_agg_state(joined, ["k"], specs).collect()
    }
    assert med_j["a"] in (5, 7, 9) and med_j["b"] in (100, 200)
    assert IVM.state_columns(specs) == ["med__kll"]
    with pytest.raises(ValueError, match="not retractable"):
        IVM.partial_agg_state(_facts(spark, rows), ["k"], specs, sign=-1)


def test_approx_distinct_state_merges_exactly_at_small_cardinality(spark):
    """HLL sketch state: batches folded in any order give the same
    estimate as a one-shot sketch, and at tiny cardinality the HLL
    estimate is exact - so the maintained distinct count EQUALS the
    true one here (the 5%-bound contract at scale rides the driver
    row)."""
    specs = [("nd", "v", "approx_distinct")]
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 9), ("b", 9), ("a", 3)]
    b1, b2 = rows[:3], rows[3:]
    one_shot = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.partial_agg_state(_facts(spark, rows), ["k"], specs), ["k"], specs
        ).collect()
    }
    state = IVM.partial_agg_state(_facts(spark, b2), ["k"], specs)
    state = IVM.incremental_agg_refresh(state, _facts(spark, b1), ["k"], specs)
    merged = {
        tuple(r)
        for r in IVM.finalize_agg_state(state, ["k"], specs).collect()
    }
    assert merged == one_shot == {("a", 3), ("b", 1)}
    assert IVM.state_columns(specs) == ["nd__hll"]
    # duplicate members across batches must not double-count (the
    # reason scalar state cannot express this aggregate)
    again = IVM.incremental_agg_refresh(state, _facts(spark, b1), ["k"], specs)
    est = {
        tuple(r) for r in IVM.finalize_agg_state(again, ["k"], specs).collect()
    }
    assert est == one_shot


def test_reaggregate_state_matches_direct_coarse_agg(spark):
    rows = [("a", "x", 1), ("a", "y", 5), ("a", "y", 2), ("b", "x", 10)]
    df = spark.createDataFrame(rows, "k string, sub string, v long")
    fine = IVM.partial_agg_state(df, ["k", "sub"], SPECS)
    coarse = IVM.reaggregate_state(fine, ["k"], SPECS)
    got = {
        tuple(r) for r in IVM.finalize_agg_state(coarse, ["k"], SPECS).collect()
    }
    want = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.partial_agg_state(df, ["k"], SPECS), ["k"], SPECS
        ).collect()
    }
    assert got == want
    # the rewrite's point: avg of per-sub avgs would NOT equal this
    # (a: (1, 3.5) vs true 8/3) - the (sum, count) pair is load-bearing
    a_mean = dict((r["k"], r["mean"]) for r in
                  IVM.finalize_agg_state(coarse, ["k"], SPECS).collect())
    assert a_mean["a"] == pytest.approx(8 / 3)


def test_joined_merge_equals_agg_merge_all_kinds(spark):
    """merge_states_joined is output-identical to merge_agg_states for
    every kind - one-sided groups, NULL partials, NULL group keys,
    retractions, sketches, synopses."""
    specs = SPECS + [
        ("nd", "v", "approx_distinct"),
        ("rmx", "v", "retractable_max"),
    ]
    rows_a = [("a", 1), ("a", None), ("b", 10), (None, 3)]
    rows_b = [("a", 5), ("c", 7), (None, 4), ("d", None)]
    fa = spark.createDataFrame(rows_a, "k string, v long")
    fb = spark.createDataFrame(rows_b, "k string, v long")
    sa = IVM.partial_agg_state(fa, ["k"], specs)
    sb = IVM.partial_agg_state(fb, ["k"], specs)
    want = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_agg_states([sa, sb], ["k"], specs), ["k"], specs
        ).collect()
    }
    got = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_states_joined(sa, sb, ["k"], specs, null_safe_keys=True),
            ["k"],
            specs,
        ).collect()
    }
    assert got == want and len(got) == 5  # a, b, c, d, NULL groups
    # default plain-equality keys: the NULL-key group stays one-sided
    # per side (documented) - every non-null group still combines right
    plain = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_states_joined(sa, sb, ["k"], specs), ["k"], specs
        ).collect()
    }
    assert {t for t in plain if t[0] is not None} == {
        t for t in want if t[0] is not None
    }
    # retraction through the joined path too
    ret = IVM.partial_agg_state(
        spark.createDataFrame([("a", 5)], "k string, v long"),
        ["k"],
        [s for s in specs if s[2] not in ("min", "max", "approx_distinct",
                                          "retractable_max")],
        sign=-1,
    )
    specs_r = [s for s in specs if s[2] not in ("min", "max", "approx_distinct",
                                                "retractable_max")]
    sa_r = IVM.partial_agg_state(fa, ["k"], specs_r)
    sb_r = IVM.partial_agg_state(fb, ["k"], specs_r)
    base = IVM.merge_agg_states([sa_r, sb_r], ["k"], specs_r)
    want_r = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_agg_states([base, ret], ["k"], specs_r), ["k"], specs_r
        ).collect()
    }
    got_r = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_states_joined(base, ret, ["k"], specs_r), ["k"], specs_r
        ).collect()
    }
    assert got_r == want_r


def test_joined_refresh_bucketed_state_never_shuffles(spark, tmp_path):
    """The 100 TB refresh shape: with the state persisted BUCKETED on
    the group keys, the join-shaped refresh moves only the delta's
    partials - the state side carries no Exchange, while the plain
    parquet state must shuffle for the same join."""
    from nyc_government_hiring_audit_data_platform_spark.operators import (
        bucketing as B,
    )
    from nyc_government_hiring_audit_data_platform_spark.plans import inspect as PI

    facts = spark.range(0, 5000).select(
        (F.col("id") % 97).cast("string").alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    state = IVM.partial_agg_state(facts, ["k"], SPECS)
    B.write_bucketed(state, "ivm_state_bucketed", ["k"], 8)
    plain_path = str(tmp_path / "state_plain")
    state.write.parquet(plain_path)
    delta = spark.range(5000, 5500).select(
        (F.col("id") % 101).cast("string").alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = IVM.incremental_agg_refresh_joined(
            spark.table("ivm_state_bucketed"), delta, ["k"], SPECS
        )
        plain = IVM.incremental_agg_refresh_joined(
            spark.read.parquet(plain_path), delta, ["k"], SPECS
        )
        n_b, n_p = PI.shuffle_count(bucketed), PI.shuffle_count(plain)
        assert n_b < n_p, (n_b, n_p)  # the state-side Exchange is gone
        got = {
            tuple(r)
            for r in IVM.finalize_agg_state(bucketed, ["k"], SPECS).collect()
        }
        want = {
            tuple(r)
            for r in IVM.finalize_agg_state(
                IVM.incremental_agg_refresh(state, delta, ["k"], SPECS),
                ["k"],
                SPECS,
            ).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ivm_state_bucketed")


def test_refresh_plan_reads_state_not_base_facts(spark, tmp_path):
    """The IVM contract at the plan level: a refresh over a PERSISTED
    state scans the state files and the delta - the base-fact path must
    not appear anywhere in the executed plan."""
    base_path = str(tmp_path / "facts_base")
    state_path = str(tmp_path / "state")
    _facts(spark, [("a", 1), ("b", 10), ("b", 2)]).write.parquet(base_path)

    base = spark.read.parquet(base_path)
    IVM.partial_agg_state(base, ["k"], SPECS).write.parquet(state_path)

    delta = _facts(spark, [("a", 5), ("c", 7)])
    refreshed = IVM.incremental_agg_refresh(
        spark.read.parquet(state_path), delta, ["k"], SPECS
    )
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    assert "facts_base" not in plan
    assert "state" in plan
    got = {
        tuple(r)
        for r in IVM.finalize_agg_state(refreshed, ["k"], SPECS).collect()
    }
    assert got == _final(
        spark, [("a", 1), ("b", 10), ("b", 2), ("a", 5), ("c", 7)]
    )


def test_approx_median_all_null_group_degrades_to_null(spark):
    """An all-NULL group's KLL sketch is EMPTY (not NULL) and
    get_quantile throws on it - finalize must degrade that group to
    NULL like every other kind, not poison the whole job."""
    specs = [("med", "v", "approx_median"), ("n", "v", "count")]
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 5)], "k string, v long"
    )
    state = IVM.partial_agg_state(df, ["k"], specs)
    got = {
        r["k"]: (r["med"], r["n"])
        for r in IVM.finalize_agg_state(
            state, ["k"], specs, drop_empty=False
        ).collect()
    }
    assert got["a"] == (None, 0)
    assert got["b"] == (5, 1)


def test_synopsis_r_is_persisted_not_caller_supplied(spark):
    """The exactness certificate must use the R the state was BUILT
    with: a state built at R=2 whose deletion side hit its cap,
    finalized with the default R=8, previously passed size(topd) < 8
    and could certify a wrong extreme (round-11 ADVICE). Now the cap
    rides the state's __synopsis_r column, and merging states built at
    a different R than the merge's refuses loudly."""
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    specs = [("mx", "v", "retractable_max")]
    ins = _facts(spark, [("z", i) for i in range(1, 7)])
    dels = _facts(spark, [("z", 6), ("z", 5)])
    st = IVM.partial_agg_state(ins, ["k"], specs, synopsis_r=2)
    st = IVM.incremental_agg_refresh(st, dels, ["k"], specs, sign=-1, synopsis_r=2)
    # finalize with the DEFAULT (8): stored R=2 governs - deletion side
    # at its cap cannot certify
    row = IVM.finalize_agg_state(st, ["k"], specs).collect()[0]
    assert row["mx"] is None and row["mx_ok"] is False
    # merging with a mismatched synopsis_r raises instead of guessing,
    # through both merge shapes
    other = IVM.partial_agg_state(ins, ["k"], specs)  # default R=8
    with pytest.raises(Exception, match="synopsis_r"):
        IVM.merge_agg_states([st, other], ["k"], specs).collect()
    with pytest.raises(Exception, match="synopsis_r"):
        IVM.merge_states_joined(st, other, ["k"], specs).collect()
    # matched R everywhere still round-trips (control)
    ok = IVM.merge_agg_states(
        [IVM.partial_agg_state(ins, ["k"], specs, synopsis_r=4)],
        ["k"], specs, synopsis_r=4,
    )
    row = IVM.finalize_agg_state(ok, ["k"], specs).collect()[0]
    assert row["mx"] == 6 and row["mx_ok"] is True
    # legacy states persisted WITHOUT the column fall back to the
    # caller-supplied R (documented compatibility path)
    legacy = st.drop("__synopsis_r")
    row = IVM.finalize_agg_state(legacy, ["k"], specs, synopsis_r=2).collect()[0]
    assert row["mx"] is None and row["mx_ok"] is False


def test_legacy_states_without_synopsis_col_still_merge(spark):
    """Review finding (r11): a retractable-spec state persisted before
    __synopsis_r existed must MERGE (both shapes), not just finalize -
    the caller-supplied R governs legacy states, same contract as
    finalize's fallback."""
    specs = [("mx", "v", "retractable_max"), ("n", "1", "count")]
    legacy = IVM.partial_agg_state(
        _facts(spark, [("a", 1), ("a", 9)]), ["k"], specs
    ).drop("__synopsis_r")
    fresh = IVM.partial_agg_state(_facts(spark, [("a", 5), ("b", 4)]), ["k"], specs)
    want = {("a", 9, True, 3), ("b", 4, True, 1)}
    got_union = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_agg_states([legacy, fresh], ["k"], specs), ["k"], specs
        ).collect()
    }
    got_joined = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_states_joined(legacy, fresh, ["k"], specs), ["k"], specs
        ).collect()
    }
    assert got_union == want and got_joined == want
    # both-legacy merges work too
    got_2legacy = {
        tuple(r)
        for r in IVM.finalize_agg_state(
            IVM.merge_agg_states(
                [legacy, fresh.drop("__synopsis_r")], ["k"], specs
            ),
            ["k"],
            specs,
        ).collect()
    }
    assert got_2legacy == want


def test_overflow_counter_tightens_certificate_and_monitors(spark):
    """Round-11 VERDICT ask #5: (a) a deletion side that reached its R
    cap WITHOUT slicing anything off is still exact - the old
    size-at-cap test conservatively degraded it; (b) actual slice
    losses count exactly in the state's {out}__dropped column and
    synopsis_overflow_stats reads them off the STATE, before finalize;
    (c) a legacy state (no counter column) reports unknown and falls
    back to the conservative size test."""
    specs = [("mx", "v", "retractable_max")]
    r = 2

    # (a) inserts 9,8,7,6; retract 7,6 - topd holds exactly R=2 values,
    # none dropped; the maintained max 9 is provably exact
    ins = _facts(spark, [("a", v) for v in (9, 8, 7, 6)])
    st = IVM.partial_agg_state(ins, ["k"], specs, synopsis_r=r)
    st = IVM.incremental_agg_refresh(
        st, _facts(spark, [("a", 7), ("a", 6)]), ["k"], specs, sign=-1,
        synopsis_r=r,
    )
    row = IVM.finalize_agg_state(st, ["k"], specs, synopsis_r=r).collect()[0]
    assert row["mx"] == 9 and row["mx_ok"] is True
    stats = IVM.synopsis_overflow_stats(st, specs)["mx"]
    assert stats == {
        "n_groups": 1, "groups_overflowed": 0, "groups_unknown": 0,
        "overflow_rate": 0.0,
    }

    # (b) retract three values: one slices off - dropped counts it
    # exactly, the certificate degrades, and the monitor sees it from
    # the state alone
    st2 = IVM.partial_agg_state(ins, ["k"], specs, synopsis_r=r)
    st2 = IVM.incremental_agg_refresh(
        st2, _facts(spark, [("a", 7), ("a", 6), ("a", 8)]), ["k"], specs,
        sign=-1, synopsis_r=r,
    )
    assert st2.collect()[0]["mx__dropped"] == 1
    row = IVM.finalize_agg_state(st2, ["k"], specs, synopsis_r=r).collect()[0]
    assert row["mx"] is None and row["mx_ok"] is False
    stats = IVM.synopsis_overflow_stats(st2, specs)["mx"]
    assert stats["groups_overflowed"] == 1 and stats["overflow_rate"] == 1.0

    # (c) legacy state: counter unknown -> conservative size-at-cap
    # fallback (case (a)'s exact-but-at-cap group degrades again), and
    # the monitor counts it as unknown, never as clean
    legacy = st.drop("mx__dropped")
    row = IVM.finalize_agg_state(legacy, ["k"], specs, synopsis_r=r).collect()[0]
    assert row["mx"] is None and row["mx_ok"] is False
    stats = IVM.synopsis_overflow_stats(legacy, specs)["mx"]
    assert stats["groups_unknown"] == 1 and stats["groups_overflowed"] == 0
    # unknown survives merging with a clean delta (never laundered)
    merged = IVM.incremental_agg_refresh(
        legacy, _facts(spark, [("a", 1)]), ["k"], specs, synopsis_r=r
    )
    assert merged.collect()[0]["mx__dropped"] is None
    mergedj = IVM.incremental_agg_refresh_joined(
        legacy, _facts(spark, [("a", 1)]), ["k"], specs, synopsis_r=r
    )
    assert mergedj.collect()[0]["mx__dropped"] is None
    with pytest.raises(ValueError, match="no retractable"):
        IVM.synopsis_overflow_stats(st, [("n", "1", "count")])


def test_suggest_synopsis_r_sizes_from_multiplicity_quantile(spark):
    """The sizing recipe: R from the per-group multiplicity quantile.
    At quantile 1.0 no group can ever overflow (retractions are bounded
    by inserts); at a lower quantile exactly the heavier-than-quantile
    groups degrade - to null, loudly - when fully retracted (the
    degrade-to-null path pinned at a chosen quantile)."""
    import math

    # group sizes: g0..g8 have 2 rows, g9 has 40 (the hot group)
    rows = [(f"g{i}", v) for i in range(9) for v in (1, 2)]
    rows += [("g9", v) for v in range(40)]
    facts = _facts(spark, rows)
    specs = [("mx", "v", "retractable_max"), ("n", "1", "count")]

    r_all = IVM.suggest_synopsis_r(facts, ["k"], quantile=1.0, headroom=1.0)
    assert r_all == 40
    r_p90 = IVM.suggest_synopsis_r(facts, ["k"], quantile=0.9, headroom=1.0)
    assert r_p90 == math.ceil(2)  # the 90th-percentile group has 2 rows
    assert IVM.suggest_synopsis_r(facts, ["k"], quantile=0.9, headroom=1.5) == 3

    # retract EVERYTHING: at R=r_all every group cancels exactly and
    # drops (zombie count 0); at R=r_p90 the hot group's deletion side
    # overflows -> dropped > 0, and a partial retraction of just its
    # extremes finalizes to (null, false) - degrade-to-null, pinned
    st = IVM.partial_agg_state(facts, ["k"], specs, synopsis_r=r_all)
    st = IVM.incremental_agg_refresh(
        st, facts, ["k"], specs, sign=-1, synopsis_r=r_all
    )
    assert IVM.finalize_agg_state(st, ["k"], specs, synopsis_r=r_all).count() == 0

    st = IVM.partial_agg_state(facts, ["k"], specs, synopsis_r=r_p90)
    hot_rets = _facts(spark, [("g9", v) for v in range(30, 40)])
    st = IVM.incremental_agg_refresh(
        st, hot_rets, ["k"], specs, sign=-1, synopsis_r=r_p90
    )
    stats = IVM.synopsis_overflow_stats(st, specs)["mx"]
    assert stats["groups_overflowed"] == 1 and stats["n_groups"] == 10
    fin = {r["k"]: r for r in IVM.finalize_agg_state(
        st, ["k"], specs, synopsis_r=r_p90
    ).collect()}
    assert fin["g9"]["mx"] is None and fin["g9"]["mx_ok"] is False
    assert all(fin[f"g{i}"]["mx_ok"] is True for i in range(9))

    with pytest.raises(ValueError, match="quantile"):
        IVM.suggest_synopsis_r(facts, ["k"], quantile=1.5)
    with pytest.raises(ValueError, match="headroom"):
        IVM.suggest_synopsis_r(facts, ["k"], headroom=0.5)


def test_suggest_synopsis_r_discrete_gap_covers_quantile(spark):
    """Regression (round-12 ADVICE): with a GAP in the multiplicity
    distribution the quantile must round UP across it - the smallest m
    with cume_dist >= q, never the largest m strictly below the cut.
    Sizes [1,1,1,10]: cume_dist is 0.75 at m=1 and 1.0 at m=10, so
    q=0.9 must return 10 (covering 100% >= 90% of groups); the old
    max-where-cd<=q selection returned 1, under which a fully-retracted
    m=10 group - inside the promised quantile - would overflow."""
    rows = [(f"g{i}", 1) for i in range(3)] + [("g3", v) for v in range(10)]
    facts = _facts(spark, rows)
    assert IVM.suggest_synopsis_r(facts, ["k"], quantile=0.9, headroom=1.0) == 10
    # at/below the covered mass the cut stays tight
    assert IVM.suggest_synopsis_r(facts, ["k"], quantile=0.75, headroom=1.0) == 1
    # empty facts: honest floor of 1
    assert IVM.suggest_synopsis_r(facts.limit(0), ["k"], quantile=0.9) == 1
