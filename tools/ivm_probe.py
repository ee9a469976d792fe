"""History-size-axis probe for incremental aggregate maintenance:
does a refresh stay flat while the full recompute grows?

The cost-model claim under test (operators/incremental.py): a GOLD
refresh folds a FIXED delta batch into the persisted group-keyed
state, so per-run work is O(|delta| + |groups|) - independent of how
much fact HISTORY has accumulated - while the reference's
recompute-from-scratch model (sql/cleaned.sql re-run weekly) is
O(|history|). This probe makes both curves numbers.

History axis: x1 / x4 / x16 replicas of sf0.1 orders, replicated the
way per-customer history actually deepens - o_orderkey shifts per copy
(new orders), o_custkey stays (SAME customers) - so the group count is
constant and the refresh claim is cleanly separable from group growth.
(With customer growth instead, both curves turn linear but refresh
keeps a ~|groups|/|facts| constant-factor advantage; this probe pins
the sharper fixed-groups claim.) Fixed delta = sf0.01 orders,
key-shifted to be new facts.

Protocol per scale: replica + state parquet built once and reused
(build is the one linear pass, reported separately); per lap a FRESH
state read -> refresh -> finalize -> noop sink vs a full
facts-read -> aggregate -> finalize -> noop; one warm lap + one timed
lap each, clearCache between laps.

Usage: python tools/ivm_probe.py [--mults 1,4,16]
Prints a markdown table to append to SCALING.md (curated by hand).

--merge-shapes [--mults N] adds the MERGE-SHAPE axis (round-10 VERDICT
ask #1): at each history scale, one refresh of the SAME delta through
(a) the union+re-agg merge over a plain parquet state (re-shuffles the
whole state every batch) vs (b) the join-shaped merge over a BUCKETED
state (state side never moves; only the delta's partials shuffle).
Reports wall seconds, plan Exchange count, and measured shuffle WRITE
bytes per refresh (from the status REST API), so the per-batch
exchange byte drop is a number, not a plan-shape argument.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from nyc_government_hiring_audit_data_platform_spark.operators import (  # noqa: E402
    incremental as IVM,
)
from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/orders.parquet"
DELTA_SRC = "/root/testdata/sf0.01/orders.parquet"
WORK = "/tmp/spark_graft_ivm_probe"

_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
SPECS: list[IVM.AggSpec] = [
    ("n_orders", "1", "count"),
    ("total_cents", _CENTS, "sum"),
    ("max_cents", _CENTS, "max"),
    ("avg_cents", _CENTS, "avg"),
]
KEYS = ["o_custkey"]


def build_history(spark, mult: int) -> str:
    path = os.path.join(WORK, f"hist_x{mult}")
    if os.path.exists(path):
        return path
    base = spark.read.parquet(BASE)
    shift = 1_000_000_000
    copies = [
        base.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * shift))
        for i in range(mult)
    ]
    hist = copies[0]
    for c in copies[1:]:
        hist = hist.unionByName(c)
    hist.write.mode("overwrite").parquet(path)
    return path


def build_state(spark, hist_path: str, mult: int) -> tuple[str, float | None]:
    """Returns (path, build_seconds) - None when the state was cached
    from a prior run, so a rerun never reports the exists() check as
    the 'one linear pass' cost."""
    path = os.path.join(WORK, f"state_x{mult}")
    if os.path.exists(path):
        return path, None
    t0 = time.time()
    IVM.partial_agg_state(
        spark.read.parquet(hist_path), KEYS, SPECS
    ).write.mode("overwrite").parquet(path)
    return path, round(time.time() - t0, 2)


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def lap_refresh(spark, state_path: str, delta) -> float:
    state = spark.read.parquet(state_path)
    return _noop(
        IVM.finalize_agg_state(
            IVM.incremental_agg_refresh(state, delta, KEYS, SPECS), KEYS, SPECS
        )
    )


def lap_recompute(spark, hist_path: str, delta) -> float:
    facts = spark.read.parquet(hist_path).unionByName(delta)
    return _noop(
        IVM.finalize_agg_state(
            IVM.partial_agg_state(facts, KEYS, SPECS), KEYS, SPECS
        )
    )


def _shuffle_write_bytes(spark) -> int:
    from nyc_government_hiring_audit_data_platform_spark.plans.inspect import (
        shuffle_write_bytes,
    )

    return shuffle_write_bytes(spark)


def lap_merge_shapes(spark, state_path: str, delta, mult: int):
    """One refresh per merge shape over the same state + delta:
    (union+re-agg over plain parquet) vs (joined over bucketed).
    Returns rows of (shape, seconds, exchanges, shuffle_bytes)."""
    from nyc_government_hiring_audit_data_platform_spark.plans import (
        inspect as PI,
    )

    tbl = f"ivm_probe_state_x{mult}"
    if not spark.catalog.tableExists(tbl):
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        bucket_path = os.path.join(WORK, f"state_bucketed_x{mult}")
        if os.path.exists(bucket_path):
            import shutil

            shutil.rmtree(bucket_path)
        (
            spark.read.parquet(state_path)
            .write.mode("overwrite")
            .bucketBy(n_buckets, *KEYS)
            .option("path", bucket_path)
            .saveAsTable(tbl)
        )
    out = []
    for shape in ("union_reagg_parquet", "joined_bucketed"):
        if shape == "union_reagg_parquet":
            refreshed = IVM.incremental_agg_refresh(
                spark.read.parquet(state_path), delta, KEYS, SPECS
            )
        else:
            refreshed = IVM.incremental_agg_refresh_joined(
                spark.table(tbl), delta, KEYS, SPECS
            )
        _noop(refreshed)  # warm
        spark.catalog.clearCache()
        b0 = _shuffle_write_bytes(spark)
        secs = _noop(refreshed)
        bytes_moved = _shuffle_write_bytes(spark) - b0
        out.append((shape, secs, PI.shuffle_count(refreshed), bytes_moved))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,4,16")
    ap.add_argument("--merge-shapes", action="store_true")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    os.makedirs(WORK, exist_ok=True)
    # the merge-shape axis reads task metrics off the UI's REST API
    extra = {"spark.ui.enabled": "true"} if args.merge_shapes else None
    spark = get_spark(app_name="ivm-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    delta = (
        spark.read.parquet(DELTA_SRC)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(77_000_000_000))
    )
    n_delta = delta.count()

    if args.merge_shapes:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        print("| history | shape | refresh s | plan exchanges | shuffle bytes |")
        print("|---|---|---|---|---|")
        try:
            for m in mults:
                hist = build_history(spark, m)
                state_path, _ = build_state(spark, hist, m)
                for shape, secs, nex, nbytes in lap_merge_shapes(
                    spark, state_path, delta, m
                ):
                    print(
                        f"| x{m} | {shape} | {secs:.2f} | {nex} | {nbytes:,} |",
                        flush=True,
                    )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        print(f"\n(fixed delta {n_delta} rows; bytes = measured shuffle "
              "writes for the timed refresh lap)")
        spark.stop()
        return

    rows = []
    for m in mults:
        hist = build_history(spark, m)
        state_path, t_build = build_state(spark, hist, m)
        n_hist = spark.read.parquet(hist).count()
        n_groups = spark.read.parquet(state_path).count()
        lap_refresh(spark, state_path, delta)  # warm
        spark.catalog.clearCache()
        t_ref = lap_refresh(spark, state_path, delta)
        spark.catalog.clearCache()
        lap_recompute(spark, hist, delta)  # warm
        spark.catalog.clearCache()
        t_full = lap_recompute(spark, hist, delta)
        spark.catalog.clearCache()
        b = "cached" if t_build is None else f"{t_build:.2f}s"
        rows.append((m, n_hist, n_groups, b, t_ref, t_full))
        print(
            f"x{m}: history={n_hist} groups={n_groups} delta={n_delta} "
            f"state-build={b} refresh={t_ref:.2f}s "
            f"recompute={t_full:.2f}s",
            flush=True,
        )

    def alpha(t_small, t_big, f=None):
        span = (rows[-1][0] / rows[0][0]) if f is None else f
        return math.log(t_big / t_small) / math.log(span)

    a_ref = alpha(rows[0][4], rows[-1][4])
    a_full = alpha(rows[0][5], rows[-1][5])
    print("\n| history | facts | groups | state build s | refresh s | full recompute s |")
    print("|---|---|---|---|---|---|")
    for m, nh, ng, tb, tr, tf in rows:
        print(f"| x{m} | {nh:,} | {ng:,} | {tb} | {tr:.2f} | {tf:.2f} |")
    print(
        f"\nper-decade alpha (over the x{rows[0][0]}->x{rows[-1][0]} span): "
        f"refresh {a_ref:.2f}, full recompute {a_full:.2f} "
        f"(fixed delta {n_delta} rows)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
