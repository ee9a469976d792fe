"""Delta-size-axis probe for incremental fuzzy matching.

The cost-model claim under test (operators/fuzzy.py incremental lane):
the reference re-matches ALL payroll x postings on every weekly run
(src/fuzzy_flows.py:16-23), so its per-run cost is O(|payroll| +
|postings|) regardless of how small the week's new-postings delta is.
The incremental lane persists the payroll-title blocking index once and
probes it per batch, so per-run cost should track |delta| and undercut
the full re-match by roughly |postings|/|delta| when deltas are small.

Two axes, inputs derived from sf0.1 part exactly like the driver's
domain queries (driver_queries_domain.payroll_from_part /
postings_from_part), scorer = the oracle-expressible tokensort lane:

- ``--fracs``: delta fraction of the postings corpus (1%/10%/100%) at
  a fixed payroll;
- ``--paymults``: payroll-side multiplier (x1/x8/x64 replicas with
  per-copy title suffixes, so the distinct-title domain grows
  linearly - the testdata part names carry only 64 distinct titles,
  which under-drives the blocking join) at a fixed 1% delta. This is
  the axis the incremental lane exists for: the full re-match re-pays
  the whole payroll-side blocking work weekly, the index probe pays
  it once at build time.

Per point: one warm + one timed lap of (a) the FULL re-match over all
postings and (b) the index probe of just the delta (index read from
parquet; its build cost reported once, separately - the one-time
linear pass).

- ``--shapes``: the round-12 index-shape axis (mirror of the r11
  merge-shapes panel): at a fixed 1% delta, persist the SAME index
  plain-parquet vs BUCKETED on the blocking key and measure what the
  weekly probe plan actually moves (shuffle WRITE bytes via the UI
  REST counter, exchange count, wall seconds) as the payroll side
  grows. The plan measured here is the production sink's own per-batch
  plan (run_fuzzy_match_ingest compiles exactly this
  incremental_fuzzy_match_salary over read_title_index; the sink's
  meta-recorded exchange count is plan-gated in tests/test_fuzzy.py).
  autoBroadcastJoinThreshold is disabled for this axis: it models the
  100 TB regime where the weekly delta is too big to broadcast - with
  broadcast on, small deltas broadcast and NEITHER shape shuffles.

Usage: python tools/fuzzy_incr_probe.py [--fracs 0.01,0.1,1.0]
                                        [--paymults 1,8,64]
                                        [--shapes]
Prints markdown tables to append to SCALING.md (curated by hand).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from nyc_government_hiring_audit_data_platform_spark import (  # noqa: E402
    driver_queries_domain as DQD,
)
from nyc_government_hiring_audit_data_platform_spark.operators import (  # noqa: E402
    fuzzy as FZ,
)
from nyc_government_hiring_audit_data_platform_spark.pipelines import (  # noqa: E402
    hiring_audit as HA,
)
from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/spark_graft_fuzzy_incr_probe"


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _mult_payroll(payroll, m: int):
    """x``m`` payroll with per-copy title suffixes: rows AND the
    distinct-title domain grow linearly (a bare union would only
    duplicate rows of the same 64 titles)."""
    copies = [payroll]
    for i in range(1, m):
        copies.append(
            payroll.withColumn(
                "title_description",
                F.concat_ws(
                    " ", F.col("title_description"), F.lit(f"grade {i}")
                ),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _lap_pair(spark, payroll, postings, index, delta):
    """(full re-match seconds, index probe seconds), one warm lap each."""
    full = HA.fuzzy_match_salary(
        payroll, postings, prefilter_cutoff=1, score_cutoff=85,
        join_fn=FZ.fuzzy_join_tokensort, row_key="post_id",
    )
    inc = HA.incremental_fuzzy_match_salary(
        payroll, index, delta, prefilter_cutoff=1, score_cutoff=85,
        row_key="post_id",
    )
    _noop(full)
    t_full = _noop(full)
    _noop(inc)
    t_inc = _noop(inc)
    return t_full, t_inc


def _build_index(spark, payroll, tag: str):
    """Persist the payroll-title index once; returns (df, rows, secs)."""
    idx_path = os.path.join(WORK, f"payroll_title_index_{tag}")
    t0 = time.time()
    HA.build_payroll_title_index(payroll).write.mode("overwrite").parquet(idx_path)
    t_build = time.time() - t0
    index = spark.read.parquet(idx_path)
    return index, index.count(), t_build


def _index_shape_axis(spark, payroll, paymults, delta, n_delta) -> None:
    """Plain-parquet vs bucketed index: bytes the probe plan moves."""
    import shutil

    from nyc_government_hiring_audit_data_platform_spark.plans import (
        inspect as PI,
    )

    print(
        f"\nindex-shape axis (fixed delta = {n_delta} rows; "
        "autoBroadcastJoinThreshold=-1 models a non-broadcastable "
        "weekly delta). 'pairs moved' isolates the stage the bucketed "
        "layout changes - the delta-keys x index equi-join (shuffle "
        "WRITE bytes of one pairs action, UI REST diff, single job at "
        "a time); the e2e row re-attach downstream is pairs-sized and "
        "broadcasts under AQE in production, identically for both "
        "shapes:"
    )
    print("| payroll | index rows | shape | exchanges | pairs moved | pairs s |")
    print("|---|---|---|---|---|---|")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        delta_prep = HA._prep_postings(delta)
        for m in paymults:
            pay_m = _mult_payroll(payroll, m)
            idx = HA.build_payroll_title_index(pay_m)
            n_idx = idx.count()
            for shape in ("parquet", "bucketed"):
                idx_dir = os.path.join(WORK, f"shape_{shape}_x{m}")
                shutil.rmtree(idx_dir, ignore_errors=True)
                FZ.write_title_index(idx, idx_dir, shape)
                pairs = FZ.incremental_fuzzy_pairs_tokensort(
                    FZ.read_title_index(spark, idx_dir), delta_prep,
                    "business_title", 1, 85,
                )
                exchanges = PI.shuffle_count(pairs)
                _noop(pairs)  # warm
                before = PI.shuffle_write_bytes(spark)
                t = _noop(pairs)
                moved = PI.shuffle_write_bytes(spark) - before
                print(
                    f"| x{m} | {n_idx:,} | {shape} | {exchanges} "
                    f"| {moved / 1024:.0f} KB | {t:.2f} |",
                    flush=True,
                )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fracs", default="0.01,0.1,1.0")
    ap.add_argument("--paymults", default="1,8,64")
    ap.add_argument("--shapes", action="store_true")
    args = ap.parse_args()
    fracs = [float(f) for f in args.fracs.split(",")]
    paymults = [int(m) for m in args.paymults.split(",")]

    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(
        app_name="fuzzy-incr-probe",
        extra_conf={"spark.ui.enabled": "true"} if args.shapes else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    payroll = DQD.payroll_from_part(spark, SF_DIR)
    postings = DQD.postings_from_part(spark, SF_DIR)
    n_post = postings.count()

    def delta_of(frac: float):
        mod = max(1, round(1 / frac))
        d = postings.filter((F.col("post_id") / 4) % mod == 0)
        return d, d.count()

    if args.shapes:
        delta, n_delta = delta_of(fracs[0])
        _index_shape_axis(spark, payroll, paymults, delta, n_delta)
        spark.stop()
        return

    index, n_idx, t_build = _build_index(spark, payroll, "x1")
    print(
        f"postings={n_post:,} index rows={n_idx:,} "
        f"index build (one-time)={t_build:.2f}s\n"
    )
    print("| delta frac | delta rows | full re-match s | index probe s | ratio |")
    print("|---|---|---|---|---|")
    for frac in fracs:
        delta, n_delta = delta_of(frac)
        t_full, t_inc = _lap_pair(spark, payroll, postings, index, delta)
        print(
            f"| {frac:g} | {n_delta:,} | {t_full:.2f} | {t_inc:.2f} "
            f"| {t_full / t_inc:.1f}x |",
            flush=True,
        )

    delta, n_delta = delta_of(fracs[0])
    print(
        f"\npayroll-side axis (fixed delta = {n_delta} rows, "
        f"{fracs[0]:g} of postings). 'pairs' columns isolate the work "
        "the index actually avoids - blocking + scoring over the stable "
        "side's title domain; the end-to-end columns additionally carry "
        "the row re-attach scan, which BOTH paths pay identically:"
    )
    print("| payroll | payroll rows | index build s | full pairs s "
          "| probe pairs s | full e2e s | probe e2e s |")
    print("|---|---|---|---|---|---|---|")
    n_pay = payroll.count()
    for m in paymults:
        pay_m = _mult_payroll(payroll, m)
        idx_m, _, t_build = _build_index(spark, pay_m, f"x{m}")
        # pairs-only: the blocking join + scoring, no row re-attach
        post_prep = HA._prep_postings(postings)
        delta_prep = HA._prep_postings(delta)
        pay_prep = HA._prep_payroll(pay_m, 2024, 2025)
        full_pairs = FZ.fuzzy_title_pairs_tokensort(
            post_prep, pay_prep, "business_title", "title_description", 1, 85
        )
        probe_pairs = FZ.incremental_fuzzy_pairs_tokensort(
            idx_m, delta_prep, "business_title", 1, 85
        )
        _noop(full_pairs)
        t_fp = _noop(full_pairs)
        _noop(probe_pairs)
        t_pp = _noop(probe_pairs)
        t_full, t_inc = _lap_pair(spark, pay_m, postings, idx_m, delta)
        print(
            f"| x{m} | {n_pay * m:,} | {t_build:.2f} | {t_fp:.2f} "
            f"| {t_pp:.2f} | {t_full:.2f} | {t_inc:.2f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
