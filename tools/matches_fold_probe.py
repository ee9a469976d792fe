"""Matches-corpus fold probe: the small-files axis of the weekly
lifecycle (round-12 VERDICT ask #1 / round-13 SCALING panel).

`read_ingested_matches` is the PRODUCTION read path for everything
downstream of the fuzzy ingest (the GOLD refresh reads it every
cycle). Unfolded, it unions one parquet dir per ingested batch - at
the reference's weekly cron (src/fuzzy_flows.py:16-23) that is ~52
dirs/year, each a listing + footer + scan task, forever. This probe
prices that axis: N batch dirs at x8 / x64 / x512, read wall-time and
file count before vs after `compact_matches_corpus` folds them into
the versioned `mbase_v{n}` base.

Honest scope: the fold retires the DATA-path cost only. The
per-batch `_meta.json` files are deliberately preserved (the
covered-set and replay bookkeeping read them), so the DRIVER-side
meta walk in `_covered_postings_batches` stays O(N) - driver
metadata, not executor scan tasks, and it runs only during
maintenance batches, not in the read path.

Usage:  python tools/matches_fold_probe.py [--mults 8 64 512]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _n_parquet_files(root: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        total += sum(
            1
            for f in filenames
            if f.endswith(".parquet") and not f.startswith(".")
        )
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", nargs="+", type=int, default=[8, 64, 512])
    ap.add_argument("--rows-per-batch", type=int, default=200)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from nyc_government_hiring_audit_data_platform_spark.pipelines import (
        hiring_audit as HA,
    )

    # one REAL ingest batch's match rows (the actual pipeline schema),
    # replicated into N per-batch dirs exactly as the sink lays them out
    payroll = HA.make_payroll_fixture(spark, 300)
    postings = HA.make_postings_fixture(spark, 60)
    one_batch = HA.fuzzy_match_salary(
        payroll, postings, prefilter_cutoff=1, score_cutoff=85
    ).limit(args.rows_per_batch)
    one_batch = one_batch.cache()
    n_rows_batch = one_batch.count()

    print(f"| batches | rows | layout | files | read s |")
    print(f"|---|---|---|---|---|")
    for mult in args.mults:
        work = tempfile.mkdtemp(prefix=f"matches_fold_x{mult}_")
        matches_dir = os.path.join(work, "matches")
        os.makedirs(matches_dir)
        proto = os.path.join(work, "proto")
        one_batch.coalesce(1).write.parquet(proto)
        part = [f for f in os.listdir(proto) if f.endswith(".parquet")][0]
        for i in range(mult):
            bdir = os.path.join(matches_dir, f"b{i}")
            os.makedirs(bdir)
            shutil.copy(os.path.join(proto, part), os.path.join(bdir, part))
            with open(os.path.join(bdir, "_meta.json"), "w") as f:
                json.dump(
                    {"limit": None, "generations": [], "payroll_deltas": []},
                    f,
                )

        def lap() -> tuple[float, int]:
            t0 = time.monotonic()
            n = HA.read_ingested_matches(spark, matches_dir).count()
            return time.monotonic() - t0, n

        # warm the JVM/readers once on the small shape, measure second lap
        lap()
        sec, n = lap()
        files = _n_parquet_files(matches_dir)
        assert n == n_rows_batch * mult, (n, n_rows_batch, mult)
        print(f"| x{mult} | {n:,} | unfolded | {files} | {sec:.2f} |")

        folded = HA.compact_matches_corpus(spark, matches_dir, lease_dir=None)
        assert len(folded) == mult
        lap()
        sec, n2 = lap()
        files = _n_parquet_files(matches_dir)
        assert n2 == n, (n2, n)
        print(f"| x{mult} | {n:,} | folded | {files} | {sec:.2f} |")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
