"""Per-slot cost split: DataFrame CONSTRUCTION vs EXECUTION.

For each bench slot (or an explicit query list): time
  (a) build   - the ``fn(spark, sf_dir)`` call (Py4J round-trips +
                eager analysis of every intermediate Dataset),
  (b) run1    - first noop save (execution + codegen compile),
  (c) run2    - second noop save (steady-state execution),
with ``clearCache()`` between queries (the bench contract). run2 is
the number bench.py's best-of-2 converges to; build is pure flat
driver cost that amortizes at scale but is real local wall; run1-run2
approximates per-plan compile/first-materialization cost.

Usage: python tools/profile_slots.py [--sf DIR] [query ...]
Prints one JSON line per slot and a sorted summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if args.queries:
        names = args.queries
    else:
        import bench

        names = bench.BENCH_QUERIES

    spark = get_spark(app_name="profile_slots")
    DQ.table(spark, args.sf, "lineitem").count()  # session warm-up

    rows = []
    for name in names:
        fn = DQ.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        # rebuild (the bench times fn() + save together per lap)
        df = fn(spark, args.sf)
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        spark.catalog.clearCache()
        row = {
            "query": name,
            "build1": round(t1 - t0, 3),
            "run1": round(t2 - t1, 3),
            "build2": round(t3 - t2, 3),
            "run2": round(t4 - t3, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: r["build2"] + r["run2"], reverse=True)
    print("\n-- steady-state (build2+run2) descending --")
    for r in rows[:30]:
        print(
            f"{r['query']:38s} build {r['build2']:7.3f}  run {r['run2']:7.3f}"
            f"  total {r['build2'] + r['run2']:7.3f}"
        )
    tb = sum(r["build2"] for r in rows)
    tr = sum(r["run2"] for r in rows)
    print(f"TOTALS build2 {tb:.1f}s  run2 {tr:.1f}s  all {tb + tr:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
