"""Interleaved A/B harness for bench-slot regressions (BENCH.md protocol).

Protocol (the one that retired the r6 `incremental_neardup_batch` scare
and validated the r8 residual-IVFADC rework): interleaved back-to-back
runs on the same box, FRESH SparkSession per checkout lap, warm-up query
+ N timed reps per lap, `spark.catalog.clearCache()` between reps,
sf0.1 on local[32]. Two lap pairs (A,B,A,B) so ambient drift shows up
as within-checkout spread instead of biasing one side.

Usage:
  python tools/ab_bench.py QUERY --a <repo-or-worktree> --b <repo> \
      [--reps 3] [--sf /root/testdata/sf0.1]
  python tools/ab_bench.py QUERY --run-one <repo> [--reps 3] [--sf ...]

--run-one is the subprocess entry (one checkout, one session, prints a
JSON list of rep seconds on the last stdout line).
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time


def run_one(repo: str, query: str, reps: int, sf: str) -> None:
    sys.path.insert(0, repo)
    from nyc_government_hiring_audit_data_platform_spark.session import get_spark
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    spark = get_spark(app_name=f"ab-{query}")
    fn = DQ.QUERIES[query]
    times = []
    fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm-up
    spark.catalog.clearCache()
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(json.dumps(times))
    spark.stop()


def lap(repo: str, query: str, reps: int, sf: str) -> list[float]:
    out = subprocess.run(
        [sys.executable, __file__, query, "--run-one", repo,
         "--reps", str(reps), "--sf", sf],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        # surface the child's actual failure (check=True would swallow
        # its stderr and show only the command line)
        tail = "\n".join(out.stderr.strip().splitlines()[-15:])
        print(f"lap failed (exit {out.returncode}) for {repo}:\n{tail}",
              file=sys.stderr, flush=True)
        raise subprocess.CalledProcessError(
            out.returncode, out.args, output=out.stdout, stderr=out.stderr
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--a")
    ap.add_argument("--b")
    ap.add_argument("--run-one")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if args.run_one:
        run_one(args.run_one, args.query, args.reps, args.sf)
        return

    assert args.a and args.b, "--a and --b checkouts required"
    res = {"A": [], "B": []}
    for pair in range(2):  # interleave: A,B,A,B
        for label, repo in (("A", args.a), ("B", args.b)):
            t = lap(repo, args.query, args.reps, args.sf)
            res[label].append(t)
            print(f"{args.query} pair{pair + 1} {label}({repo}): {t}", flush=True)
    flat = {k: [x for lap_ in v for x in lap_] for k, v in res.items()}
    med = {k: statistics.median(v) for k, v in flat.items()}
    print(json.dumps({"query": args.query, "A_all": flat["A"],
                      "B_all": flat["B"], "A_median": med["A"],
                      "B_median": med["B"]}))


if __name__ == "__main__":
    main()
