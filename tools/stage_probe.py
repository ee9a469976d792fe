"""Per-job/per-stage wall breakdown for one query via the UI REST API.

Runs QUERY with the UI enabled, then dumps each job (description,
duration, stage count) and the slowest stages (task time, launch
spread) so local seconds can be attributed to scheduling, codegen,
broadcast builds, or real compute.

Usage: python tools/stage_probe.py QUERY [--sf DIR] [--laps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402


def get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--laps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(
        app_name=f"stage_probe_{args.query}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    DQ.table(spark, args.sf, "lineitem").count()
    fn = DQ.QUERIES[args.query]
    # warm lap + timed laps, bench methodology
    fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    marks = []
    for _ in range(args.laps):
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        marks.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        spark.catalog.clearCache()
    print("laps (build, run):", marks)

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs = get(f"{base}/api/v1/applications/{app}/jobs")
    stages = get(f"{base}/api/v1/applications/{app}/stages?status=complete")

    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    jw = 0.0
    print(f"\n{len(jobs)} jobs total:")
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        dur = ts(j["completionTime"]) - ts(j["submissionTime"])
        jw += dur
        if dur > 0.1:
            print(
                f"  job {j['jobId']:4d} {dur:7.3f}s stages={len(j['stageIds'])}"
                f" tasks={j['numTasks']:4d} {j.get('description','')[:80]}"
            )
    print(f"sum of job durations: {jw:.2f}s")

    st = sorted(stages, key=lambda s: -(ts(s["completionTime"]) - ts(s["submissionTime"])))
    print(f"\nslowest stages of {len(stages)}:")
    for s in st[:25]:
        dur = ts(s["completionTime"]) - ts(s["submissionTime"])
        first = ts(s["firstTaskLaunchedTime"]) - ts(s["submissionTime"])
        print(
            f"  stage {s['stageId']:5d} {dur:7.3f}s tasks={s['numTasks']:4d}"
            f" exec={s['executorRunTime']/1000:7.2f}s cpu={s['executorCpuTime']/1e9:7.2f}s"
            f" launch_delay={first:6.3f}s {s['name'][:60]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()


def sql_metrics(query: str, sf: str) -> None:
    """Dump per-node metrics of the slowest SQL executions."""
    spark = get_spark(
        app_name=f"sql_probe_{query}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    DQ.table(spark, sf, "lineitem").count()
    fn = DQ.QUERIES[query]
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    print(f"timed lap: {time.perf_counter() - t0:.3f}s")
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    execs = get(f"{base}/api/v1/applications/{app}/sql?length=200")
    execs = sorted(execs, key=lambda e: -e.get("duration", 0))
    for e in execs[:8]:
        print(f"\n== sql exec {e['id']} dur={e['duration']}ms {e['description'][:70]}")
        det = get(f"{base}/api/v1/applications/{app}/sql/{e['id']}?details=true&planDescription=false")
        for node in det.get("nodes", []):
            mt = {m["name"]: m["value"] for m in node.get("metrics", [])}
            interesting = {
                k: v for k, v in mt.items()
                if any(s in k for s in ("time", "duration", "rows")) and v not in ("0", "0 ms")
            }
            if interesting:
                print(f"  [{node['nodeId']:3d}] {node['nodeName'][:45]:45s} {interesting}")
    spark.stop()


if __name__ == "__main__" and "--sql" in sys.argv:
    sys.argv.remove("--sql")
