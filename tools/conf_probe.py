"""A/B a set of session-config overrides over representative slots.

Each config variant runs in a FRESH subprocess (the session factory is
a process singleton), timing each query with the bench methodology
(warm-up save, then best-of-2 noop saves, clearCache between).

Usage:
  python tools/conf_probe.py --variant NAME k=v [k=v ...] -- q1 q2 ...
  python tools/conf_probe.py --run-one ... (subprocess entry)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(confs: dict[str, str], queries: list[str], sf: str) -> None:
    sys.path.insert(0, REPO)
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ
    from nyc_government_hiring_audit_data_platform_spark.session import get_spark

    spark = get_spark(app_name="conf_probe", extra_conf=confs)
    DQ.table(spark, sf, "lineitem").count()
    out = {}
    for name in queries:
        fn = DQ.QUERIES[name]
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    print("CONF_PROBE_RESULT " + json.dumps(out))
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--run-one":
        payload = json.loads(args[1])
        run_one(payload["confs"], payload["queries"], payload["sf"])
        return
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sep = args.index("--")
    name = args[args.index("--variant") + 1]
    confs = dict(
        kv.split("=", 1) for kv in args[2:sep] if "=" in kv and not kv.startswith("--")
    )
    queries = args[sep + 1 :]
    payload = json.dumps({"confs": confs, "queries": queries, "sf": sf})
    r = subprocess.run(
        [sys.executable, __file__, "--run-one", payload],
        capture_output=True,
        text=True,
    )
    line = [
        ln for ln in r.stdout.splitlines() if ln.startswith("CONF_PROBE_RESULT ")
    ]
    if not line:
        print(r.stdout[-2000:])
        print(r.stderr[-3000:])
        sys.exit(1)
    res = json.loads(line[-1].split(" ", 1)[1])
    total = round(sum(res.values()), 3)
    print(json.dumps({"variant": name, "total": total, "queries": res}))


if __name__ == "__main__":
    main()
