"""Anti-pattern sweep over EVERY registered query's physical plan.

For each query in DQ.QUERIES (or the names given), builds the DataFrame
at the given SF and inspects `.explain("formatted")` WITHOUT executing
it, flagging the guide's anti-patterns:

- BatchEvalPython            (row-at-a-time Python UDF in the plan)
- PythonUDTF / EvalPython    (non-Arrow Python boundary)
- CartesianProduct           (non-broadcast cross join)
- Exchange count             (reported; high counts worth a look)
- SortMergeJoin count        (reported; broadcast candidates)
- scans with empty PushedFilters when the query filters a base column
  cannot be detected mechanically, so scans are reported with their
  ReadSchema width for manual review (widest-first).

Build time (eager analysis) is also recorded per query - the flat
driver cost component profile_slots measures as `build`.

Usage: python tools/plan_audit.py [--sf DIR] [--json OUT] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402


def formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def audit_plan(plan: str) -> dict:
    return {
        "batch_eval_python": plan.count("BatchEvalPython"),
        "arrow_eval_python": plan.count("ArrowEvalPython"),
        "map_in_pandas": plan.count("MapInPandas") + plan.count("MapInArrow"),
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "scans": plan.count("Scan parquet"),
        "rowtostate": plan.count("FlatMapGroupsInPandas"),
        "plan_chars": len(plan),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    names = args.names or sorted(DQ.QUERIES)
    spark = get_spark(app_name="plan_audit")
    rows = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = DQ.QUERIES[name](spark, args.sf)
            plan = formatted_plan(spark, df)
            row = {"query": name, "build_s": round(time.perf_counter() - t0, 3)}
            row.update(audit_plan(plan))
        except Exception as e:  # noqa: BLE001 - survey tool, keep going
            row = {"query": name, "err": f"{type(e).__name__}: {e}"[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        spark.catalog.clearCache()

    flagged = [
        r
        for r in rows
        if r.get("batch_eval_python") or r.get("cartesian") or r.get("err")
    ]
    print("\n-- flagged (BatchEvalPython / CartesianProduct / error) --")
    for r in flagged:
        print(json.dumps(r))
    print(f"\n{len(rows)} plans audited, {len(flagged)} flagged")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
