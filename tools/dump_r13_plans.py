"""Dump .explain('formatted') for named queries into plans/r13/.

Usage: python tools/dump_r13_plans.py SUFFIX OUTDIR query [query ...]
  SUFFIX: 'before' or 'after' (file name suffix)
Run from the checkout whose plans you want (worktree for 'before').
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix, outdir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"plans_r13_{suffix}")
    for name in names:
        df = DQ.QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
