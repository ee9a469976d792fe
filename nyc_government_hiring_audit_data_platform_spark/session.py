"""SparkSession factory.

Single place where execution knobs live so every entry point (driver
harness, pytest, bench.py, pipelines) gets the same tuned session:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting) -
  at 100 TB this is what keeps post-filter stages from running 200k
  tiny tasks or one 500 GB skewed one.
- Arrow on - every Pandas UDF / mapInPandas boundary is Arrow-batched.
- UTC session timezone - parity with the DuckDB oracle (naive UTC).
- shuffle.partitions sized to cores for local runs; on a real cluster
  AQE coalesces from a deliberately-high initial number instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Whole-stage codegen is ON by default (measured round 3: full bench
# 44s interpreted -> 22.5s with codegen at sf0.1, stable across runs).
# SPARK_GRAFT_CODEGEN=0 restores the round-1/2 interpreted-eval
# mitigation for hosts where the C2 JIT compile queue pathologically
# backs up on Spark's generated classes (observed there: 0.7s -> 170s
# on a 64-row broadcast stage); re-measure per round - the pathology is
# host-dependent and did not reproduce in round 3.
LOCAL_CODEGEN = os.environ.get("SPARK_GRAFT_CODEGEN", "1") == "1"


def get_spark(
    app_name: str = "nyc_hiring_audit_spark",
    cpus: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned local SparkSession.

    ``cpus`` controls both master threads and shuffle parallelism; on a
    real cluster you would drop ``master`` and let the resource manager
    decide, keeping the rest of the conf unchanged.
    """
    cpus = cpus or DEFAULT_CPUS
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        # Keep parquet scans splittable and pruned.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # ANSI off: reference semantics are lenient (parse failure -> null).
        .config("spark.sql.ansi.enabled", "false")
    )
    if not LOCAL_CODEGEN:
        # ParallelGC + a modest heap kill the episodic GC storms a 24g
        # G1 heap shows here, and the enlarged code cache (+flushing)
        # stops the JIT from going full -> methods stuck interpreted
        # (thread dumps during multi-second stalls showed hot
        # Expression.eval frames running at tier 0).
        builder = builder.config(
            "spark.sql.codegen.wholeStage", "false"
        ).config(
            "spark.driver.extraJavaOptions",
            "-XX:TieredStopAtLevel=1 -XX:+UseParallelGC "
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
