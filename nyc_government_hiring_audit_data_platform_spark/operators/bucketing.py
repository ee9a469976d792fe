"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of repeated fact-to-fact joins is the
shuffle. Writing both sides bucketed by the join key with the same
bucket count pre-partitions the data ON DISK: Spark's scan reports the
bucketing as the output partitioning, and a subsequent equi-join or
group-by on that key runs with NO Exchange on the bucketed side(s).
This is the persistent form of ``repartition``-based co-location - paid
once at write time, reused by every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table. Sorting
    within buckets additionally enables shuffle-AND-sort-free merge
    joins."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key - planned without a
    shuffle when bucket counts match (verify with plans.inspect)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
