"""Medallion catalog: BRONZE/GOLD namespaces over Spark's catalog.

The reference keeps BRONZE/GOLD schemas in a DuckDB/DuckLake catalog
(reference: src/db_sync.py:49-50) with CREATE TABLE IF NOT EXISTS
idempotence (src/utils.py:178, sql/cleaned.sql:2,17,28,44) - a known
weakness: a re-run silently keeps stale data. Spark-side equivalents:
databases via ``CREATE DATABASE``, managed tables via ``saveAsTable``,
and EXPLICIT write modes (overwrite/append/ignore/errorifexists) so
refreshes are deliberate. ``mode="ignore"`` reproduces the reference's
IF-NOT-EXISTS behavior when parity matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BRONZE = "bronze"
GOLD = "gold"


def ensure_namespaces(spark: SparkSession) -> None:
    """CREATE SCHEMA IF NOT EXISTS BRONZE/GOLD (reference:
    src/db_sync.py:49-50)."""
    for ns in (BRONZE, GOLD):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {ns}")


def save_table(
    df: DataFrame, namespace: str, name: str, mode: str = "overwrite"
) -> None:
    """CTAS into the catalog (reference S9/S13). ``mode='ignore'`` is the
    reference's CREATE TABLE IF NOT EXISTS; 'overwrite' is the sane
    default for scheduled refreshes."""
    df.write.mode(mode).saveAsTable(f"{namespace}.{name}")


def read_table(spark: SparkSession, namespace: str, name: str) -> DataFrame:
    return spark.table(f"{namespace}.{name}")


def publish_gold(spark: SparkSession, tables: dict[str, DataFrame], mode: str = "overwrite") -> None:
    """Write the four GOLD tables (reference: sql/cleaned.sql) in one
    call; table order mirrors the reference's script."""
    ensure_namespaces(spark)
    for name, df in tables.items():
        save_table(df, GOLD, name, mode=mode)
