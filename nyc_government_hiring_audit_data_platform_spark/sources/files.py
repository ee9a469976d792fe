"""File sources/sinks beyond plain parquet (reference parity: S2-S4,
S7, S10-S13).

The reference's buffer-to-MinIO plumbing (convert to parquet bytes, put
object, batch writers, merge-and-cleanup - reference:
src/data_ingestion.py:38-70, src/utils.py:50-116) collapses into
``df.write.parquet`` (S2/S3/S4/S11/S12): Spark tasks write part-files
directly to the object store via the s3a committer, so there is no
local temp, no manual batching, and no merge step. What remains worth
implementing is below.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def write_object_store(
    df: DataFrame, path: str, mode: str = "overwrite", coalesce_single: bool = False
) -> None:
    """S2+S3+S4: parquet sink, local path or s3a:// URI (credentials come
    from Hadoop conf). ``coalesce_single`` only when a single file is
    demanded - it serializes the write (reference's merge step, S12)."""
    out = df.coalesce(1) if coalesce_single else df
    out.write.mode(mode).parquet(path)


def most_recent_file(path: str, extension: str) -> str | None:
    """S7: latest-file resolution (reference: src/utils.py:32-42 picks
    max ctime over a glob). Kept for parity with single-file layouts;
    directory-of-parquet datasets make it unnecessary."""
    ext = extension.lstrip(".")
    if os.path.isfile(path):
        return path
    patterns = [os.path.join(path, f"*.{ext}"), os.path.join(path, "**", f"*.{ext}")]
    candidates: list[str] = []
    for p in patterns:
        candidates.extend(glob.glob(p, recursive=True))
    if not candidates:
        return None
    return max(candidates, key=os.path.getctime)


def list_store_files(spark: SparkSession, pattern: str) -> list[str]:
    """S8: object-store listing via the Hadoop FileSystem API (the
    reference globs the bucket with SQL, src/utils.py:161-167). Works
    for file://, s3a://, hdfs:// alike."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = p.getFileSystem(conf)
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return [s.getPath().toString() for s in statuses]


def read_xlsx(
    spark: SparkSession, path: str, sheet_name: str | int = 0
) -> DataFrame:
    """S10: XLSX source (the reference's Lightcast sheet lands as a
    pre-built table; README.md:36). pandas.read_excel needs openpyxl,
    which is not in this container - the import is gated and the parquet
    drop-in (a directory with the same columns) is the tested path."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)  # needs openpyxl
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "XLSX ingestion requires openpyxl (not installed here); land the "
            "sheet as parquet with identical columns instead"
        ) from exc
    return spark.createDataFrame(pdf)


def table_name_for_file(file_name: str) -> str:
    """S9/F10 driver-side name munging (reference: src/utils.py:172-173):
    lowercase, dashes and spaces to underscores, extension dropped."""
    base = os.path.basename(file_name)
    stem = base.rsplit(".", 1)[0]
    return stem.lower().replace("-", "_").replace(" ", "_")
