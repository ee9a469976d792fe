"""``spark.read.format("mp4_metadata")`` - executor-parallel video
metadata inventory over MP4 files.

Each input partition is one file; the task runs the moov-only scan
(operators/mp4.py:scan_mp4_file - box headers + moov body, seeks past
mdat) and emits one row per track with the resolved sample-table
summary. Per-file I/O is the moov size (KBs), not the media size, so
the inventory scan over a 100 TB video corpus moves metadata only -
the parquet-footer discipline applied to video. Corrupt files become
quarantine rows (error column) instead of failing the scan, matching
read_csv_lenient's PERMISSIVE posture.

Extends the S-family sources (SURVEY.md §2.1) the same way the
paginated-API DataSource does: a Spark 4 Python DataSource, registered
per-session, schema fixed by the source.
"""

from __future__ import annotations

from nyc_government_hiring_audit_data_platform_spark.sources.files import (
    glob_any_store,
    open_any_store,
)
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MP4_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("track_id", IntegerType()),
        StructField("handler", StringType()),
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("timescale", LongType()),
        StructField("duration", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_keyframes", LongType()),
        StructField("total_sample_bytes", LongType()),
        StructField("error", StringType()),  # NULL = clean parse
    ]
)


class _Mp4FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _Mp4MetadataReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("mp4_metadata requires option('path', <glob>)")

    def partitions(self) -> Sequence[InputPartition]:
        # driver-side listing: local glob or Hadoop FS for store URIs
        files = glob_any_store(self.path)
        return [_Mp4FilePartition(p) for p in files] or [_Mp4FilePartition("")]

    def read(self, partition: _Mp4FilePartition) -> Iterator[tuple]:
        from nyc_government_hiring_audit_data_platform_spark.operators.mp4 import (
            scan_mp4_file,
        )

        if not partition.path:
            return
        try:
            # executor-side open via pyarrow fs for store URIs; the
            # moov-only scan needs a SEEKABLE handle, which pyarrow's
            # NativeFile provides
            with open_any_store(partition.path) as f:
                tracks = scan_mp4_file(f)
        except (ValueError, OSError) as e:
            yield (partition.path, -1, None, None, -1, -1, -1, -1, -1, -1, -1,
                   str(e)[:200])
            return
        for t in tracks:
            yield (
                partition.path,
                t.track_id,
                t.handler,
                t.codec,
                t.width,
                t.height,
                t.timescale,
                t.duration,
                len(t.samples),
                len(t.keyframe_indices),
                sum(s.size for s in t.samples),
                None,
            )


class Mp4MetadataDataSource(DataSource):
    """Batch source: one retryable task per file, moov-only reads."""

    @classmethod
    def name(cls) -> str:
        return "mp4_metadata"

    def schema(self) -> StructType:
        return MP4_META_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Mp4MetadataReader(schema, self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(Mp4MetadataDataSource)


def read_mp4_metadata(spark: SparkSession, path_glob: str):
    register(spark)
    return spark.read.format("mp4_metadata").option("path", path_glob).load()
