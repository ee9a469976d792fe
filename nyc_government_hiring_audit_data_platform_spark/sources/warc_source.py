"""WARC / WET source - the Common Crawl ingestion format.

Pure-stdlib implementation of the WARC record layer (ISO 28500, the
public web-archive spec Common Crawl ships): version line, CRLF header
block, Content-Length-delimited payload, and the two-CRLF record
separator. Handles both plain files and the gzip form Common Crawl
uses (one gzip member per record, concatenated - stdlib zlib consumes
multi-member streams). WET "conversion" records carry extracted plain
text, which is exactly what a training-data pipeline ingests.

``spark.read.format("warc")`` scans a file glob with one retryable
task per file (executor-parallel, the same partitioning discipline as
the mp4_metadata and paginated_api sources); malformed records become
quarantine rows (error column) instead of failing the scan.

``encode_warc`` writes valid fixtures for tests - same
writer-as-fixture-generator pattern as operators/mp4.py.
"""

from __future__ import annotations

from nyc_government_hiring_audit_data_platform_spark.sources.files import (
    glob_any_store,
    open_any_store,
)
import gzip
import io
import zlib
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"


@dataclass
class WarcRecord:
    headers: dict[str, str]
    payload: bytes

    @property
    def record_type(self) -> str:
        return self.headers.get("WARC-Type", "")

    @property
    def target_uri(self) -> str:
        return self.headers.get("WARC-Target-URI", "")


def parse_warc(data: bytes) -> list[WarcRecord]:
    """Parse a plain (uncompressed) WARC byte stream into records.

    Strict on the parts that delimit records (version line,
    Content-Length, the CRLFCRLF separators - a wrong length would
    silently corrupt every following record), lenient on header
    contents."""
    records: list[WarcRecord] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate trailing separator noise between records
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(f"no version line at offset {pos}")
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {version[:20]!r} at {pos}")
        head_end = data.find(_CRLF + _CRLF, eol)
        if head_end < 0:
            raise ValueError(f"unterminated header block at {pos}")
        headers: dict[str, str] = {}
        for line in data[eol + 2 : head_end].split(_CRLF):
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("utf-8", "replace")] = v.strip().decode(
                    "utf-8", "replace"
                )
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"record at {pos}: bad Content-Length") from e
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError(f"record at {pos}: payload truncated")
        records.append(
            WarcRecord(headers, bytes(data[body_start : body_start + length]))
        )
        pos = body_start + length
    return records


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream - the Common
    Crawl per-record-member layout concatenates into one WARC stream."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out.write(d.decompress(data[pos:]))
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at {pos}: {e}") from e
        consumed = len(data[pos:]) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at {pos} consumed nothing")
        pos += consumed
    return out.getvalue()


def read_warc_file(path: str) -> list[WarcRecord]:
    """Parse a .warc / .wet file, transparently handling gzip."""
    with open_any_store(path) as f:  # executor-side: pyarrow fs for URIs
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    return parse_warc(data)


def encode_warc(
    records: list[tuple[str, str, bytes]],
    *,
    compress: bool = False,
    per_record_members: bool = True,
) -> bytes:
    """Fixture writer: (warc_type, target_uri, payload) triples to a
    WARC byte stream; ``compress`` emits the Common Crawl gzip form
    (one member per record when ``per_record_members``)."""
    blobs: list[bytes] = []
    for i, (wtype, uri, payload) in enumerate(records):
        head = [
            b"WARC/1.0",
            f"WARC-Type: {wtype}".encode(),
            f"WARC-Record-ID: <urn:uuid:{i:032x}>".encode(),
            b"WARC-Date: 2024-01-01T00:00:00Z",
        ]
        if uri:
            head.append(f"WARC-Target-URI: {uri}".encode())
        head.append(f"Content-Length: {len(payload)}".encode())
        blobs.append(
            _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        )
    if not compress:
        return b"".join(blobs)
    if per_record_members:
        return b"".join(gzip.compress(b) for b in blobs)
    return gzip.compress(b"".join(blobs))


WARC_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_index", LongType()),
        StructField("record_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("content", StringType()),  # utf-8 (lossy) payload text
        StructField("error", StringType()),    # NULL = clean parse
    ]
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("warc source requires option('path', <glob>)")
        # WET ingestion usually wants conversion records only
        self.types = options.get("record_types", "")

    def partitions(self) -> Sequence[InputPartition]:
        # driver-side listing: local glob or Hadoop FS for store URIs
        files = glob_any_store(self.path)
        return [_WarcFilePartition(p) for p in files] or [_WarcFilePartition("")]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        wanted = {t.strip() for t in self.types.split(",") if t.strip()}
        yield from _record_rows(partition.path, wanted)


def _record_rows(path: str, wanted: set[str]) -> Iterator[tuple]:
    """Shared row emission for the batch and streaming readers."""
    try:
        records = read_warc_file(path)
    except (ValueError, OSError) as e:
        yield (path, -1, None, None, None, None, -1, None, str(e)[:200])
        return
    for i, r in enumerate(records):
        if wanted and r.record_type not in wanted:
            continue
        yield (
            path,
            i,
            r.record_type,
            r.headers.get("WARC-Record-ID"),
            r.target_uri,
            r.headers.get("WARC-Date"),
            len(r.payload),
            r.payload.decode("utf-8", "replace"),
            None,
        )


class _WarcStreamReader(SimpleDataSourceStreamReader):
    """Incremental tail of a growing crawl-dump directory: the stream
    offset is the lexicographically LARGEST file name processed so far,
    and each micro-batch ingests the next ``files_per_batch`` files
    sorting after it. Checkpoint recovery replays an exact (start,
    end] name range (``readBetweenOffsets``), so the contract is the
    one crawl dumps already satisfy: producers write files with
    lexicographically increasing names (part-00001, ...) and never
    rewrite a published file."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("warc source requires option('path', <glob>)")
        self.types = options.get("record_types", "")
        self.files_per_batch = int(options.get("files_per_batch", 16))

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _files_after(self, last: str, end: str | None) -> list[str]:
        files = [f for f in glob_any_store(self.path) if f > last]
        if end is not None:
            files = [f for f in files if f <= end]
        else:
            files = files[: self.files_per_batch]
        return files

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = self._files_after(start["last"], None)
        if not files:
            return iter(()), start
        wanted = {t.strip() for t in self.types.split(",") if t.strip()}
        # materialized list, not a lazy generator: the simple-reader
        # protocol pickles the prefetched batch for the cache, and the
        # volume is bounded by files_per_batch (bulk backfills belong
        # to the batch reader, which is executor-parallel)
        rows = [r for p in files for r in _record_rows(p, wanted)]
        return iter(rows), {"last": files[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        wanted = {t.strip() for t in self.types.split(",") if t.strip()}
        for p in self._files_after(start["last"], end["last"]):
            yield from _record_rows(p, wanted)


class WarcDataSource(DataSource):
    """Batch source (one retryable task per WARC/WET file) and
    streaming tail (new files per micro-batch, replayable name-range
    offsets)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WarcReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _WarcStreamReader(schema, self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark: SparkSession, path_glob: str, record_types: str = ""):
    register(spark)
    return (
        spark.read.format("warc")
        .option("path", path_glob)
        .option("record_types", record_types)
        .load()
    )
