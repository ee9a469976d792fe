"""Regression tests for the events.ts physical-type dispatch.

Round-2 lesson: the driver regenerated events.parquet with ts as
TIMESTAMP(MICROS) (was TIMESTAMP(NANOS)) and the hard-coded nanos
conversion broke 13 correctness rows, 32 tests, and the bench. The
readers must handle EVERY vintage by dispatching on the observed dtype
(driver_queries.normalize_event_ts), never assuming the physical type.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
    normalize_event_ts,
    set_conf_if_differs,
)

TS = [
    datetime.datetime(2024, 1, 1, 0, 9, 58, 778549),
    datetime.datetime(2024, 3, 15, 12, 0, 0, 1),
    datetime.datetime(2025, 12, 31, 23, 59, 59, 999999),
]


def _write(tmp_path, name, arrow_type):
    arr = pa.array(TS, type=arrow_type)
    t = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": arr})
    path = str(tmp_path / name)
    pq.write_table(t, path)
    return path


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("us"), pa.timestamp("ns"), pa.timestamp("us", tz="UTC")],
    ids=["micros_ntz", "nanos", "micros_utc"],
)
def test_normalize_event_ts_all_vintages(spark, tmp_path, arrow_type):
    set_conf_if_differs(spark, "spark.sql.session.timeZone", "UTC")
    set_conf_if_differs(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    path = _write(tmp_path, "ev.parquet", arrow_type)
    df = normalize_event_ts(spark.read.parquet(path))
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    assert got == {1: TS[0], 2: TS[1], 3: TS[2]}


def test_streaming_reader_probes_schema(spark, tmp_path):
    """read_events_stream must pin the PROBED schema, not a hard-coded
    physical type, for whichever vintage is on disk."""
    from nyc_government_hiring_audit_data_platform_spark.streaming import jobs as SJ

    d = tmp_path / "events_dir"
    d.mkdir()
    _write(d, "part-0.parquet", pa.timestamp("us"))
    stream = SJ.read_events_stream(spark, str(d))
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    batch = SJ.read_events_batch(spark, str(d))
    assert sorted(r["ts"] for r in batch.collect()) == sorted(TS)
