"""Structured Streaming jobs.

The reference is weekly cron batch with no streaming operators
(SURVEY.md §2.9); its incremental path maps to ``readStream`` +
``Trigger.AvailableNow`` with checkpointing - same cadence, exactly-once
instead of the reference's CREATE-TABLE-IF-NOT-EXISTS idempotence
(reference: src/data_ingestion.py:99-106, src/utils.py:178).

This module supplies that incremental path plus the streaming operators
a 100 TB training-data pipeline needs: watermarked tumbling/sliding
windows, session windows, streaming dedup, and an
``applyInPandasWithState`` custom stateful operator. Each stream's
transformation is the SAME DataFrame expression the batch queries use -
one definition, two execution modes.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from functools import reduce

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Normalized events schema (what every downstream job sees). The stored
# ``ts`` physical type has varied across testdata vintages - TIMESTAMP
# (NANOS) readable only as INT64 nanos via the legacy conf, and
# TIMESTAMP(MICROS, isAdjustedToUTC=false) read natively as
# TIMESTAMP_NTZ - so the readers probe the actual parquet footer schema
# instead of pinning a physical ``ts`` type, and ``with_event_ts``
# dispatches on the observed dtype.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def with_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TimestampType whatever the reader produced
    (same dtype dispatch as the batch ``table()`` loader)."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
        normalize_event_ts,
    )

    return normalize_event_ts(df)


def read_events_batch(spark: SparkSession, source_dir: str) -> DataFrame:
    """NOTE: persists the nanosAsLong conf on the caller's session (set
    only when it differs) - needed only for TIMESTAMP(NANOS) vintages of
    the testdata; harmless otherwise."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
        set_conf_if_differs,
    )

    set_conf_if_differs(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    return with_event_ts(spark.read.parquet(source_dir))


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory. New files are
    discovered per micro-batch; schema is pinned (streams cannot infer) -
    but pinned to the PROBED batch-read schema of the existing files, not
    a hard-coded physical type, so either ``ts`` vintage works. When the
    source directory is empty at stream start (the normal state for a
    stream that launches before the first file lands), the probe cannot
    infer and we fall back to the pinned EVENTS_SCHEMA - with_event_ts
    dispatches on whatever dtype actually arrives, so a later vintage
    mismatch still resolves. Persists the nanosAsLong conf on the
    caller's session (set only when it differs)."""
    from pyspark.errors import AnalysisException

    from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
        set_conf_if_differs,
    )

    set_conf_if_differs(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        raw_schema = spark.read.parquet(source_dir).schema
    except AnalysisException:
        # Fall back ONLY for a directory that exists but holds no files
        # yet; a nonexistent path is a caller error and must stay loud
        # (otherwise a typo'd source_dir becomes a forever-empty stream).
        if not os.path.isdir(source_dir):
            raise
        raw_schema = EVENTS_SCHEMA
    reader = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("path", source_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return with_event_ts(reader.load())


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation - the streaming twin of the
    batch ``events_hourly`` query. Late rows beyond the watermark are
    dropped; state for closed windows is evicted (bounded state at any
    scale)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_value_rates(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding-window (1h window, 15m slide) mean value per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "avg_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session-window aggregation keyed by user: a session closes
    after ``gap`` of inactivity (the streaming twin of the batch
    ``sessionize`` query)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids within the
    watermark horizon (state is evicted past it - the streaming form of
    exact dedup that stays bounded on an infinite stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _running_totals_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
):
    """Per-user running totals across micro-batches: custom stateful logic
    the built-in aggregations cannot express (emit-per-batch cumulative
    output). State is a (count, sum) pair per user."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful streaming op: cumulative per-user event count
    and value, emitted every micro-batch (applyInPandasWithState with
    processing-time timeout disabled; state lives for the stream)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator: streaming LOCF (forward-fill across batches)
# ---------------------------------------------------------------------------

_LOCF_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("filled_value", DoubleType()),
    ]
)

# (has_observation, last_good_value): GroupState cannot hold a nullable
# "maybe" directly, so presence is an explicit flag
_LOCF_STATE = StructType(
    [StructField("has", LongType()), StructField("val", DoubleType())]
)


def _locf_fn(key: tuple, batches: Iterable[pd.DataFrame], state: GroupState):
    """Per-user last-observation-carried-forward across micro-batches:
    the state is the last good ('error' rows are dropouts, NULL values
    skipped) reading seen in ANY earlier batch, so fills are continuous
    over the stream's lifetime - the semantics the batch twin
    (operators/sequence.py:forward_fill) has within one dataset.
    Within a batch rows are ordered by (ts, event_id), matching the
    batch window's ORDER BY. Assumes per-user event time is
    non-decreasing ACROSS batches (file-source arrival order); late
    rows would need a reorder buffer, which is session_windows /
    watermark territory."""
    has, val = state.get if state.exists else (0, 0.0)
    frames = list(batches)
    if not frames:
        return
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    pdf = pdf.sort_values(["ts", "event_id"])
    fills: list[float | None] = []
    for et, v in zip(pdf["event_type"], pdf["value"]):
        if et != "error" and pd.notna(v):
            has, val = 1, float(v)
        fills.append(val if has else None)
    state.update((has, val))
    yield pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy(),
            "user_id": key[0],
            "filled_value": fills,
        }
    )


def streaming_locf(events: DataFrame) -> DataFrame:
    """Streaming forward-fill: every event is emitted once (append
    mode) with its LOCF-imputed value; per-user fill state survives
    across micro-batches (applyInPandasWithState, no timeout)."""
    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _locf_fn,
            outputStructType=_LOCF_SCHEMA,
            stateStructType=_LOCF_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator: streaming running-distinct (bitmask state)
# ---------------------------------------------------------------------------

# The events domain has a small closed set of types, so the per-user
# "which types seen so far" SET compresses to one integer bitmask -
# set-valued streaming state in 8 bytes instead of a growing
# collection. Unknown types (a future datagen) fold into a reserved
# overflow bit: the count then LOWER-bounds the true distinct count,
# loudly documented rather than silently wrong.
_EVENT_TYPE_BITS = {
    "click": 0,
    "view": 1,
    "purchase": 2,
    "signup": 3,
    "error": 4,
}
_OTHER_BIT = 5

_RDIST_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("n_distinct_types", LongType()),
    ]
)

_RDIST_STATE = StructType([StructField("mask", LongType())])


def _running_distinct_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
):
    """Per-user online distinct-type count across micro-batches: the
    seen-set is a bitmask carried in GroupState; each row emits the
    cardinality after itself (batch twin: the running_distinct_count
    query's first-occurrence-mark + cumulative-sum windows)."""
    (mask,) = state.get if state.exists else (0,)
    frames = list(batches)
    if not frames:
        return
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    pdf = pdf.sort_values(["ts", "event_id"])
    counts: list[int] = []
    for et in pdf["event_type"]:
        mask |= 1 << _EVENT_TYPE_BITS.get(et, _OTHER_BIT)
        counts.append(bin(mask).count("1"))
    state.update((mask,))
    yield pd.DataFrame(
        {
            "event_id": pdf["event_id"].to_numpy(),
            "user_id": key[0],
            "n_distinct_types": counts,
        }
    )


def streaming_running_distinct(events: DataFrame) -> DataFrame:
    """Streaming online cardinality: after each event, how many distinct
    event types has this user produced over the stream's LIFETIME -
    set-valued state as an integer bitmask (applyInPandasWithState,
    append mode)."""
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_distinct_fn,
            outputStructType=_RDIST_SCHEMA,
            stateStructType=_RDIST_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming heavy hitters (bucketed Misra-Gries in GroupState)
# ---------------------------------------------------------------------------

_HH_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("term", StringType()),
        StructField("est", LongType()),
        StructField("version", LongType()),
    ]
)

# k counters as a JSON object: the state struct stays fixed-width-ish
# (one string, one long) while the counter set stays <= k entries.
_HH_STATE = StructType(
    [StructField("counters", StringType()), StructField("version", LongType())]
)


def _heavy_hitters_fn(k: int):
    """Per-bucket stateful kernel (module-level factory so tests can
    drive it with a fake GroupState across deterministic batch splits,
    the _locf_fn precedent)."""
    import json

    from nyc_government_hiring_audit_data_platform_spark.operators.sketches import (
        mg_merge_counts,
    )

    def fn(key: tuple, batches: Iterable[pd.DataFrame], state: GroupState):
        counters, version = (
            (json.loads(state.get[0]), state.get[1]) if state.exists else ({}, 0)
        )
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        counters = mg_merge_counts(
            counters, pdf["term"].dropna().value_counts().to_dict(), k
        )
        version += 1
        state.update((json.dumps(counters), version))
        yield pd.DataFrame(
            {
                "bucket": key[0],
                "term": list(counters),
                "est": list(counters.values()),
                "version": version,
            }
        )

    return fn


def streaming_heavy_hitters(
    terms: DataFrame, k: int = 8, buckets: int = 16
) -> DataFrame:
    """Streaming frequent items: a Misra-Gries ``k``-counter summary per
    hash bucket, carried across micro-batches in GroupState.

    Input is any streaming DataFrame with a ``term`` string column.
    Terms are routed to ``pmod(xxhash64(term), buckets)`` so one term's
    whole stream lands in one bucket (state stays k counters per
    bucket, ``buckets`` parallel groups - never a global hot key);
    each micro-batch merges its exact per-term counts into the bucket's
    summary via the same mergeable-summaries rule as the batch operator
    (operators.sketches.mg_merge_counts), so every term whose count in
    its bucket exceeds n_bucket/(k+1) is guaranteed present, exactly
    the batch bound. Each batch emits the bucket's refreshed <= k
    (term, est) rows tagged with a monotonically increasing state
    version; downstream takes max-version per bucket for the current
    snapshot (update-mode semantics on an append sink).
    """
    return (
        terms.select(
            F.pmod(F.xxhash64("term"), F.lit(buckets)).alias("bucket"), "term"
        )
        .groupBy("bucket")
        .applyInPandasWithState(
            _heavy_hitters_fn(k),
            outputStructType=_HH_SCHEMA,
            stateStructType=_HH_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# custom stateful operator (transformWithStateInPandas - the Spark 4
# successor API: typed state variables, timers, TTL; requires the
# RocksDB state store provider)
# ---------------------------------------------------------------------------


def _make_totals_processor():
    """Factory (lazy import: StatefulProcessor needs pyspark >= 4.0)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Same semantics as ``_running_totals_fn`` but on the
        transformWithState API: per-user cumulative (count, sum) in a
        typed ValueState, cumulative row emitted every micro-batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor()


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on the transformWithStateInPandas API.
    The caller's session must use the RocksDB state store provider
    (``configure_rocksdb_state_store``); state layout is managed per
    state variable, supports TTL and timers, and survives restarts via
    the checkpoint like any stateful operator.

    ENV GATE: the transform-with-state driver worker speaks a protobuf
    protocol to the JVM; without the ``protobuf`` package the stream
    fails at initialization, so this raises up front with guidance (the
    plumbing - processor class, state schema, output contract - is real
    and runs wherever protobuf is installed; ``running_user_totals`` is
    the dependency-free equivalent here)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark's transform_with_state_driver_worker imports "
            "google.protobuf), which is not installed in this container; "
            "use running_user_totals (applyInPandasWithState) instead"
        ) from exc
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_totals_processor(),
            outputStructType=_RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def configure_rocksdb_state_store(spark: SparkSession) -> None:
    """transformWithState requires the RocksDB provider (bundled with
    Spark 4); HDFS-backed state does not support it."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


# ---------------------------------------------------------------------------
# sinks / drivers
# ---------------------------------------------------------------------------


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, output_dir: str | None = None
) -> None:
    """Process everything currently available, then stop (the incremental
    batch cadence of the reference's weekly cron, with exactly-once
    checkpointing instead of IF-NOT-EXISTS idempotence)."""
    writer = stream_df.writeStream.option("checkpointLocation", checkpoint_dir).trigger(
        availableNow=True
    )
    if output_dir is None:
        query = writer.format("noop").start()
    else:
        query = writer.format("parquet").option("path", output_dir).start()
    query.awaitTermination()


def run_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "update"
) -> None:
    """Drain an availableNow stream into an in-memory table (tests and
    interactive inspection)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "2 hours",
    horizon: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: purchases within ``horizon`` AFTER a
    click by the same user. Both sides carry watermarks and the join
    range-bounds the event times, so state for either side is dropped
    once the watermark passes click_ts + horizon - bounded state at any
    scale. On batch DataFrames the same expression is a plain
    range-condition equi-join (watermarks are no-ops), which is what the
    equality test compares against."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


def enrich_with_static_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream
    joins against a static (batch) dimension - no watermark or state
    needed because the static side is fully available every batch; Spark
    broadcasts it per micro-batch when small. The standard shape for
    stamping reference data (rates, configs, user attributes) onto an
    event stream."""
    return events.join(F.broadcast(dim), "event_type", "left").select(
        "event_id", "user_id", "event_type", "ts", "value", "weight"
    )


# ---------------------------------------------------------------------------
# streaming upsert sink (foreachBatch + snapshot swap)
# ---------------------------------------------------------------------------


def run_upsert_sink(
    stream_df: DataFrame,
    table_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    order_col: str | None = None,
) -> None:
    """Streaming SCD-1 upsert sink: each micro-batch MERGEs into a
    parquet table via ``relational.merge_upsert`` inside foreachBatch,
    with snapshot-swap publication - the batch writes a fresh ``v{n}``
    snapshot directory, then atomically updates the ``_current``
    pointer, so readers never observe a half-written table and the
    previous snapshot stays readable throughout.

    Within-batch duplicate keys collapse to one row first (highest
    ``order_col`` wins when given, else an arbitrary-but-single row) -
    merge semantics require unique update keys. Combined with the
    checkpoint, restarts re-apply only unprocessed batches
    (exactly-once table state). Crash-restart safety rests on two
    invariants: every batch writes to a FRESH snapshot directory (the
    ``v{batch_id}`` name gets an ``r{k}`` suffix if it already exists
    on disk), so the sink never reads a directory it is writing; and
    ``merge_upsert`` is idempotent for re-delivered content, so a
    batch_id replayed after a lost checkpoint commit - whether with
    identical content or (after a checkpoint reset) a superset - lands
    a correct new snapshot instead of being skipped on a batch_id
    match that says nothing about batch CONTENT.

    This pointer-file commit is a LOCAL-filesystem protocol; on object
    stores this role is exactly what transactional table formats
    (Delta/Iceberg commit logs) exist for - swap this sink for one of
    those in that deployment.
    """
    from nyc_government_hiring_audit_data_platform_spark.operators.relational import (
        merge_upsert,
    )

    ptr = os.path.join(table_dir, "_current")

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # The in-batch dedup MUST be content-deterministic: a crash
        # after the pointer swap replays this batch, and the replayed
        # merge only leaves the table unchanged if the same survivor
        # row wins both times. dropDuplicates is partition-order
        # dependent, so without order_col the tiebreak is a stable
        # whole-row hash instead.
        tiebreak = F.asc(F.xxhash64(*batch_df.columns))
        if order_col is not None:
            w = Window.partitionBy(*keys).orderBy(F.desc(order_col), tiebreak)
        else:
            w = Window.partitionBy(*keys).orderBy(tiebreak)
        batch = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # Always target a directory that does not exist yet: a replayed
        # batch_id (crash before checkpoint commit, or a checkpoint
        # reset that re-delivers batch 0 with MORE files) must never
        # overwrite - or skip relative to - a published snapshot based
        # on the id alone. Writing fresh and re-merging is safe because
        # merge_upsert is idempotent for already-applied rows.
        snap = _fresh_snapshot_name(table_dir, batch_id)
        if os.path.exists(ptr):
            with open(ptr) as f:
                cur = f.read().strip()
            base = spark.read.parquet(os.path.join(table_dir, cur))
            merged = merge_upsert(base, batch, keys)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(os.path.join(table_dir, snap))
        _publish_pointer(table_dir, snap)

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _fresh_snapshot_name(table_dir: str, batch_id: int) -> str:
    """The snapshot-publication naming rule both sinks share: always a
    directory that does not exist yet (``v{id}``, then ``v{id}r{k}`` on
    replay), so a re-delivered batch can never overwrite - or be
    skipped relative to - a published snapshot based on the id alone."""
    snap = f"v{batch_id}"
    retry = 0
    while os.path.exists(os.path.join(table_dir, snap)):
        retry += 1
        snap = f"v{batch_id}r{retry}"
    return snap


def _publish_pointer(table_dir: str, snap: str) -> None:
    """Atomic pointer swap both sinks share: readers either see the old
    complete snapshot or the new one, never a half-write (local-fs
    protocol; transactional table formats own this role on stores).
    Every published name is also appended to ``_published.log`` - the
    ledger that lets retention distinguish real history from
    crash-before-swap orphan directories.

    Ordering matters twice here. (a) The ledger append happens BEFORE
    the pointer swap: a crash between the two then leaves a ledgered
    snapshot that never became current - fully written (the sink only
    calls this after the snapshot's data landed) and harmless to
    retain - whereas the opposite order would leave the CURRENT
    snapshot unledgered, surviving only while it is the pointer target
    and then pruned as an orphan, losing real published history.
    (b) On a table that predates the ledger (snapshots exist,
    ``_published.log`` absent), the first append seeds the ledger with
    every already-existing snapshot name first; otherwise the new
    ledger would contain only the new name and the next prune would
    classify all pre-ledger history as crash orphans and delete it
    regardless of ``keep_last``. Seeding is gated on ``_current``
    existing: a genuine pre-ledger table always has a pointer (the
    pre-ledger code published one per batch), whereas a brand-new
    table that hard-crashed before its FIRST publish has neither - its
    leftover v* directories are exactly the half-written orphans the
    ledger exists to exclude (the writer's rmtree cleanup only covers
    in-process failures, not a killed process), and grandfathering
    them would retain them as real history against ``keep_last``."""
    ptr = os.path.join(table_dir, "_current")
    ledger = os.path.join(table_dir, "_published.log")
    if not os.path.exists(ledger) and os.path.exists(ptr):
        # Pre-ledger snapshots are indistinguishable from orphans, and
        # the pre-ledger contract treated them all as published - keep
        # that promise by grandfathering every existing name in.
        preexisting = [v for v in list_upsert_versions(table_dir) if v != snap]
        if preexisting:
            with open(ledger, "a") as f:
                f.write("".join(v + "\n" for v in preexisting))
    with open(ledger, "a") as f:
        f.write(snap + "\n")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(snap)
    os.replace(tmp, ptr)


def _state_table_name(table_dir: str, snap: str) -> str:
    """Deterministic catalog identifier for a snapshot's bucketed state
    table, derived from (table_dir, snap) alone so retention can DROP
    the entry for any snapshot directory - including a crash orphan
    whose _meta.json never landed. An md5 digest of the exact absolute
    path is part of the name: the readable munged form alone collides
    across distinct dirs ('/data/gold-x' and '/data/gold_x' both munge
    to data_gold_x), and a collision would let one table's defensive
    DROP/prune destroy another live table's catalog entry."""
    import hashlib
    import re

    path = os.path.abspath(table_dir)
    munged = re.sub(r"[^A-Za-z0-9_]+", "_", path).strip("_").lower()
    digest = hashlib.md5(path.encode()).hexdigest()[:10]
    return f"ivm_state_{munged[-48:].strip('_')}_{digest}_{snap}".lower()


def _resolve_state_table(
    spark: SparkSession, table_dir: str, cur: str, cur_meta: dict, keys: list[str]
) -> DataFrame:
    """The previous snapshot's bucketed state as a catalog table,
    re-registering it when this session's catalog has never seen it.
    The default session catalog is in-memory (session-scoped, no Hive
    metastore - session.py), and an availableNow sink's normal cadence
    is repeated short-lived runs: after a restart the snapshot's data
    files are all that survives, so the table is re-created as an
    EXTERNAL bucketed table over them (same bucket spec the writer
    recorded in the snapshot meta - the files' layout matches it by
    construction)."""
    tname = cur_meta.get("state_table") or _state_table_name(table_dir, cur)
    if not spark.catalog.tableExists(tname):
        path = os.path.join(table_dir, cur, "state")
        schema = spark.read.parquet(path).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        key_list = ", ".join(f"`{k}`" for k in keys)
        # SQL-escape the path: a single quote in table_dir would
        # otherwise break (or inject into) the LOCATION clause and
        # permanently block recovery for that table
        loc = path.replace("'", "''")
        spark.sql(
            f"CREATE TABLE {tname} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({key_list}) INTO {cur_meta['n_buckets']} BUCKETS "
            f"LOCATION '{loc}'"
        )
    return spark.table(tname)


def _apply_refresh_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_dir: str,
    keys: list[str],
    specs,
    op_col: str | None = None,
    state_format: str = "parquet",
    n_buckets: int | None = None,
) -> None:
    """One GOLD-refresh step for the streaming IVM sink: fold the batch
    into the current state snapshot and publish a fresh one.

    Unlike ``run_upsert_sink``'s merge, an aggregate refresh is NOT
    content-idempotent - re-folding a replayed delta double-counts
    every sum - so exactly-once rests on the standard foreachBatch
    transactional-batch-id recipe instead: each snapshot's ``_meta``
    records the batch_id it applied, and a replayed batch whose id
    already stamps the CURRENT snapshot is skipped outright (legal
    because Spark's replayable-source contract re-delivers the same
    offset range under the same id). Crash before the pointer swap:
    pointer still names the pre-batch snapshot, the replay re-applies
    onto it into a fresh ``r{k}``-suffixed directory - correct. Crash
    after the swap: the replay hits the skip guard - correct. What
    this CANNOT absorb is a checkpoint reset (ids restart at 0 with
    different content): that requires a state rebuild, which is why
    ``run_agg_refresh_sink`` documents the checkpoint as part of the
    table's durability story, not an optimization.

    ``state_format="bucketed"`` is the production physical shape: each
    snapshot's state persists as an EXTERNAL bucketed table (bucketed
    on the group keys, data files still under the snapshot directory)
    and the fold runs through ``merge_states_joined`` - the persisted
    state participates as the bucketed side of a full-outer join and
    is NEVER re-shuffled; only the batch's group-sized partials move.
    The default parquet mode folds via ``merge_agg_states`` (union +
    re-agg), which re-shuffles the whole state every batch because a
    plain parquet scan carries no partitioning. Each snapshot's
    ``_meta.json`` records the refresh plan's shuffle-Exchange count
    (``exchanges``) so the no-shuffle claim is auditable on the sink's
    OWN plan, not just in operator tests.

    ``n_buckets`` defaults to the session's
    ``spark.sql.shuffle.partitions`` so the delta's own aggregation
    exchange already satisfies the join's distribution (mismatched
    counts cost one extra delta-sized re-exchange - still never the
    state side); once a table exists its recorded bucket count is
    STICKY (read from the current snapshot's meta) because the bucket
    count is a physical property of the persisted state, not a
    per-batch knob."""
    import json as _json

    from nyc_government_hiring_audit_data_platform_spark.operators import (
        incremental as IVM,
    )

    if state_format not in ("parquet", "bucketed"):
        raise ValueError(
            f"unknown state_format {state_format!r} (want 'parquet' or 'bucketed')"
        )
    spark = batch_df.sparkSession
    ptr = os.path.join(table_dir, "_current")
    cur = None
    cur_meta: dict = {}
    if os.path.exists(ptr):
        with open(ptr) as f:
            cur = f.read().strip()
        meta_path = os.path.join(table_dir, cur, "_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                cur_meta = _json.load(f)
            if cur_meta.get("batch_id") == batch_id:
                return  # replay of an already-published batch
    cached = False
    try:
        if op_col is None:
            parts = [IVM.partial_agg_state(batch_df, keys, specs)]
        else:
            # CDC-shaped batch: 'I' rows fold as inserts, 'D' rows as
            # sign=-1 retractions (exact for sum/count/avg; the partial
            # builder refuses non-retractable kinds loudly). Unknown
            # ops are a data error - surface, never silently drop; the
            # isNull check matters because isin() is NULL (not true)
            # for a NULL op under three-valued logic, so the negation
            # alone would silently DROP null-op rows from both folds.
            # The batch feeds three jobs (validate + two folds): cache
            # it so the source is scanned once, not three times.
            batch_df = batch_df.persist()
            cached = True
            bad = (
                batch_df.filter(
                    F.col(op_col).isNull() | ~F.col(op_col).isin("I", "D")
                )
                .limit(1)
                .collect()
            )
            if bad:
                raise ValueError(
                    f"unknown {op_col!r} value {bad[0][op_col]!r} in batch "
                    f"{batch_id} (want 'I' or 'D')"
                )
            ins = batch_df.filter(F.col(op_col) == "I").drop(op_col)
            dels = batch_df.filter(F.col(op_col) == "D").drop(op_col)
            parts = [
                IVM.partial_agg_state(ins, keys, specs),
                IVM.partial_agg_state(dels, keys, specs, sign=-1),
            ]
        snap = _fresh_snapshot_name(table_dir, batch_id)
        snap_dir = os.path.join(table_dir, snap)
        if state_format == "bucketed":
            from nyc_government_hiring_audit_data_platform_spark.plans import (
                inspect as PI,
            )

            # the batch's partials (at most insert+retract) merge
            # delta-sized first; the ONE fold against the big persisted
            # state is then join-shaped, with the bucketed state side
            # carrying no Exchange (only the delta's partials shuffle)
            delta_state = parts[0] if len(parts) == 1 else IVM.merge_agg_states(
                parts, keys, specs
            )
            if cur is not None:
                if cur_meta.get("state_table") or cur_meta.get("n_buckets"):
                    prev = _resolve_state_table(
                        spark, table_dir, cur, cur_meta, keys
                    )
                else:
                    # format switch: the current snapshot was written by
                    # the parquet mode (no bucket layout on disk) - read
                    # it as plain parquet for this one transition fold
                    # (the state side shuffles once); the NEW snapshot
                    # is bucketed and every later fold is shuffle-free
                    prev = spark.read.parquet(
                        os.path.join(table_dir, cur, "state")
                    )
                    # one-time migration check: the parquet mode allows
                    # (and correctly merges) null group keys; the
                    # bucketed mode cannot. Checking the group-sized
                    # prev state HERE - once, at the switch - means the
                    # per-batch guard below never misattributes a
                    # legacy null group to the batch.
                    legacy_null = reduce(
                        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
                    )
                    if prev.where(legacy_null).take(1):
                        raise ValueError(
                            "cannot switch this table to "
                            "state_format='bucketed': its parquet state "
                            "carries a null-keyed group, which the "
                            "bucketed joined merge cannot combine - keep "
                            "the parquet format or rebuild the state "
                            "with filtered/imputed keys"
                        )
                new_state = IVM.merge_states_joined(prev, delta_state, keys, specs)
            else:
                new_state = delta_state
            # the joined merge's plain key equality does NOT combine
            # null-keyed groups (merge_states_joined docstring) - the
            # parquet mode's groupBy merge does. Refuse loudly instead
            # of silently accumulating one state row per batch for the
            # null group. The guard rides IN the write's own plan
            # (raise_error wrapped around the key columns - no extra
            # job, no cache; an eager take(1) check would re-run the
            # batch scan + partial agg a second time per batch).
            msg = (
                "state_format='bucketed' requires non-null group keys "
                f"(batch {batch_id} produced a null-keyed group); use "
                "the parquet format or filter/impute the keys"
            )
            guarded = [
                F.when(F.col(k).isNull(), F.raise_error(F.lit(msg)))
                .otherwise(F.col(k))
                .alias(k)
                for k in keys
            ]
            rest = [c for c in new_state.columns if c not in keys]
            new_state = new_state.select(*guarded, *rest)
            if cur_meta.get("n_buckets"):
                n_buckets = cur_meta["n_buckets"]  # sticky per table
            elif n_buckets is None:
                n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
            tname = _state_table_name(table_dir, snap)
            # defensive: a manually-deleted snapshot dir can leave a
            # stale catalog entry under the (deterministic) fresh name
            spark.sql(f"DROP TABLE IF EXISTS {tname}")
            exchanges = PI.shuffle_count(new_state)
            try:
                (
                    new_state.write.mode("overwrite")
                    .bucketBy(n_buckets, *keys)
                    .option("path", os.path.join(snap_dir, "state"))
                    .saveAsTable(tname)
                )
            except BaseException:
                # a failed write (e.g. the null-key guard firing
                # mid-job) must not leave a half-written snapshot dir
                # per retry: a restart-looping stream would otherwise
                # accumulate one orphan v{id}r{k} directory per attempt
                # until retention happens to run
                import shutil

                spark.sql(f"DROP TABLE IF EXISTS {tname}")
                shutil.rmtree(snap_dir, ignore_errors=True)
                raise
            meta = {
                "batch_id": batch_id,
                "state_table": tname,
                "n_buckets": n_buckets,
                "exchanges": exchanges,
            }
        else:
            from nyc_government_hiring_audit_data_platform_spark.plans import (
                inspect as PI,
            )

            if cur is not None:
                prev = spark.read.parquet(os.path.join(table_dir, cur, "state"))
                parts = [prev] + parts
            new_state = parts[0] if len(parts) == 1 else IVM.merge_agg_states(
                parts, keys, specs
            )
            exchanges = PI.shuffle_count(new_state)
            try:
                new_state.write.mode("overwrite").parquet(
                    os.path.join(snap_dir, "state")
                )
            except BaseException:
                import shutil

                shutil.rmtree(snap_dir, ignore_errors=True)
                raise
            meta = {"batch_id": batch_id, "exchanges": exchanges}
    finally:
        if cached:
            batch_df.unpersist()
    with open(os.path.join(snap_dir, "_meta.json"), "w") as f:
        _json.dump(meta, f)
    _publish_pointer(table_dir, snap)


def run_agg_refresh_sink(
    stream_df: DataFrame,
    table_dir: str,
    keys: list[str],
    specs,
    checkpoint_dir: str,
    op_col: str | None = None,
    state_format: str = "parquet",
    n_buckets: int | None = None,
) -> None:
    """Streaming GOLD refresh: each micro-batch of facts folds into a
    persisted aggregate STATE table (``operators/incremental.py``
    partial-state algebra) under the upsert sink's snapshot-swap
    publication - the incremental alternative to the reference's
    scheduled full GOLD recompute (sql/cleaned.sql via
    src/cleaned_data.py:37-56), with per-batch cost O(|batch| +
    |groups|) and the base facts never re-read. Exactly-once via the
    per-snapshot applied-batch ledger (see ``_apply_refresh_batch`` -
    an aggregate fold is not idempotent, so the ledger, not content
    idempotence, carries replay safety). Read the answer back with
    ``read_agg_table``. Same local-pointer-protocol caveat as
    ``run_upsert_sink``: on object stores this commit role belongs to
    a transactional table format.

    ``op_col`` turns the stream CDC-shaped: rows marked 'I' fold as
    inserts and 'D' as exact retractions (sum/count/avg; other kinds
    refuse), so an ops log maintains the aggregate without replaying
    history - unknown op values fail the batch loudly.

    ``state_format="bucketed"`` persists each snapshot's state as an
    external bucketed table (``n_buckets`` on the group keys,
    defaulting to the session's shuffle partitions and sticky per
    table thereafter) and folds via the join-shaped merge, so the
    persisted state - the BIG side of every refresh at 100 TB - is
    never re-shuffled; only the batch's group-sized partials move.
    The snapshot's ``_meta.json`` records the refresh plan's Exchange
    count as the audit trail.
    Retention for bucketed tables needs the session: pass ``spark`` to
    ``prune_snapshots`` so the catalog entries drop with their
    directories."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda b, i: _apply_refresh_batch(
                b, i, table_dir, keys, specs, op_col,
                state_format=state_format, n_buckets=n_buckets,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_agg_table(
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    specs,
    version: str | None = None,
) -> DataFrame:
    """Finalized aggregate answer from a ``run_agg_refresh_sink`` table
    (current snapshot by default; any retained one for time travel)."""
    from nyc_government_hiring_audit_data_platform_spark.operators import (
        incremental as IVM,
    )

    if version is None:
        with open(os.path.join(table_dir, "_current")) as f:
            version = f.read().strip()
    snap = os.path.join(table_dir, version, "state")
    if not os.path.isdir(snap):
        raise ValueError(
            f"unknown snapshot {version!r}; have {list_upsert_versions(table_dir)}"
        )
    return IVM.finalize_agg_state(spark.read.parquet(snap), keys, specs)


def read_upsert_table(
    spark: SparkSession, table_dir: str, version: str | None = None
) -> DataFrame:
    """Read a snapshot published by ``run_upsert_sink``: the current one
    by default, or any retained historical version (time travel - the
    snapshot dirs are immutable once the pointer moves past them, so
    old versions stay readable forever until a retention job prunes
    them). ``list_upsert_versions`` enumerates what exists."""
    if version is None:
        with open(os.path.join(table_dir, "_current")) as f:
            version = f.read().strip()
    snap = os.path.join(table_dir, version)
    if not os.path.isdir(snap):
        raise ValueError(
            f"unknown snapshot {version!r}; have {list_upsert_versions(table_dir)}"
        )
    return spark.read.parquet(snap)


def prune_snapshots(
    table_dir: str, keep_last: int = 3, spark: SparkSession | None = None
) -> list[str]:
    """Retention for the snapshot-swap tables (upsert sink and IVM
    refresh sink share the layout): delete all but the ``keep_last``
    newest PUBLISHED snapshots. Published = named in ``_published.log``
    (written by the pointer swap), so a crash-before-swap orphan
    directory neither counts toward ``keep_last`` (it must not evict
    real history) nor survives the prune (it is possibly half-written
    and must not be offered as a readable version). The pointer target
    is always retained even when older than the horizon (a rolled-back
    pointer must never dangle). Tables that predate the ledger fall
    back to treating every snapshot as published (prune-only-by-age,
    the pre-ledger behavior; the first post-upgrade publish seeds the
    ledger with those names). Single-writer assumption: run retention
    from the table's owning job, not concurrently with a batch.
    Returns the names deleted.

    Bucketed-state tables (``state_format="bucketed"``) additionally
    register a catalog entry per snapshot; pass ``spark`` so pruning
    drops those entries with their directories - pruning a snapshot
    whose meta names a state table WITHOUT a session raises rather
    than leaving a catalog entry dangling over deleted files."""
    import json as _json
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_upsert_versions(table_dir)
    ledger_path = os.path.join(table_dir, "_published.log")
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            published_set = {line.strip() for line in f if line.strip()}
        published = [v for v in versions if v in published_set]
    else:
        published = versions
    keep = set(published[-keep_last:])
    ptr = os.path.join(table_dir, "_current")
    if os.path.exists(ptr):
        with open(ptr) as f:
            keep.add(f.read().strip())
    # Resolve every prunable snapshot's state table BEFORE deleting
    # anything: raising the missing-spark error mid-loop would hand the
    # caller an exception AND a partially pruned table (earlier
    # snapshots already gone), turning a recoverable argument mistake
    # into irreversible partial retention.
    plan: list[tuple[str, str | None]] = []
    for v in versions:
        if v in keep:
            continue
        meta_path = os.path.join(table_dir, v, "_meta.json")
        tname = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                tname = _json.load(f).get("state_table")
        if tname is None and spark is not None:
            # a crash orphan may have a catalog entry but no meta; the
            # name is deterministic, so drop-if-exists covers it
            tname = _state_table_name(table_dir, v)
        if tname is not None and spark is None:
            raise ValueError(
                f"snapshot {v!r} has a bucketed state table {tname!r}; "
                "pass spark= so pruning can drop the catalog entry"
            )
        plan.append((v, tname))
    dropped = []
    for v, tname in plan:
        if tname is not None:
            spark.sql(f"DROP TABLE IF EXISTS {tname}")
        shutil.rmtree(os.path.join(table_dir, v))
        dropped.append(v)
    return dropped


def list_upsert_versions(table_dir: str) -> list[str]:
    """Retained snapshot names in publication order, parsed from the
    names themselves (v{batch}[r{retry}]) - filesystem mtimes are not a
    reliable order (coarse-granularity mounts tie; copy/rsync rewrites
    them entirely)."""
    import re

    vs = []
    for d in os.listdir(table_dir):
        m = re.fullmatch(r"v(\d+)(?:r(\d+))?", d)
        if m and os.path.isdir(os.path.join(table_dir, d)):
            vs.append((int(m.group(1)), int(m.group(2) or 0), d))
    return [d for _, _, d in sorted(vs)]
