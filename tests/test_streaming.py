"""Structured Streaming tests: every streaming job drains the sf0.001
events table (copied to a temp dir as the stream source) with
Trigger.AvailableNow and is checked against its batch twin."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.streaming import jobs as SJ


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(src, d / "events_000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark, events_dir):
    return SJ.read_events_batch(spark, events_dir)


def _drain(spark, stream_df, name, mode="update"):
    SJ.run_to_memory(stream_df, name, output_mode=mode)
    return spark.table(name)


def test_hourly_counts_match_batch(spark, events_dir, batch_events):
    stream = SJ.hourly_event_counts(SJ.read_events_stream(spark, events_dir))
    got = _drain(spark, stream, "t_hourly", mode="append").collect()
    want = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("win.start").alias("hour"), "event_type", "n", "total_value")
        .collect()
    )
    # append-mode emits only watermark-closed windows; with a bounded
    # input + availableNow the final watermark closes all but the tail
    got_set = {tuple(r) for r in got}
    want_set = {tuple(r) for r in want}
    assert got_set <= want_set
    assert len(got_set) >= len(want_set) - 4  # open tail windows withheld


def test_session_windows_run(spark, events_dir):
    stream = SJ.session_windows(SJ.read_events_stream(spark, events_dir))
    got = _drain(spark, stream, "t_sessions", mode="append")
    rows = got.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_streaming_dedup_drops_duplicates(spark, events_dir, batch_events):
    stream = SJ.streaming_dedup(SJ.read_events_stream(spark, events_dir))
    got = _drain(spark, stream, "t_dedup", mode="append")
    n_distinct = batch_events.select("event_id").distinct().count()
    assert got.count() == n_distinct


def test_running_user_totals_stateful(spark, events_dir, batch_events):
    stream = SJ.running_user_totals(SJ.read_events_stream(spark, events_dir))
    got = _drain(spark, stream, "t_totals", mode="update")
    # single micro-batch -> final cumulative state equals the batch agg
    want = {
        (r["user_id"], r["n"], r["tv"])
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("tv"),
        )
        .collect()
    }
    latest = {
        (r["user_id"], r["n_events"], r["total_value"]) for r in got.collect()
    }
    assert latest == want


def test_transform_with_state_matches_batch(spark, events_dir, batch_events):
    """transformWithStateInPandas (Spark 4 stateful API, RocksDB state
    store) produces the same final cumulative totals as the batch agg
    and as the applyInPandasWithState twin. Skips (with the operator's
    own guidance) where protobuf is unavailable - the gated path is
    asserted instead."""
    import importlib.util

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if not has_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            SJ.running_user_totals_tws(SJ.read_events_stream(spark, events_dir))
        pytest.skip("protobuf not installed; transformWithState gated")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    SJ.configure_rocksdb_state_store(spark)
    try:
        stream = SJ.running_user_totals_tws(SJ.read_events_stream(spark, events_dir))
        got = _drain(spark, stream, "t_totals_tws", mode="update")
        want = {
            (r["user_id"], r["n"], r["tv"])
            for r in batch_events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("tv"),
            )
            .collect()
        }
        latest = {
            (r["user_id"], r["n_events"], r["total_value"]) for r in got.collect()
        }
        assert latest == want
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)


def test_available_now_checkpoint_idempotent(spark, events_dir, tmp_path):
    """Re-running with the same checkpoint processes nothing new - the
    exactly-once replacement for IF-NOT-EXISTS idempotence."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    stream = SJ.read_events_stream(spark, events_dir)
    SJ.run_available_now(stream, ckpt, out)
    n1 = spark.read.parquet(out).count()
    SJ.run_available_now(SJ.read_events_stream(spark, events_dir), ckpt, out)
    n2 = spark.read.parquet(out).count()
    assert n1 > 0
    assert n2 == n1


def test_stream_stream_interval_join_matches_batch(spark, events_dir, batch_events):
    from nyc_government_hiring_audit_data_platform_spark.streaming import jobs as J

    def split(df):
        return (
            df.filter(df.event_type == "click"),
            df.filter(df.event_type == "purchase"),
        )

    sc, sp = split(J.read_events_stream(spark, events_dir))
    joined = J.click_purchase_interval_join(sc, sp)
    J.run_to_memory(joined, "ss_join", output_mode="append")
    stream_rows = sorted(map(tuple, spark.table("ss_join").collect()))

    bc, bp = split(batch_events)
    batch_rows = sorted(
        map(tuple, J.click_purchase_interval_join(bc, bp).collect())
    )
    assert len(stream_rows) > 0
    assert stream_rows == batch_rows


def test_stream_static_enrichment_matches_batch(spark, events_dir, batch_events):
    from nyc_government_hiring_audit_data_platform_spark.streaming import jobs as J

    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("view", 0.5), ("signup", 3.0)],
        ["event_type", "weight"],
    )
    stream = J.enrich_with_static_dim(J.read_events_stream(spark, events_dir), dim)
    J.run_to_memory(stream, "enriched", output_mode="append")
    s = sorted(map(tuple, spark.table("enriched").collect()))
    b = sorted(map(tuple, J.enrich_with_static_dim(batch_events, dim).collect()))
    assert len(s) > 0 and s == b


def test_streaming_upsert_sink_incremental(spark, tmp_path):
    """foreachBatch upsert sink: first run lands the initial snapshot;
    a second run over NEW files (same checkpoint) merges only the new
    batch - updated keys replaced, new keys inserted, untouched keys
    carried - and the _current pointer always names a complete
    snapshot."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")

    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return SJ.read_events_stream(spark, str(src)).select(
            "event_id", "event_type", "value", "ts"
        )

    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], ckpt, order_col="ts")
    t1 = SJ.read_upsert_table(spark, str(table_dir))
    base_rows = {r["event_id"]: r for r in t1.collect()}
    n1 = len(base_rows)
    assert n1 > 0

    # second source file: updates for half the keys (bumped value) plus
    # brand-new keys beyond the old id range
    ev = SJ.read_events_batch(spark, str(src))
    updates = (
        ev.filter(F.col("event_id") % 2 == 0)
        .withColumn("value", F.col("value") + 1000.0)
    )
    inserts = ev.limit(5).withColumn("event_id", F.col("event_id") + 10_000_000)
    updates.unionByName(inserts).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "delta")
    )
    for i, f in enumerate((tmp_path / "delta").glob("*.parquet")):
        shutil.copy(f, src / f"b{i}.parquet")

    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], ckpt, order_col="ts")
    t2 = {r["event_id"]: r for r in SJ.read_upsert_table(spark, str(table_dir)).collect()}
    assert len(t2) == n1 + 5
    for eid, row in t2.items():
        if eid >= 10_000_000:
            continue  # insert
        if eid % 2 == 0:
            assert row["value"] == base_rows[eid]["value"] + 1000.0
        else:
            assert row["value"] == base_rows[eid]["value"]


def test_upsert_sink_redelivery_is_idempotent(spark, tmp_path):
    """Crash-restart contract: if the process dies AFTER the _current
    pointer swap but BEFORE the streaming checkpoint commits, the same
    batch_id is re-delivered on restart. The sink must land a FRESH
    snapshot (never read v{n} while overwriting v{n}) whose content is
    unchanged - merge_upsert is idempotent for already-applied rows."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()

    def stream():
        return SJ.read_events_stream(spark, str(src)).select(
            "event_id", "event_type", "value", "ts"
        )

    # first delivery: lands v0 and swaps the pointer
    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], str(tmp_path / "ck1"))
    before = sorted(
        (r["event_id"], r["value"])
        for r in SJ.read_upsert_table(spark, str(table_dir)).collect()
    )
    assert (table_dir / "_current").read_text().strip() == "v0"

    # simulate the lost checkpoint commit: a FRESH checkpoint re-delivers
    # the same source file as batch_id 0 against the already-swapped table
    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], str(tmp_path / "ck2"))
    after = sorted(
        (r["event_id"], r["value"])
        for r in SJ.read_upsert_table(spark, str(table_dir)).collect()
    )
    assert after == before
    # published under a fresh name, v0 left untouched for pinned readers
    assert (table_dir / "_current").read_text().strip() == "v0r1"


def test_upsert_sink_checkpoint_reset_applies_new_rows(spark, tmp_path):
    """A checkpoint RESET re-delivers batch_id 0 with a SUPERSET of the
    already-applied content (old file + a new one). A guard keyed on
    batch_id alone would skip the batch and silently lose the new rows;
    the sink must merge them."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()

    def stream():
        return SJ.read_events_stream(spark, str(src)).select(
            "event_id", "event_type", "value", "ts"
        )

    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], str(tmp_path / "ck1"))
    n_before = SJ.read_upsert_table(spark, str(table_dir)).count()

    # new file lands, checkpoint is lost: batch 0 now carries BOTH files
    extra = (
        spark.read.parquet(str(src / "a.parquet"))
        .limit(5)
        .withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    extra.write.mode("overwrite").parquet(str(tmp_path / "extra"))
    for i, p in enumerate((tmp_path / "extra").glob("*.parquet")):
        shutil.copy(p, src / f"b{i}.parquet")

    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], str(tmp_path / "ck2"))
    t = SJ.read_upsert_table(spark, str(table_dir))
    assert t.count() == n_before + 5
    assert t.filter(F.col("event_id") >= 10_000_000).count() == 5


def test_read_events_stream_empty_source_dir(spark, tmp_path):
    """A file-source stream routinely starts before the first file
    lands; schema inference is impossible then, so the reader must fall
    back to the pinned EVENTS schema instead of throwing."""
    empty = tmp_path / "empty_src"
    empty.mkdir()
    stream = SJ.read_events_stream(spark, str(empty))
    assert stream.isStreaming
    assert set(SJ.EVENTS_SCHEMA.fieldNames()) <= set(stream.columns)
    # and it must actually run (zero batches is a valid run)
    ckpt = str(tmp_path / "ck_empty")
    out = str(tmp_path / "out_empty")
    SJ.run_available_now(stream, ckpt, out)


def test_read_events_stream_nonexistent_path_raises(spark, tmp_path):
    """The empty-dir schema fallback must NOT swallow a nonexistent
    path: a typo'd source_dir has to fail at construction, not become a
    stream that silently never produces a batch."""
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        SJ.read_events_stream(spark, str(tmp_path / "evnets"))


def test_upsert_sink_dedup_is_content_deterministic(spark, tmp_path):
    """Without order_col, the in-batch dedup survivor must be a pure
    function of batch CONTENT (stable hash tiebreak), so a crash-replay
    merge leaves the published table unchanged - dropDuplicates'
    partition-order dependence would not guarantee that."""
    rows = [(1, "a", float(v), None) for v in (1.0, 2.0, 3.0)] + [
        (2, "b", 9.0, None)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double, ts timestamp")
    src = tmp_path / "src"
    df.repartition(3).write.parquet(str(src))

    def run(ck):
        SJ.run_upsert_sink(
            SJ.read_events_stream(spark, str(src)).select(
                "event_id", "event_type", "value", "ts"
            ),
            str(tmp_path / f"tbl_{ck}"),
            ["event_id"],
            str(tmp_path / f"ck_{ck}"),
        )
        return sorted(
            (r["event_id"], r["value"])
            for r in SJ.read_upsert_table(spark, str(tmp_path / f"tbl_{ck}")).collect()
        )

    # two fully independent runs over the same content pick the same survivor
    assert run("x") == run("y")


def test_upsert_time_travel(spark, tmp_path):
    """Historical snapshots stay readable after the pointer moves on:
    version v0 must still show pre-merge values once v1 is current."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    ckpt = str(tmp_path / "ck")

    def stream():
        return SJ.read_events_stream(spark, str(src)).select(
            "event_id", "event_type", "value", "ts"
        )

    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], ckpt)
    n0 = SJ.read_upsert_table(spark, str(table_dir)).count()

    extra = (
        spark.read.parquet(str(src / "a.parquet"))
        .limit(3)
        .withColumn("event_id", F.col("event_id") + 5_000_000)
    )
    extra.write.parquet(str(tmp_path / "x"))
    for i, p in enumerate((tmp_path / "x").glob("*.parquet")):
        shutil.copy(p, src / f"b{i}.parquet")
    SJ.run_upsert_sink(stream(), str(table_dir), ["event_id"], ckpt)

    versions = SJ.list_upsert_versions(str(table_dir))
    assert versions[0] == "v0" and len(versions) >= 2
    assert SJ.read_upsert_table(spark, str(table_dir)).count() == n0 + 3
    # time travel: v0 still shows the pre-merge row count
    assert SJ.read_upsert_table(spark, str(table_dir), version="v0").count() == n0
    with pytest.raises(ValueError, match="unknown snapshot"):
        SJ.read_upsert_table(spark, str(table_dir), version="v99")


def test_list_upsert_versions_name_order(tmp_path):
    """Publication order comes from the names, not mtimes (which rsync
    or coarse filesystems scramble)."""
    import os
    import time

    for name in ("v2", "v0", "v10", "v0r1", "v0r2"):
        os.makedirs(tmp_path / name)
    # scramble mtimes hard
    now = time.time()
    for i, name in enumerate(("v10", "v0", "v2", "v0r2", "v0r1")):
        os.utime(tmp_path / name, (now - i * 100, now - i * 100))
    assert SJ.list_upsert_versions(str(tmp_path)) == [
        "v0", "v0r1", "v0r2", "v2", "v10",
    ]


def test_streaming_curation_matches_batch_stack(spark, tmp_path):
    """Train-batch / apply-stream: the vocabulary-sized model built from
    the corpus, applied as stateless literal-expression scoring to a
    document STREAM, must reproduce the batch filter stack's flags
    row-for-row (same corpus => every term is in-model, so semantics
    coincide exactly)."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
        QUERIES,
        table,
    )
    from nyc_government_hiring_audit_data_platform_spark.streaming import (
        curation as SC,
    )

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    model = SC.build_curation_model(spark, docs)
    assert model["boiler_grams"] and model["surp"]
    lo, hi = model["band"]
    assert lo <= hi

    # stream the same documents through the scorer (append mode: the
    # plan must be stateless - no watermark, no stateful agg)
    src = tmp_path / "docs_stream"
    src.mkdir()
    shutil.copy(f"{sf}/documents.parquet", src / "d.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    flags = SC.streaming_keep_decisions(stream, model)
    assert flags.isStreaming
    SJ.run_to_memory(flags, "stream_curation", output_mode="append")
    got = sorted(map(tuple, spark.table("stream_curation").collect()))

    want = sorted(map(tuple, QUERIES["curation_keep_decisions"](spark, sf).collect()))
    assert got == want


def test_streaming_locf_matches_batch_forward_fill(spark, events_dir, batch_events):
    """Streaming LOCF (stateful, applyInPandasWithState) fills exactly
    like the batch forward_fill operator over the same data."""
    from nyc_government_hiring_audit_data_platform_spark.operators import (
        sequence as SEQ,
    )

    stream = SJ.streaming_locf(SJ.read_events_stream(spark, events_dir))
    got = {
        r["event_id"]: r["filled_value"]
        for r in _drain(spark, stream, "t_locf", mode="append").collect()
    }
    want = {
        r["event_id"]: r["filled_value"]
        for r in SEQ.forward_fill(
            batch_events,
            keys=["user_id"],
            order=["ts", "event_id"],
            value="value",
            good=F.col("event_type") != "error",
        )
        .select("event_id", "filled_value")
        .collect()
    }
    assert got == want


def test_locf_state_carries_across_batches():
    """The fill state must survive micro-batch boundaries: a user whose
    second batch opens with dropouts keeps filling from the FIRST
    batch's last good reading. Drives _locf_fn directly with a fake
    GroupState so the batch split is deterministic."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    st = FakeState()
    b1 = pd.DataFrame(
        {
            "ts": [1, 2],
            "event_id": [10, 11],
            "event_type": ["view", "error"],
            "value": [5.0, 99.0],
        }
    )
    out1 = next(SJ._locf_fn((7,), [b1], st))
    assert list(out1["filled_value"]) == [5.0, 5.0]
    b2 = pd.DataFrame(
        {
            "ts": [3, 4],
            "event_id": [12, 13],
            "event_type": ["error", "click"],
            "value": [99.0, 7.0],
        }
    )
    out2 = next(SJ._locf_fn((7,), [b2], st))
    assert list(out2["filled_value"]) == [5.0, 7.0]
    assert st.get == (1, 7.0)


def test_streaming_running_distinct_matches_batch(spark, events_dir, batch_events):
    """Bitmask-state online cardinality equals the batch
    running_distinct_count query (first-occurrence marks + cumulative
    sum) row for row."""
    import __spark_entry__ as entrymod

    stream = SJ.streaming_running_distinct(SJ.read_events_stream(spark, events_dir))
    got = {
        r["event_id"]: r["n_distinct_types"]
        for r in _drain(spark, stream, "t_rdist", mode="append").collect()
    }
    # events_dir is the sf0.001 events table (fixture); the batch query
    # reads the same data from the original sf dir
    want = {
        r["event_id"]: r["n_distinct_types"]
        for r in entrymod.queries()["running_distinct_count"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == want


def test_running_distinct_state_carries_across_batches():
    """The seen-type bitmask survives batch boundaries: a type first
    seen in batch 1 does not increment the count again in batch 2."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    st = FakeState()
    b1 = pd.DataFrame(
        {"ts": [1, 2], "event_id": [1, 2], "event_type": ["click", "view"]}
    )
    out1 = next(SJ._running_distinct_fn((3,), [b1], st))
    assert list(out1["n_distinct_types"]) == [1, 2]
    b2 = pd.DataFrame(
        {"ts": [3, 4], "event_id": [3, 4], "event_type": ["view", "purchase"]}
    )
    out2 = next(SJ._running_distinct_fn((3,), [b2], st))
    assert list(out2["n_distinct_types"]) == [2, 3]


_HH_TERM = (
    "cast(100 div (1 + cast(conv(substr(md5(cast(event_id as string)), 1, 6), "
    "16, 10) as bigint) % 100) as string)"
)


def test_streaming_heavy_hitters_bound(spark, events_dir, batch_events):
    """Streaming bucketed Misra-Gries satisfies the batch bound: for
    every term whose exact count in its bucket exceeds n_bucket/(k+1),
    the final snapshot contains it with exact - n_bucket/(k+1) <= est
    <= exact."""
    K, BUCKETS = 8, 16
    stream = SJ.streaming_heavy_hitters(
        SJ.read_events_stream(spark, events_dir).selectExpr(f"{_HH_TERM} as term"),
        k=K,
        buckets=BUCKETS,
    )
    snap = _drain(spark, stream, "t_hh", mode="update")
    from pyspark.sql import Window

    w = Window.partitionBy("bucket")
    final = (
        snap.withColumn("maxv", F.max("version").over(w))
        .filter(F.col("version") == F.col("maxv"))
        .select("bucket", "term", "est")
        .collect()
    )
    got = {(r["bucket"], r["term"]): r["est"] for r in final}
    exact = (
        batch_events.selectExpr(f"{_HH_TERM} as term")
        .select(
            F.pmod(F.xxhash64("term"), F.lit(BUCKETS)).alias("bucket"), "term"
        )
        .groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n_bucket: dict[int, int] = {}
    for r in exact:
        n_bucket[r["bucket"]] = n_bucket.get(r["bucket"], 0) + r["c"]
    checked_heavy = 0
    for r in exact:
        bound = n_bucket[r["bucket"]] / (K + 1)
        est = got.get((r["bucket"], r["term"]))
        if r["c"] > bound:
            checked_heavy += 1
            assert est is not None, f"heavy {r['term']} lost from bucket {r['bucket']}"
        if est is not None:
            assert est <= r["c"]
            assert est >= r["c"] - bound - 1e-9
    assert checked_heavy > 0, "degenerate stream: no heavy terms to check"


def test_heavy_hitters_state_survives_batches():
    """The summary must keep accumulating across micro-batches: a term
    heavy only in AGGREGATE across two batches is still present with a
    bound-respecting estimate. Drives _heavy_hitters_fn directly with a
    fake GroupState so the batch split is deterministic."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = SJ._heavy_hitters_fn(2)
    state = FakeState()
    b1 = pd.DataFrame({"term": ["x"] * 5 + ["a", "b", "c"]})
    b2 = pd.DataFrame({"term": ["x"] * 5 + ["d", "e", "f"]})
    out1 = list(fn((0,), [b1], state))
    out2 = list(fn((0,), [b2], state))
    assert out1[0]["version"].iloc[0] == 1 and out2[0]["version"].iloc[0] == 2
    snap = dict(zip(out2[0]["term"], out2[0]["est"]))
    # x: exact 10 over n=16, k=2 -> est >= 10 - 16/3 > 4
    assert "x" in snap and 4 <= snap["x"] <= 10


def test_streaming_classifier_matches_batch(spark, tmp_path):
    """The classifier's stream-serve twin (stateless transform+fold,
    lambda variable named `b` so _LQC_W applies verbatim) must
    reproduce the batch query (explode -> doc x bucket agg ->
    broadcast-model join) row-for-row - integer adds commute, so the
    fold-vs-SUM order difference can never show."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
        QUERIES,
        table,
    )
    from nyc_government_hiring_audit_data_platform_spark.streaming import (
        curation as SC,
    )

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")

    src = tmp_path / "docs_stream"
    src.mkdir()
    shutil.copy(f"{sf}/documents.parquet", src / "d.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    scored = SC.streaming_classifier_scores(stream)
    assert scored.isStreaming  # stateless: append mode, no watermark
    SJ.run_to_memory(scored, "stream_classifier", output_mode="append")
    got = sorted(map(tuple, spark.table("stream_classifier").collect()))

    want = sorted(
        map(tuple, QUERIES["quality_classifier_scores"](spark, sf).collect())
    )
    assert got == want


# -- streaming GOLD refresh (IVM sink) ---------------------------------------

_IVM_SPECS = [
    ("n_events", "1", "count"),
    ("total_cents", "CAST(ROUND(value * 100) AS BIGINT)", "sum"),
    ("avg_cents", "CAST(ROUND(value * 100) AS BIGINT)", "avg"),
]


def _ivm_want(batch_df):
    from nyc_government_hiring_audit_data_platform_spark.operators import (
        incremental as IVM,
    )

    return sorted(
        map(
            tuple,
            IVM.finalize_agg_state(
                IVM.partial_agg_state(batch_df, ["event_type"], _IVM_SPECS),
                ["event_type"],
                _IVM_SPECS,
            ).collect(),
        )
    )


def test_streaming_agg_refresh_matches_batch(spark, tmp_path):
    """foreachBatch IVM sink: two incremental runs over a growing file
    source produce the SAME finalized aggregate as a one-shot batch
    recompute over everything - the streaming twin of the
    incremental_agg_refresh driver row."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return SJ.read_events_stream(spark, str(src)).select(
            "event_id", "event_type", "value"
        )

    SJ.run_agg_refresh_sink(
        stream(), str(table_dir), ["event_type"], _IVM_SPECS, ckpt
    )
    ev1 = SJ.read_events_batch(spark, str(src)).select(
        "event_id", "event_type", "value"
    )
    got1 = sorted(
        map(
            tuple,
            SJ.read_agg_table(
                spark, str(table_dir), ["event_type"], _IVM_SPECS
            ).collect(),
        )
    )
    assert got1 == _ivm_want(ev1) and len(got1) > 0

    # second delta file (bumped ids so rows are new facts), same checkpoint
    delta = ev1.limit(500).withColumn("event_id", F.col("event_id") + 10_000_000)
    delta.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "delta"))
    for i, f in enumerate((tmp_path / "delta").glob("*.parquet")):
        shutil.copy(f, src / f"b{i}.parquet")
    SJ.run_agg_refresh_sink(
        stream(), str(table_dir), ["event_type"], _IVM_SPECS, ckpt
    )
    all_facts = SJ.read_events_batch(spark, str(src)).select(
        "event_id", "event_type", "value"
    )
    got2 = sorted(
        map(
            tuple,
            SJ.read_agg_table(
                spark, str(table_dir), ["event_type"], _IVM_SPECS
            ).collect(),
        )
    )
    assert got2 == _ivm_want(all_facts)
    # both snapshots retained (time travel), pointer names the latest
    assert (table_dir / "_current").read_text().strip().startswith("v1")


def test_agg_refresh_redelivery_skips_not_double_counts(spark, tmp_path):
    """An aggregate fold is NOT idempotent, so the replay contract
    differs from the upsert sink: a re-delivered batch_id whose id
    already stamps the current snapshot must be SKIPPED (applied-batch
    ledger), or every sum double-counts. A fresh checkpoint re-delivers
    batch 0; state and pointer must not move."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")
    table_dir = tmp_path / "gold"
    table_dir.mkdir()

    def stream():
        return SJ.read_events_stream(spark, str(src)).select(
            "event_id", "event_type", "value"
        )

    SJ.run_agg_refresh_sink(
        stream(), str(table_dir), ["event_type"], _IVM_SPECS, str(tmp_path / "ck1")
    )
    before = sorted(
        map(
            tuple,
            SJ.read_agg_table(
                spark, str(table_dir), ["event_type"], _IVM_SPECS
            ).collect(),
        )
    )
    assert (table_dir / "_current").read_text().strip() == "v0"

    SJ.run_agg_refresh_sink(
        stream(), str(table_dir), ["event_type"], _IVM_SPECS, str(tmp_path / "ck2")
    )
    after = sorted(
        map(
            tuple,
            SJ.read_agg_table(
                spark, str(table_dir), ["event_type"], _IVM_SPECS
            ).collect(),
        )
    )
    assert after == before
    assert (table_dir / "_current").read_text().strip() == "v0"  # skipped


def test_agg_refresh_crash_before_swap_replays_correctly(spark, tmp_path):
    """Crash AFTER the snapshot write but BEFORE the pointer swap: the
    replayed batch re-applies onto the still-current predecessor into a
    fresh r{k}-suffixed directory, landing the same state."""
    facts = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "event_type string, value double"
    )
    delta = spark.createDataFrame(
        [("a", 5.0), ("c", 7.0)], "event_type string, value double"
    )
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    SJ._apply_refresh_batch(facts, 0, str(table_dir), ["event_type"], _IVM_SPECS)
    SJ._apply_refresh_batch(delta, 1, str(table_dir), ["event_type"], _IVM_SPECS)
    want = sorted(
        map(
            tuple,
            SJ.read_agg_table(
                spark, str(table_dir), ["event_type"], _IVM_SPECS
            ).collect(),
        )
    )
    # same id again while the pointer already names v1: ledger skip
    SJ._apply_refresh_batch(delta, 1, str(table_dir), ["event_type"], _IVM_SPECS)
    assert (table_dir / "_current").read_text().strip() == "v1"
    # crash-before-swap simulation: roll the pointer back to v0 and replay
    (table_dir / "_current").write_text("v0")
    SJ._apply_refresh_batch(delta, 1, str(table_dir), ["event_type"], _IVM_SPECS)
    assert (table_dir / "_current").read_text().strip() == "v1r1"
    got = sorted(
        map(
            tuple,
            SJ.read_agg_table(
                spark, str(table_dir), ["event_type"], _IVM_SPECS
            ).collect(),
        )
    )
    assert got == want


def test_agg_refresh_sink_cdc_ops(spark, tmp_path):
    """CDC-shaped refresh: 'I' rows fold in, 'D' rows retract exactly,
    groups deleted to zero rows vanish, unknown ops fail the batch."""
    specs = [
        ("n", "1", "count"),
        ("total", "CAST(ROUND(value * 100) AS BIGINT)", "sum"),
    ]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    b0 = spark.createDataFrame(
        [("I", "a", 1.0), ("I", "a", 2.0), ("I", "b", 5.0), ("I", "c", 9.0)],
        "op string, event_type string, value double",
    )
    b1 = spark.createDataFrame(
        [("D", "a", 1.0), ("I", "b", 4.0), ("D", "c", 9.0)],
        "op string, event_type string, value double",
    )
    SJ._apply_refresh_batch(b0, 0, str(table_dir), ["event_type"], specs, "op")
    SJ._apply_refresh_batch(b1, 1, str(table_dir), ["event_type"], specs, "op")
    got = sorted(
        map(
            tuple,
            SJ.read_agg_table(
                spark, str(table_dir), ["event_type"], specs
            ).collect(),
        )
    )
    assert got == [("a", 1, 200), ("b", 2, 900)]  # c retracted to zero: gone

    bad = spark.createDataFrame(
        [("U", "a", 1.0)], "op string, event_type string, value double"
    )
    with pytest.raises(ValueError, match="unknown 'op'"):
        SJ._apply_refresh_batch(bad, 2, str(table_dir), ["event_type"], specs, "op")
    # the failed batch must not have published anything
    assert (table_dir / "_current").read_text().strip() == "v1"


def test_agg_refresh_cdc_null_op_fails_loudly(spark, tmp_path):
    """A NULL op is 'unknown', not 'ignorable': isin() returns NULL
    (not true) for it under three-valued logic, so without the isNull
    guard the row silently vanishes from both folds."""
    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    batch = spark.createDataFrame(
        [("I", "a", 1.0), (None, "a", 2.0)],
        "op string, event_type string, value double",
    )
    with pytest.raises(ValueError, match="unknown 'op' value None"):
        SJ._apply_refresh_batch(batch, 0, str(table_dir), ["event_type"], specs, "op")
    assert not (table_dir / "_current").exists()  # nothing published


def test_prune_snapshots_keeps_current_and_newest(spark, tmp_path):
    """Retention: all but keep_last newest snapshots delete; the
    pointer target survives even when it is older than the horizon
    (a rolled-back pointer must never dangle)."""
    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    for i in range(5):
        batch = spark.createDataFrame(
            [(f"k{i}", float(i))], "event_type string, value double"
        )
        SJ._apply_refresh_batch(batch, i, str(table_dir), ["event_type"], specs)
    assert SJ.list_upsert_versions(str(table_dir)) == [f"v{i}" for i in range(5)]

    dropped = SJ.prune_snapshots(str(table_dir), keep_last=2)
    assert dropped == ["v0", "v1", "v2"]
    assert SJ.list_upsert_versions(str(table_dir)) == ["v3", "v4"]
    # current still reads fine
    assert SJ.read_agg_table(spark, str(table_dir), ["event_type"], specs).count() == 5

    # roll the pointer back to an old snapshot: pruning must keep it
    (table_dir / "_current").write_text("v3")
    dropped2 = SJ.prune_snapshots(str(table_dir), keep_last=1)
    assert dropped2 == []  # v4 is newest, v3 is the pointer: both kept
    assert SJ.list_upsert_versions(str(table_dir)) == ["v3", "v4"]
    with pytest.raises(ValueError, match="keep_last"):
        SJ.prune_snapshots(str(table_dir), keep_last=0)


def test_prune_snapshots_orphans_neither_count_nor_survive(spark, tmp_path):
    """A crash-before-pointer-swap orphan directory must not evict real
    published history from keep_last, and must not survive the prune
    as a fake readable version."""
    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    for i in range(3):
        batch = spark.createDataFrame(
            [(f"k{i}", float(i))], "event_type string, value double"
        )
        SJ._apply_refresh_batch(batch, i, str(table_dir), ["event_type"], specs)
    # fabricate the crash leftover: a half-written v3 with no pointer swap
    orphan = table_dir / "v3" / "state"
    orphan.mkdir(parents=True)
    (orphan / "part-junk.parquet").write_bytes(b"incomplete")
    assert SJ.list_upsert_versions(str(table_dir)) == ["v0", "v1", "v2", "v3"]

    dropped = SJ.prune_snapshots(str(table_dir), keep_last=2)
    # v1, v2 are the two newest PUBLISHED; the orphan v3 is deleted
    # rather than counted (the old behavior kept v3 and evicted v1)
    assert dropped == ["v0", "v3"]
    assert SJ.list_upsert_versions(str(table_dir)) == ["v1", "v2"]


def test_prune_preserves_pre_ledger_history(spark, tmp_path):
    """A table created before the ledger existed (snapshots on disk,
    no _published.log): the FIRST post-upgrade publish must seed the
    ledger with the pre-existing names, else the next prune classifies
    all pre-ledger history as crash orphans and deletes it regardless
    of keep_last (regression: round-11 ADVICE)."""
    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    for i in range(3):
        batch = spark.createDataFrame(
            [(f"k{i}", float(i))], "event_type string, value double"
        )
        SJ._apply_refresh_batch(batch, i, str(table_dir), ["event_type"], specs)
    # simulate the pre-ledger era: the ledger file never existed
    (table_dir / "_published.log").unlink()

    batch = spark.createDataFrame([("k3", 3.0)], "event_type string, value double")
    SJ._apply_refresh_batch(batch, 3, str(table_dir), ["event_type"], specs)
    with open(table_dir / "_published.log") as f:
        ledgered = [line.strip() for line in f if line.strip()]
    assert ledgered == ["v0", "v1", "v2", "v3"]  # grandfathered + new

    dropped = SJ.prune_snapshots(str(table_dir), keep_last=3)
    assert dropped == ["v0"]  # by age, NOT "everything pre-ledger"
    assert SJ.list_upsert_versions(str(table_dir)) == ["v1", "v2", "v3"]


def test_first_publish_does_not_grandfather_preexisting_orphans(
    spark, tmp_path
):
    """A BRAND-NEW table that hard-crashed before its first publish
    (v* dirs on disk, no _current, no ledger - rmtree cleanup only
    covers in-process failures): the first successful publish must NOT
    seed those orphans into the ledger as real history; the next prune
    deletes them instead of counting them against keep_last
    (regression: round-11 ADVICE)."""
    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    # hard-kill leftovers from two failed first-publish attempts
    for v in ("v0", "v0r1"):
        d = table_dir / v / "state"
        d.mkdir(parents=True)
        (d / "part-junk.parquet").write_bytes(b"incomplete")
    assert not (table_dir / "_current").exists()

    batch = spark.createDataFrame([("k0", 0.0)], "event_type string, value double")
    SJ._apply_refresh_batch(batch, 0, str(table_dir), ["event_type"], specs)
    with open(table_dir / "_published.log") as f:
        ledgered = [line.strip() for line in f if line.strip()]
    assert ledgered == ["v0r2"]  # orphans NOT grandfathered

    dropped = SJ.prune_snapshots(str(table_dir), keep_last=3)
    assert sorted(dropped) == ["v0", "v0r1"]
    assert SJ.list_upsert_versions(str(table_dir)) == ["v0r2"]
    assert SJ.read_agg_table(
        spark, str(table_dir), ["event_type"], specs
    ).count() == 1


def test_prune_missing_spark_raises_before_any_deletion(spark, tmp_path):
    """prune_snapshots must pre-scan for bucketed state tables and
    raise BEFORE deleting anything: the old mid-loop raise handed the
    caller an exception AND a partially pruned table (regression:
    round-11 ADVICE)."""
    import json as _json

    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    for i in range(3):
        batch = spark.createDataFrame(
            [(f"k{i}", float(i))], "event_type string, value double"
        )
        SJ._apply_refresh_batch(batch, i, str(table_dir), ["event_type"], specs)
    # make the LATER prunable snapshot bucket-state-shaped, so the
    # old code would have deleted plain v0 before raising on v1
    meta_path = table_dir / "v1" / "_meta.json"
    meta = _json.loads(meta_path.read_text())
    meta["state_table"] = SJ._state_table_name(str(table_dir), "v1")
    meta_path.write_text(_json.dumps(meta))

    with pytest.raises(ValueError, match="pass spark"):
        SJ.prune_snapshots(str(table_dir), keep_last=1)
    # nothing was deleted - v0 survived the refused prune
    assert SJ.list_upsert_versions(str(table_dir)) == ["v0", "v1", "v2"]

    dropped = SJ.prune_snapshots(str(table_dir), keep_last=1, spark=spark)
    assert dropped == ["v0", "v1"]


def test_ledger_append_precedes_pointer_swap(spark, tmp_path, monkeypatch):
    """_publish_pointer must ledger the snapshot BEFORE the pointer
    swap: a crash between the two then leaves a fully-written ledgered
    snapshot (harmless to retain) instead of an unledgered CURRENT one
    that the next prune deletes as an orphan - losing real history."""
    import os as _os

    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    for i in range(2):
        batch = spark.createDataFrame(
            [(f"k{i}", float(i))], "event_type string, value double"
        )
        SJ._apply_refresh_batch(batch, i, str(table_dir), ["event_type"], specs)

    real_replace = _os.replace

    def crash_before_swap(src, dst):
        if _os.path.basename(dst) == "_current":
            raise OSError("simulated crash between ledger append and swap")
        return real_replace(src, dst)

    monkeypatch.setattr(SJ.os, "replace", crash_before_swap)
    batch = spark.createDataFrame([("k2", 2.0)], "event_type string, value double")
    with pytest.raises(OSError, match="simulated crash"):
        SJ._apply_refresh_batch(batch, 2, str(table_dir), ["event_type"], specs)
    monkeypatch.undo()

    # pointer still names the pre-crash snapshot; v2 is ledgered
    assert (table_dir / "_current").read_text().strip() == "v1"
    with open(table_dir / "_published.log") as f:
        assert "v2" in {line.strip() for line in f}
    # the ledgered-but-never-current v2 survives retention (it is
    # fully written), and real history is intact
    dropped = SJ.prune_snapshots(str(table_dir), keep_last=3)
    assert dropped == []
    assert SJ.list_upsert_versions(str(table_dir)) == ["v0", "v1", "v2"]
    # recovery: the replayed batch publishes a fresh snapshot normally
    SJ._apply_refresh_batch(batch, 2, str(table_dir), ["event_type"], specs)
    assert (table_dir / "_current").read_text().strip() == "v2r1"


def test_agg_refresh_sink_bucketed_state_no_reshuffle(spark, tmp_path):
    """The production refresh shape (round-10 VERDICT ask #1): with
    state_format='bucketed' the sink persists each snapshot's state as
    an external bucketed table and folds via the join-shaped merge -
    the persisted state side is never re-shuffled, only the batch's
    partials move. Asserted on the SINK'S OWN refresh plan via the
    exchange count each snapshot's _meta.json records, answers
    hash-identical to the plain-parquet sink and the batch recompute."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")

    def stream():
        return SJ.read_events_stream(spark, str(src)).select(
            "event_id", "event_type", "value"
        )

    def run(table_dir, ckpt, fmt):
        SJ.run_agg_refresh_sink(
            stream(), str(table_dir), ["event_type"], _IVM_SPECS, str(ckpt),
            state_format=fmt,
        )

    buck_dir, plain_dir = tmp_path / "gold_b", tmp_path / "gold_p"
    buck_dir.mkdir(), plain_dir.mkdir()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        run(buck_dir, tmp_path / "ckb", "bucketed")
        run(plain_dir, tmp_path / "ckp", "parquet")
        # second delta batch onto the same tables
        ev = SJ.read_events_batch(spark, str(src)).select(
            "event_id", "event_type", "value"
        )
        delta = ev.limit(400).withColumn(
            "event_id", F.col("event_id") + 10_000_000
        )
        delta.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d"))
        for i, f in enumerate((tmp_path / "d").glob("*.parquet")):
            shutil.copy(f, src / f"b{i}.parquet")
        run(buck_dir, tmp_path / "ckb", "bucketed")
        run(plain_dir, tmp_path / "ckp", "parquet")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    got_b = sorted(map(tuple, SJ.read_agg_table(
        spark, str(buck_dir), ["event_type"], _IVM_SPECS).collect()))
    got_p = sorted(map(tuple, SJ.read_agg_table(
        spark, str(plain_dir), ["event_type"], _IVM_SPECS).collect()))
    all_facts = SJ.read_events_batch(spark, str(src)).select(
        "event_id", "event_type", "value"
    )
    assert got_b == got_p == _ivm_want(all_facts) and len(got_b) > 0

    # the plan gate, on the sink's own recorded refresh plans: the
    # second batch's fold must shuffle LESS in bucketed mode (the
    # state-side Exchange is gone; only the delta's partials move)
    def meta(table_dir):
        cur = (table_dir / "_current").read_text().strip()
        with open(table_dir / cur / "_meta.json") as f:
            return json.load(f)

    mb, mp = meta(buck_dir), meta(plain_dir)
    assert mb["state_table"].startswith("ivm_state_")
    assert mb["exchanges"] < mp["exchanges"], (mb, mp)

    # retention drops the catalog entry with the directory - and
    # refuses to prune a bucketed snapshot without a session
    with pytest.raises(ValueError, match="pass spark"):
        SJ.prune_snapshots(str(buck_dir), keep_last=1)
    dropped = SJ.prune_snapshots(str(buck_dir), keep_last=1, spark=spark)
    assert dropped == ["v0"]
    assert not spark.catalog.tableExists(
        SJ._state_table_name(str(buck_dir), "v0")
    )
    # the surviving snapshot still reads
    assert len(SJ.read_agg_table(
        spark, str(buck_dir), ["event_type"], _IVM_SPECS).collect()) > 0


def test_bucketed_sink_survives_catalog_loss_and_format_switch(spark, tmp_path):
    """Two review findings (r11): (a) the session catalog is in-memory,
    so after a restart the previous snapshot's bucketed table must be
    re-registered from its surviving data files, not assumed present;
    (b) continuing an existing PARQUET-format table with
    state_format='bucketed' must fold through the plain-parquet
    snapshot once (transition batch) instead of resolving a state
    table that was never registered."""
    specs = [("n", "1", "count"), ("total", "value", "sum")]

    # (b) format switch: batch 0 lands via the parquet mode
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    b0 = spark.createDataFrame(
        [("a", 1.0), ("b", 10.0)], "event_type string, value double"
    )
    SJ._apply_refresh_batch(b0, 0, str(table_dir), ["event_type"], specs)
    b1 = spark.createDataFrame(
        [("a", 5.0), ("c", 7.0)], "event_type string, value double"
    )
    SJ._apply_refresh_batch(
        b1, 1, str(table_dir), ["event_type"], specs, state_format="bucketed"
    )
    got = {
        tuple(r)
        for r in SJ.read_agg_table(
            spark, str(table_dir), ["event_type"], specs
        ).collect()
    }
    assert got == {("a", 2, 6.0), ("b", 1, 10.0), ("c", 1, 7.0)}

    # (a) catalog loss: drop the v1 table entry (what a process restart
    # does - data files survive, the in-memory catalog does not)
    with open(table_dir / "v1" / "_meta.json") as f:
        import json

        tname = json.load(f)["state_table"]
    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    b2 = spark.createDataFrame(
        [("a", 2.0)], "event_type string, value double"
    )
    SJ._apply_refresh_batch(
        b2, 2, str(table_dir), ["event_type"], specs, state_format="bucketed"
    )
    got = {
        tuple(r)
        for r in SJ.read_agg_table(
            spark, str(table_dir), ["event_type"], specs
        ).collect()
    }
    assert got == {("a", 3, 8.0), ("b", 1, 10.0), ("c", 1, 7.0)}
    SJ.prune_snapshots(str(table_dir), keep_last=1, spark=spark)


def test_bucketed_sink_refuses_null_group_keys(spark, tmp_path):
    """The joined merge's plain key equality does not combine
    null-keyed groups (the parquet mode's groupBy merge does), so the
    bucketed mode must refuse a null-keyed batch loudly instead of
    silently accumulating one state row per batch for the null group.
    The guard rides IN the write's plan (raise_error around the key
    columns - an eager take(1) would re-run the batch's scan + partial
    agg twice per batch, and its cache changed the recorded exchange
    count), so the failure surfaces as the write job's error (review
    findings r11, both passes)."""
    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    batch = spark.createDataFrame(
        [("a", 1.0), (None, 2.0)], "event_type string, value double"
    )
    with pytest.raises(Exception, match="non-null group keys"):
        SJ._apply_refresh_batch(
            batch, 0, str(table_dir), ["event_type"], specs,
            state_format="bucketed",
        )
    assert not (table_dir / "_current").exists()
    # the parquet mode takes the same batch exactly (null is a value)
    SJ._apply_refresh_batch(batch, 0, str(table_dir), ["event_type"], specs)
    got = {
        tuple(r)
        for r in SJ.read_agg_table(
            spark, str(table_dir), ["event_type"], specs
        ).collect()
    }
    assert got == {("a", 1), (None, 1)}


def test_state_table_names_do_not_collide_across_dirs():
    """Distinct table_dirs whose munged readable forms coincide must
    still get distinct catalog names, else one table's defensive DROP /
    prune destroys the other's entry (review finding r11)."""
    a = SJ._state_table_name("/data/gold-x", "v0")
    b = SJ._state_table_name("/data/gold_x", "v0")
    c = SJ._state_table_name("/data/Gold_x", "v0")
    assert len({a, b, c}) == 3
    # deterministic: retention can re-derive the name for an orphan
    assert a == SJ._state_table_name("/data/gold-x", "v0")


def test_format_switch_refuses_legacy_null_key_state(spark, tmp_path):
    """Review finding (r11 pass 3): the parquet mode legitimately
    carries null-keyed groups; switching such a table to bucketed must
    fail ONCE, at the switch, with a migration message - not wedge
    every batch with a guard that falsely blames the batch. A failed
    batch also must not leave a half-written snapshot directory."""
    specs = [("n", "1", "count")]
    table_dir = tmp_path / "gold"
    table_dir.mkdir()
    batch = spark.createDataFrame(
        [("a", 1.0), (None, 2.0)], "event_type string, value double"
    )
    SJ._apply_refresh_batch(batch, 0, str(table_dir), ["event_type"], specs)
    before = SJ.list_upsert_versions(str(table_dir))
    clean = spark.createDataFrame([("b", 3.0)], "event_type string, value double")
    with pytest.raises(ValueError, match="cannot switch"):
        SJ._apply_refresh_batch(
            clean, 1, str(table_dir), ["event_type"], specs,
            state_format="bucketed",
        )
    # no half-written snapshot left behind; pointer unmoved
    assert SJ.list_upsert_versions(str(table_dir)) == before
    assert (table_dir / "_current").read_text().strip() == "v0"
    # the parquet mode continues to work on the same table
    SJ._apply_refresh_batch(clean, 1, str(table_dir), ["event_type"], specs)
    got = {
        tuple(r)
        for r in SJ.read_agg_table(
            spark, str(table_dir), ["event_type"], specs
        ).collect()
    }
    assert got == {("a", 1), (None, 1), ("b", 1)}
