"""Incremental ANN indexing: the production ingestion shape for the
residual-IVFADC index (operators/ann.py).

At 100 TB you never re-encode the corpus when new vectors arrive: the
coarse quantizer is TRAINED once (periodically, offline - see
``ann.kmeans_train``), frozen, and every arriving batch is encoded
map-side against it - (id, cluster, 8-byte codes) rows appended to a
persisted index table. Search then probes the index alone; raw vectors
are needed only at encode time and for an optional exact rerank.

This is the ANN analog of ``dedup.incremental_neardup`` (batch probes a
persisted band index): encode cost is proportional to the BATCH, search
cost to the probed clusters - neither to corpus size.

The frozen quantizer crosses the batch/stream boundary as a collected
list of (cluster, cv) rows - the driver-synced vocabulary-sized-model
pattern streaming/curation.py uses for its classifier weights: 16 rows
of 64 doubles inline as literal fold expressions, so the streaming
encode is a STATELESS map-only projection (no shuffle, no aggregation -
legal in append mode at any trigger) and bit-identical to the batch
encoder's output, which the tests assert row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators.ann import (
    NUM_CENTROIDS,
    _argmin,
    _c,
    _pq_codes,
    _pq_lut,
    _pq_rank_topk,
    _pq_adist,
    _pq_subvectors,
    _probe_list_l2,
    _sqdist_spark_sql,
)


def frozen_quantizer(cents: DataFrame) -> list[tuple[int, list[float]]]:
    """Collect a trained (cluster, cv) relation into the frozen-model
    form the encoders consume: cluster-ascending list of (cluster, cv).
    16 x 64 doubles - the same size class as the streaming classifier's
    weight vector; re-train offline and re-deploy to rotate it."""
    rows = sorted((r["cluster"], list(r["cv"])) for r in cents.collect())
    assert [c for c, _ in rows] == list(range(NUM_CENTROIDS))
    return rows


def _lit_dists(vec_sql: str, model: list[tuple[int, list[float]]]):
    """Array of squared L2 distances to every frozen centroid - one
    whole-stage-codegen literal fold per centroid, identical op order
    (and therefore identical doubles) to the relational trainer's
    assignment folds."""
    return F.expr(
        "array(" + ", ".join(_sqdist_spark_sql(vec_sql, cv) for _, cv in model) + ")"
    )


def _lit_centroid_array(model: list[tuple[int, list[float]]]):
    """array<array<double>> literal of the frozen centroids, indexable
    by ``cluster + 1`` (the model is cluster-ascending and total)."""
    inner = ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in cv) + ")" for _, cv in model
    )
    return F.expr(f"array({inner})")


def encode_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    model: list[tuple[int, list[float]]],
) -> DataFrame:
    """(id, cluster, codes) for every row - the residual-IVFADC index
    entry, computed entirely map-side against the frozen quantizer
    (assignment fold -> residual v - centroid[cluster] -> PQ argmin
    codes). Stateless, so the same plan serves batch AND streaming
    inputs unchanged."""
    v = df.select(
        _c(id_col).alias("id"), _c(vec_col).cast("array<double>").alias("v")
    )
    return (
        v.select("id", "v", _argmin(_lit_dists("v", model), NUM_CENTROIDS).alias("cluster"))
        .select(
            "id",
            "cluster",
            F.zip_with(
                "v",
                F.element_at(_lit_centroid_array(model), F.col("cluster") + 1),
                lambda a, b: a - b,
            ).alias("rv"),
        )
        .select("id", "cluster", *_pq_subvectors(F.col("rv")))
        .select("id", "cluster", _pq_codes().alias("codes"))
    )


def run_ann_index_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    model: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int | None = None,
):
    """Tail a directory of arriving vector parquet files and append
    their index entries exactly-once (checkpointed file-source progress;
    AvailableNow drains what exists and stops - the incremental-ingest
    recipe every other stream in this package uses). Encode is map-only,
    so the stream needs no watermark and holds no state."""
    schema = spark.read.parquet(source_dir).schema
    reader = (
        spark.readStream.schema(schema).format("parquet").option("path", source_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    encoded = encode_batch(reader.load(), id_col, vec_col, model)
    return (
        encoded.writeStream.format("parquet")
        .option("path", index_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    deleted_ids: DataFrame | None = None,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Index maintenance pass #1 (the ``sources/maintenance.py``
    pattern): the streaming sink appends one small file per
    micro-batch, and deletes accumulate as tombstones outside the
    append-only table - both degrade probes over time. Bin-pack the
    (id, cluster, codes) rows into ~target-size files CLUSTERED on
    cluster (range repartition + in-partition sort: a search probes by
    cluster equi-join, so cluster-clustered files give parquet
    row-group skipping on exactly the probe key), dropping
    ``deleted_ids`` (an (id) relation) during the rewrite. Lands in a
    fresh directory; readers of the old index are never disturbed -
    publishing is the same pointer swap every maintenance job here
    uses. Returns the output file count; content equivalence (minus
    deletes) is asserted by tests/test_ann_index.py.

    Listing/sizing go through the Hadoop FS API (recursive - nested or
    partitioned sink layouts size correctly), so compaction runs
    against the ``s3a://`` stores a streaming index actually lives on."""
    from nyc_government_hiring_audit_data_platform_spark.sources.files import (
        list_store_data_files,
    )

    files = list_store_data_files(spark, index_dir)
    if not files:
        raise ValueError(f"no parquet files under {index_dir}")
    total = sum(n for _, n in files)
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.parquet(index_dir)
    if deleted_ids is not None:
        dele = deleted_ids.select(F.col(deleted_ids.columns[0]).alias("id"))
        df = df.join(dele, "id", "left_anti")
    (
        df.repartitionByRange(n_out, "cluster", "id")
        .sortWithinPartitions("cluster", "id")
        .write.mode("error")
        .parquet(out_dir)
    )
    return len(list_store_data_files(spark, out_dir))


def log_deletes(ids: DataFrame, delete_log_dir: str, deleted_at: str) -> None:
    """Record deletions as TOMBSTONES: append (id, deleted_at) rows to
    an append-only parquet relation beside the index. The index table
    itself is append-only (the streaming sink's contract), so deletes
    cannot touch it in place; instead searches anti-join the log (see
    :func:`search_codes_index` ``deletes``) until the next
    :func:`compact_index` pass physically drops the rows and the
    consumed tombstones are cleared (:func:`consume_delete_log` /
    :func:`clear_delete_log`). ``deleted_at`` is caller-supplied (a
    batch id or wall-clock string) so replays are deterministic.

    Reference parity: the reference refreshes whole tables by CTAS
    (sql/cleaned.sql:2) - row removal is a full rewrite there; an
    append-only object-store index needs the tombstone convention so
    deletes take effect BETWEEN rewrites too."""
    first = ids.columns[0]
    (
        ids.select(F.col(first).alias("id"), F.lit(deleted_at).alias("deleted_at"))
        .write.mode("append")
        .parquet(delete_log_dir)
    )


def read_delete_log(spark: SparkSession, delete_log_dir: str) -> DataFrame | None:
    """The current tombstone set as an (id, deleted_at) relation, or
    None when the log is absent/empty (listing via the Hadoop FS layer,
    so a missing s3a:// prefix is just an empty log, not an error)."""
    from nyc_government_hiring_audit_data_platform_spark.sources.files import (
        list_store_data_files,
    )

    files = list_store_data_files(spark, delete_log_dir)
    if not files:
        return None
    return spark.read.parquet(*[f for f, _ in files])


def consume_delete_log(
    spark: SparkSession, delete_log_dir: str
) -> tuple[DataFrame | None, list[str]]:
    """Snapshot the delete log for a compaction pass: (ids relation or
    None, the exact file URIs snapshotted). Compaction drops the ids;
    after the compacted index is PUBLISHED (pointer swap), the caller
    clears exactly the consumed files with :func:`clear_delete_log` -
    tombstones appended while compaction ran are NOT consumed and keep
    gating searches until the next pass (no lost deletes)."""
    from nyc_government_hiring_audit_data_platform_spark.sources.files import (
        list_store_data_files,
    )

    files = [f for f, _ in list_store_data_files(spark, delete_log_dir)]
    if not files:
        return None, []
    return spark.read.parquet(*files).select("id"), files


def clear_delete_log(spark: SparkSession, consumed_files: list[str]) -> None:
    """Physically remove CONSUMED tombstone files (and only those) via
    the Hadoop FS API - run after the compacted index is published, so
    a crash between compact and clear only re-drops already-dropped ids
    (idempotent), never loses a delete."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for f in consumed_files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        p.getFileSystem(conf).delete(p, False)


def rotate_quantizer(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    new_model: list[tuple[int, list[float]]],
    out_dir: str,
) -> None:
    """Index maintenance pass #2: cluster ids and PQ codes are
    MODEL-RELATIVE, so retraining the coarse quantizer (periodically,
    offline - drift, corpus growth) invalidates every entry at once;
    there is no incremental patch. Rotation = re-encode the raw corpus
    against the NEW frozen model into a fresh index directory - the
    same map-only ``encode_batch`` plan ingest uses (no shuffle, one
    corpus pass), and the only time after initial ingest that raw
    vectors are touched. Old index stays live until the pointer swap.
    tests/test_ann_index.py asserts the rotated index equals a fresh
    encode AND that searching it reproduces the composed
    ivfadc_residual_topk under the retrained quantizer."""
    encode_batch(corpus, id_col, vec_col, new_model).write.mode("error").parquet(
        out_dir
    )


def search_codes_index_rerank(
    index: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    query_id: str,
    query_vec: str,
    model: list[tuple[int, list[float]]],
    k: int,
    nprobe: int = 4,
    shortlist_factor: int = 4,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    deletes: DataFrame | None = None,
) -> DataFrame:
    """The full production query path over the PERSISTED index: ADC
    shortlist from the (id, cluster, codes) table via
    :func:`search_codes_index`, then ONLY the shortlist's raw vectors
    fetched from the vector table (``vectors``, bound by the explicit
    ``vec_id_col``/``vec_col`` names, defaulting to the ingest schema
    :func:`run_ann_index_stream` reads - the ingest source, touched
    shortlist-bounded by a broadcast id join) and re-scored with exact
    squared L2 - quantization error confined to shortlist membership,
    exactly :func:`operators.ann.ivfadc_rerank_topk` with the
    corpus-side work replaced by index lookups. Output
    (query_id, neighbor_id, d2, rank)."""
    from nyc_government_hiring_audit_data_platform_spark.operators.ann import (
        _SQDIST_LAMBDA,
        norm_round,
    )
    from pyspark.sql import Window

    short = search_codes_index(
        index, queries, query_id, query_vec, model, k * shortlist_factor, nprobe,
        deletes=deletes,
    ).select("query_id", "neighbor_id")
    raw = vectors.select(
        F.col(vec_id_col).alias("neighbor_id"),
        _c(vec_col).cast("array<double>").alias("cv"),
    )
    qv = queries.select(
        _c(query_id).alias("query_id"),
        _c(query_vec).cast("array<double>").alias("qv"),
    )
    d2 = F.expr(_SQDIST_LAMBDA.format(a="qv", b="cv"))
    scored = (
        raw.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", norm_round("d2", 6).alias("d2"), "rank")
    )


def search_codes_index(
    index: DataFrame,
    queries: DataFrame,
    query_id: str,
    query_vec: str,
    model: list[tuple[int, list[float]]],
    k: int,
    nprobe: int = 4,
    prune_scan: bool = False,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Residual-ADC top-k over a prebuilt (id, cluster, codes) index:
    each query broadcasts nprobe (cluster, LUT) rows computed against
    the SAME frozen quantizer the index was encoded with; candidates
    come from the cluster equi-join and cost 16 array lookups each. The
    corpus is never touched - only the 8-byte-code index moves.

    ``prune_scan``: a JOIN on cluster reads the whole index; the probed
    cluster SET is bounded (<= |queries| * nprobe ids), so collecting
    it (the bounded-model driver-sync pattern) and applying it as a
    static ``cluster IN (...)`` filter pushes into the parquet scan -
    on the cluster-clustered layout :func:`compact_index` writes, that
    is row-group skipping on exactly the probe key (~nprobe/16 of the
    index READ, not just joined). Results are provably identical (the
    join already discards every other cluster); costs one extra tiny
    job to compute the probe set. The right mode for a bounded query
    panel against a big index; leave off for streaming-fresh queries
    where an extra action per batch is worse than the scan.

    ``deletes``: the tombstone relation (first column = deleted id;
    pass :func:`read_delete_log` output) anti-joined against the index
    BEFORE the probe join, so deleted rows stop matching the instant
    they are logged - no compaction needed first. Between compactions
    the log is cadence-bounded and parquet-size-known, so the planner
    broadcasts the anti-join side on its own; compaction then consumes
    the log and drops the rows physically."""
    if deletes is not None:
        dele = deletes.select(F.col(deletes.columns[0]).alias("id"))
        index = index.join(dele, "id", "left_anti")
    q = (
        queries.select(
            _c(query_id).alias("query_id"),
            _c(query_vec).cast("array<double>").alias("v"),
        )
        .select(
            "query_id",
            "v",
            F.explode(_probe_list_l2(_lit_dists("v", model), nprobe)).alias("cluster"),
        )
        .select(
            "query_id",
            "cluster",
            F.zip_with(
                "v",
                F.element_at(_lit_centroid_array(model), F.col("cluster") + 1),
                lambda a, b: a - b,
            ).alias("rv"),
        )
        .select("query_id", "cluster", *_pq_subvectors(F.col("rv")))
        .select("query_id", "cluster", _pq_lut().alias("lut"))
    )
    if prune_scan:
        probed = sorted(
            {r["cluster"] for r in q.select("cluster").distinct().collect()}
        )
        index = index.filter(F.col("cluster").isin(probed))
    c = index.select(F.col("id").alias("neighbor_id"), "cluster", "codes")
    scored = c.join(
        F.broadcast(q),
        (q["cluster"] == c["cluster"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id", _pq_adist().alias("adist"))
    return _pq_rank_topk(scored, k)
