"""WET -> documents ingestion: the Common Crawl front door.

Connects the WARC/WET source (sources/warc_source.py) to the curation
stack: conversion records become rows in the ``documents`` table shape
(doc_id, text, lang, source, n_chars) that every curation / dedup /
quality query in the suite consumes - so a user can point the engine at
a WET glob and run the exact oracle-verified pipeline
(gopher/c4/dedup/lang filters) downstream.

Per-row derivations are all map-side expressions: doc_id is a
deterministic 64-bit hash of (file, record index) - stable across
re-runs and executor retries, unlike monotonically_increasing_id;
source is the URI host (``parse_url``); lang is the engine's n-gram
heuristic (functions/textstats.py:lang_id). The scan itself is the
WARC DataSource's one-task-per-file partitioning, so the whole ingest
is scan -> project -> (optional) write: linear at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.functions.textstats import lang_id
from nyc_government_hiring_audit_data_platform_spark.sources.warc_source import (
    read_warc,
    register,
)
from nyc_government_hiring_audit_data_platform_spark.streaming.curation import (
    streaming_keep_decisions,
)


def _documents_projection(raw: DataFrame) -> DataFrame:
    """WARC conversion-record relation -> the ``documents`` shape
    (shared by the batch ingest and the streaming curation tail)."""
    return raw.filter(F.col("error").isNull()).select(
        F.xxhash64("path", "record_index").alias("doc_id"),
        F.col("content").alias("text"),
        lang_id(F.col("content")).alias("lang"),
        F.coalesce(
            F.parse_url("target_uri", F.lit("HOST")), F.lit("unknown")
        ).alias("source"),
        F.length("content").cast("long").alias("n_chars"),
    )


def wet_to_documents(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET conversion records -> the ``documents`` table shape."""
    return _documents_projection(read_warc(spark, path_glob, "conversion"))


def canonical_url(col) -> "F.Column":
    """URL canonicalization for crawl dedup (the C4/CCNet first-stage
    rule: one document per canonical URL before any text dedup):
    lowercase scheme+host, drop the fragment, drop common tracking
    query parameters (utm_*, fbclid, gclid), strip a trailing slash on
    the PATH (including the bare root, so host, host/ and host/?utm=..
    collapse), and drop an empty query's dangling '?'. A '/' at the end
    of a QUERY VALUE is deliberately preserved - '?x=1/' and '?x=1' are
    different query strings per RFC 3986, not slash twins. Pure column
    expressions - canonicalization is map-side at any crawl size."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    # scheme://host is case-insensitive per RFC 3986; the path is not
    scheme_host = F.lower(F.regexp_extract(c, r"^([a-zA-Z]+://[^/?#]*)", 1))
    rest = F.regexp_extract(c, r"^[a-zA-Z]+://[^/?#]*([^#]*)", 1)
    # drop tracking params; one regexp pass skips the char it consumed,
    # so ADJACENT tracking params need another pass - three passes
    # cover runs of up to 7 (documented bound; real URLs carry 1-3)
    track = r"(?i)([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"
    for _ in range(3):
        rest = F.regexp_replace(rest, track, "$1")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")  # dangling ? or &
    # trailing slash, INCLUDING the bare root: http://a.com/ and
    # http://a.com are the single most common URL-twin pair - `.*?`
    # (not `.+?`) lets the captured path be empty so both collapse
    rest = F.regexp_replace(rest, r"^(/.*?)/*(\?|$)", "$1$2")
    rest = F.regexp_replace(rest, r"^/(\?|$)", "$1")
    return F.when(scheme_host == "", c).otherwise(F.concat(scheme_host, rest))


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """One survivor per canonical URL (min id wins - deterministic):
    the crawl-level dedup that runs BEFORE text dedup, removing
    protocol/tracking-parameter twins of the same page. One hash
    shuffle on the canonical key."""
    canon = df.withColumn("_curl", canonical_url(url_col))
    keep = canon.groupBy("_curl").agg(F.min(id_col).alias(id_col))
    return (
        canon.join(keep, [id_col, "_curl"], "leftsemi").drop("_curl")
    )


def ingest_wet(
    spark: SparkSession, path_glob: str, out_dir: str
) -> DataFrame:
    """Materialize a WET glob as a ``documents.parquet`` the query
    suite reads directly (every ``queries()`` callable takes the
    directory as its sf_dir)."""
    docs = wet_to_documents(spark, path_glob)
    docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return docs


def run_wet_curation_stream(
    spark: SparkSession,
    path_glob: str,
    model: dict,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """The full STREAMING ingest+curation flow, end to end: tail the
    crawl directory (the WARC source's name-watermark stream), project
    WET conversion records into the documents shape, apply the
    batch-trained curation filter stack as stateless expressions
    (streaming/curation.py:streaming_keep_decisions - valid in append
    mode, no watermark needed), and land per-document keep/drop
    decisions exactly-once in a checkpointed parquet sink.

    This is the production topology: the model (gram set, surprisal
    weights, band) trains on a reference corpus in batch and ships into
    the stream as literal expressions; every newly-landed crawl file is
    scored once - restart from the checkpoint resumes at the committed
    file watermark. One availableNow pass per invocation (drains
    whatever has landed fully, then stops - cron-friendly; a continuous
    trigger is the one-line variant).

    CORRUPT crawl files cannot vanish: the projection drops quarantine
    rows from the decisions lane, but a second stream (own checkpoint,
    same watermark contract) tees every error row to
    ``<out_dir>_quarantine`` - without it, the committed watermark
    would advance past a truncated file leaving zero trace anywhere."""
    register(spark)

    def _tail():
        return (
            spark.readStream.format("warc")
            .option("path", path_glob)
            .option("record_types", "conversion")
            .load()
        )

    decisions = streaming_keep_decisions(_documents_projection(_tail()), model)
    q = (
        decisions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    quarantine = _tail().filter(F.col("error").isNotNull()).select(
        "path", "error", "record_index"
    )
    q2 = (
        quarantine.writeStream.format("parquet")
        .option("path", f"{out_dir}_quarantine")
        .option("checkpointLocation", f"{checkpoint_dir}_quarantine")
        .trigger(availableNow=True)
        .start()
    )
    # untimed: a drain slower than any fixed timeout must BLOCK, not
    # silently return with the query still running (the next cron
    # invocation would then start() against a live checkpoint)
    q.awaitTermination()
    q2.awaitTermination()
