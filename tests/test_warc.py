"""WARC/WET source tests: byte-exact round trips through the stdlib
writer + parser, the Common Crawl gzip-member form, malformed handling,
and the Spark DataSource end to end."""

from __future__ import annotations

import pytest

from nyc_government_hiring_audit_data_platform_spark.sources.warc_source import (
    encode_warc,
    parse_warc,
    read_warc,
    read_warc_file,
)

_RECS = [
    ("warcinfo", "", b"software: test\r\n"),
    ("response", "http://example.com/a", b"<html>alpha</html>"),
    ("conversion", "http://example.com/a", "alpha text éé".encode()),
    ("conversion", "http://example.com/b", b"beta text with\r\nnewlines\r\n"),
]


def test_roundtrip_plain():
    recs = parse_warc(encode_warc(_RECS))
    assert [(r.record_type, r.target_uri, r.payload) for r in recs] == _RECS


@pytest.mark.parametrize("per_member", [True, False])
def test_roundtrip_gzip(tmp_path, per_member):
    p = tmp_path / "f.warc.gz"
    p.write_bytes(encode_warc(_RECS, compress=True, per_record_members=per_member))
    recs = read_warc_file(str(p))
    assert [(r.record_type, r.target_uri, r.payload) for r in recs] == _RECS


def test_payload_delimits_by_content_length_not_markers():
    """A payload CONTAINING 'WARC/1.0' and CRLFCRLF must not split the
    stream - Content-Length is the only delimiter."""
    tricky = b"embedded\r\n\r\nWARC/1.0\r\nfake: header\r\n\r\nmore"
    recs = parse_warc(encode_warc([("response", "u", tricky), ("conversion", "v", b"x")]))
    assert len(recs) == 2
    assert recs[0].payload == tricky and recs[1].payload == b"x"


def test_malformed_rejected():
    good = encode_warc(_RECS)
    with pytest.raises(ValueError):
        parse_warc(good[:-6])  # truncated payload/separator
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")  # not WARC
    bad = good.replace(b"Content-Length: 18", b"Content-Leng: 18", 1)
    with pytest.raises(ValueError):
        parse_warc(bad)


def test_warc_streaming_tail(spark, tmp_path):
    """readStream tails a growing crawl directory: the first availableNow
    run ingests the existing files, a later run picks up ONLY files
    sorting after the committed name watermark, and checkpoint recovery
    replays an exact name range."""
    from nyc_government_hiring_audit_data_platform_spark.sources.warc_source import (
        _WarcStreamReader,
        register,
    )

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    for i in range(2):
        (crawl / f"part-{i:05d}.warc.gz").write_bytes(
            encode_warc(_RECS, compress=True)
        )
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_batch():
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and restart-with-watermark is the point here
        q = (
            spark.readStream.format("warc")
            .option("path", str(crawl / "part-*.warc.gz"))
            .option("record_types", "conversion")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    got1 = spark.read.parquet(sink).collect()
    assert len(got1) == 4  # 2 files x 2 conversion records
    # a new file lands; the restarted query ingests ONLY it
    (crawl / "part-00002.warc.gz").write_bytes(encode_warc(_RECS, compress=True))
    run_batch()
    got2 = spark.read.parquet(sink).collect()
    assert len(got2) == 6
    from collections import Counter

    by_file = Counter(r["path"].rsplit("/", 1)[-1] for r in got2)
    assert by_file == {
        "part-00000.warc.gz": 2,
        "part-00001.warc.gz": 2,
        "part-00002.warc.gz": 2,  # exactly once, no reprocessing
    }
    # replay determinism: the exact (start, end] name range
    rdr = _WarcStreamReader(
        None,
        {"path": str(crawl / "part-*.warc.gz"), "record_types": "conversion"},
    )
    replay = list(
        rdr.readBetweenOffsets(
            {"last": str(crawl / "part-00000.warc.gz")},
            {"last": str(crawl / "part-00001.warc.gz")},
        )
    )
    assert len(replay) == 2
    assert all(r[0].endswith("part-00001.warc.gz") for r in replay)


def test_wet_curation_stream_end_to_end(spark, tmp_path):
    """The full streaming topology: batch-train the curation model on a
    reference corpus, tail a crawl directory of WET files, and land
    keep/drop decisions exactly-once - row-for-row equal to applying
    the same model in batch, across a restart that picks up only the
    newly-landed file."""
    from nyc_government_hiring_audit_data_platform_spark.pipelines.corpus_ingest import (
        run_wet_curation_stream,
        wet_to_documents,
    )
    from nyc_government_hiring_audit_data_platform_spark.streaming.curation import (
        build_curation_model,
        streaming_keep_decisions,
    )

    # reference corpus for the model: repeated grams = boilerplate
    ref_docs = spark.createDataFrame(
        [
            (i, "common header gram set here " + f"body{i} " * 10, "en", "s", 1)
            for i in range(8)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    model = build_curation_model(spark, ref_docs)

    crawl = tmp_path / "crawl"
    crawl.mkdir()

    def wet_file(seed, n):
        recs = [
            (
                "conversion",
                f"http://s{seed}.example.com/p{i}",
                (f"common header gram set here unique{seed}_{i} " * 3).encode(),
            )
            for i in range(n)
        ]
        return encode_warc(recs, compress=True)

    (crawl / "part-00000.warc.gz").write_bytes(wet_file(0, 3))
    glob = str(crawl / "part-*.warc.gz")
    out, ckpt = str(tmp_path / "decisions"), str(tmp_path / "ckpt")
    run_wet_curation_stream(spark, glob, model, out, ckpt)
    got1 = spark.read.parquet(out).collect()
    assert len(got1) == 3
    # a second crawl file lands (plus a CORRUPT one); restart drains
    # exactly the new files - the corrupt file must not vanish: zero
    # decisions but a quarantine row recording it
    (crawl / "part-00001.warc.gz").write_bytes(wet_file(1, 2))
    (crawl / "part-00002.warc.gz").write_bytes(b"\x1f\x8bnot-really-gzip")
    run_wet_curation_stream(spark, glob, model, out, ckpt)
    got2 = spark.read.parquet(out).collect()
    assert len(got2) == 5
    quarantined = spark.read.parquet(out + "_quarantine").collect()
    assert len(quarantined) == 1
    assert quarantined[0]["path"].endswith("part-00002.warc.gz")
    assert quarantined[0]["error"] is not None
    # row-for-row equal to the BATCH application of the same model
    batch = {
        r["doc_id"]: r.asDict()
        for r in streaming_keep_decisions(
            wet_to_documents(spark, glob), model
        ).collect()
    }
    assert len(batch) == 5
    for r in got2:
        assert r.asDict() == batch[r["doc_id"]], r["doc_id"]


def test_wet_ingest_feeds_curation_stack(spark, tmp_path):
    """End to end: WET glob -> documents shape -> an oracle-verified
    curation query runs on the materialized table unchanged. doc_ids
    are deterministic across re-ingests (hash of file+index, not
    ingest order)."""
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ
    from nyc_government_hiring_audit_data_platform_spark.pipelines.corpus_ingest import (
        ingest_wet,
        wet_to_documents,
    )

    long_text = " ".join(["token"] * 60) + "."
    recs = [
        ("warcinfo", "", b"software: x\r\n"),
        ("conversion", "http://site-a.example.com/p1", long_text.encode()),
        ("conversion", "http://site-b.example.com/p2", b"short doc."),
        ("response", "http://site-a.example.com/p1", b"<html>raw</html>"),
    ]
    for i in range(2):
        (tmp_path / f"crawl{i}.warc.gz").write_bytes(
            encode_warc(recs, compress=True)
        )
    glob = str(tmp_path / "crawl*.warc.gz")
    docs = wet_to_documents(spark, glob)
    rows = docs.collect()
    assert len(rows) == 4  # conversion records only, 2 per file
    assert {r["source"] for r in rows} == {
        "site-a.example.com", "site-b.example.com",
    }
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    # deterministic ids: re-ingest produces the identical id set
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in wet_to_documents(spark, glob).collect()
    }
    # materialize and run a real curation query on it unchanged
    out = str(tmp_path / "corpus")
    ingest_wet(spark, glob, out)
    flags = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["gopher_quality_flags"](spark, out).collect()
    }
    by_text = {r["doc_id"]: r["text"] for r in rows}
    for did, f in flags.items():
        if by_text[did].startswith("token"):
            assert f["flag_words"] == 1  # 61 words: in range
        else:
            assert f["flag_words"] == 0  # 2 words: too short


def test_canonical_url_and_url_dedup(spark):
    """URL canonicalization collapses protocol-case / fragment /
    tracking-param / trailing-slash twins of one page, leaves distinct
    pages alone, and url_dedup keeps the min-id survivor per canonical
    form."""
    from pyspark.sql import functions as F

    from nyc_government_hiring_audit_data_platform_spark.pipelines.corpus_ingest import (
        canonical_url,
        url_dedup,
    )

    urls = [
        (0, "http://Example.COM/a/b?x=1"),
        (1, "HTTP://example.com/a/b/?x=1#frag"),           # twin of 0
        (2, "http://example.com/a/b?utm_source=t&x=1"),    # twin of 0
        (3, "http://example.com/a/b?x=1&utm_a=1&utm_b=2"), # twin of 0
        (4, "http://example.com/a/b?x=2"),                 # distinct query
        (5, "http://example.com/A/b?x=1"),                 # path is case-sensitive
        (6, "http://example.com/?utm_source=o"),           # root, params only
        (7, "not a url"),                                  # passthrough
        (8, "http://example.com"),                         # twin of 6 (bare root)
        (9, "http://Example.com/"),                        # twin of 6 too
        (10, "http://example.com/p?x=1/"),                 # slash in QUERY VALUE
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_url("url").alias("c")).collect()
    }
    assert got[0] == got[1] == got[2] == got[3] == "http://example.com/a/b?x=1"
    assert got[4] == "http://example.com/a/b?x=2"
    assert got[5] == "http://example.com/A/b?x=1"
    # the most common twin pair of all: host, host/, host/?tracking
    assert got[6] == got[8] == got[9] == "http://example.com"
    assert got[7] == "not a url"
    # a '/' ending a QUERY VALUE is part of the value (RFC 3986), not a
    # slash twin - it must survive canonicalization
    assert got[10] == "http://example.com/p?x=1/"
    kept = sorted(r["id"] for r in url_dedup(df, "url", "id").collect())
    assert kept == [0, 4, 5, 6, 7, 10]


def test_warc_datasource_and_wet_filter(spark, tmp_path):
    for i in range(2):
        (tmp_path / f"part{i}.warc.gz").write_bytes(
            encode_warc(_RECS, compress=True)
        )
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8bgarbage-not-gzip")
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = df.collect()
    clean = [r for r in rows if r["error"] is None]
    assert len(clean) == 2 * len(_RECS)
    by_key = {(r["path"].rsplit("/", 1)[-1], r["record_index"]): r for r in clean}
    r = by_key[("part0.warc.gz", 2)]
    assert r["record_type"] == "conversion"
    assert r["target_uri"] == "http://example.com/a"
    assert r["content"] == "alpha text éé"
    assert r["content_length"] == len("alpha text éé".encode())
    assert r["warc_date"] == "2024-01-01T00:00:00Z"
    bad = [r for r in rows if r["error"] is not None]
    assert len(bad) == 1 and bad[0]["path"].endswith("bad.warc.gz")

    # WET ingestion: conversion records only
    wet = read_warc(spark, str(tmp_path / "part*.warc.gz"), "conversion")
    got = wet.collect()
    assert len(got) == 4 and all(r["record_type"] == "conversion" for r in got)


def test_warc_source_reads_store_uris(spark, tmp_path):
    """The DataSource's listing and open must work for store URIs, not
    just local paths: a file:-scheme glob routes the driver-side
    listing through the Hadoop FS layer (glob_any_store) and the
    executor-side open through the scheme-parsing branch
    (open_any_store) - the same code path an s3a:// crawl dump takes."""
    for i in range(2):
        (tmp_path / f"part{i}.warc.gz").write_bytes(
            encode_warc(_RECS, compress=True)
        )
    local = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    via_uri = read_warc(spark, f"file://{tmp_path}/*.warc.gz").collect()
    assert len(via_uri) == len(local) == 2 * len(_RECS)
    strip = lambda rows: sorted(
        (r["path"].rsplit("/", 1)[-1],) + tuple(r)[1:] for r in rows
    )
    assert strip(via_uri) == strip(local)


def test_glob_any_store_session_free(tmp_path):
    """glob_any_store must work WITHOUT a SparkSession or JVM: Spark 4
    plans Python DataSources in a separate worker process, so the
    listing rides pyarrow's filesystem layer, never Py4J. file: URIs
    list through that layer; a missing directory is an empty listing,
    not an error."""
    from nyc_government_hiring_audit_data_platform_spark.sources.files import (
        glob_any_store,
    )

    (tmp_path / "a.warc.gz").write_bytes(b"x")
    (tmp_path / "b.warc").write_bytes(b"x")
    got = glob_any_store(f"file://{tmp_path}/*.warc.gz")
    assert got == [f"file://{tmp_path}/a.warc.gz"]
    assert glob_any_store(f"file://{tmp_path}/missing/*.gz") == []
