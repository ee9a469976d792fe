"""Bloom membership gate: zero false negatives, deterministic bits,
and the incremental-dedup prefilter integration (probe-cut without
survivor-set change)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators import bloom as B
from nyc_government_hiring_audit_data_platform_spark.operators import dedup as D


def _keys_df(spark, names):
    return spark.createDataFrame([(n,) for n in names], "k string")


def test_zero_false_negatives_and_duckdb_parity(spark):
    """Every inserted key must hit (structural guarantee), and DuckDB
    must rebuild the byte-identical filter from the shared hash text."""
    members = [f"doc-{i}" for i in range(200)]
    filt = B.bloom_build(_keys_df(spark, members), "k")
    probes = members + [f"other-{i}" for i in range(200)]
    got = {
        r["k"]: r["bloom_hit"]
        for r in B.bloom_probe(_keys_df(spark, probes), "k", filt).collect()
    }
    assert all(got[m] for m in members), "false negative: breaks dedup safety"
    fp = sum(got[o] for o in probes if o.startswith("other-"))
    # M=65536, K=4, n=200 -> FP ~ 2e-8; even 1 hit would be suspicious
    assert fp == 0, f"{fp} false positives at n=200 (expected ~0)"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ks AS SELECT 'doc-' || CAST(i AS VARCHAR) AS k "
        "FROM range(0, 200) t(i)"
    )
    build = B.bloom_build_sql("SELECT k FROM ks", "k")
    sql = f"""
    WITH {build.strip()},
    probes AS (
      SELECT k, {B.base_hash_sql('k')} AS h FROM (
        SELECT 'doc-' || CAST(i AS VARCHAR) AS k FROM range(0, 200) t(i)
        UNION ALL
        SELECT 'other-' || CAST(i AS VARCHAR) FROM range(0, 200) t(i))
    )
    SELECT k, {B.bloom_hit_sql('h')} FROM probes CROSS JOIN bloom_filt
    """
    assert dict(con.execute(sql).fetchall()) == got


def test_filter_is_fixed_size_one_row(spark):
    """The filter is ONE row of M/32 packed words regardless of input
    cardinality - the constant-memory contract."""
    small = B.bloom_build(_keys_df(spark, ["a"]), "k").collect()
    big = B.bloom_build(
        _keys_df(spark, [f"k{i}" for i in range(3000)]), "k"
    ).collect()
    for rows in (small, big):
        assert len(rows) == 1
        assert len(rows[0]["fb"]) == B.BLOOM_WORDS
    # and the single-key filter sets exactly K bits (no collisions at n=1)
    popcount = sum(bin(w & 0xFFFFFFFF).count("1") for w in small[0]["fb"])
    assert popcount == B.BLOOM_K


def test_null_keys_insert_nothing(spark):
    """A NULL key hashes to NULL and must be SKIPPED on build — the
    SQL twin's word-range LEFT JOIN drops the NULL bit group
    implicitly, so the Spark fold crashing on a NULL map key
    (map_from_entries) would be a build-crash-vs-oracle-success
    divergence. A NULL-only build is the all-zero filter; mixed input
    equals the filter over just the non-NULL keys."""
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "k string"
    )
    mixed = B.bloom_build(df, "k").collect()[0]["fb"]
    clean = B.bloom_build(_keys_df(spark, ["a", "b"]), "k").collect()[0]["fb"]
    assert mixed == clean
    empty = B.bloom_build(
        spark.createDataFrame([(None,)], "k string"), "k"
    ).collect()[0]["fb"]
    assert all(w == 0 for w in empty)


def test_incremental_prefilter_preserves_survivors_and_cuts_probes(spark, sf_smoke):
    """bloom-gated incremental_neardup: identical match set, fewer band
    rows reaching the index join (unseen batch rows drop map-side)."""
    corpus = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    dup_src = corpus.orderBy("doc_id").limit(3).collect()
    rows = [
        (10_000 + i, r["text"] + " tail") for i, r in enumerate(dup_src)
    ] + [
        (20_000 + i, f"fresh never-seen document number {i} alpha beta gamma")
        for i in range(20)
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    index = D.build_band_index(corpus, "text", "doc_id").persist()
    try:
        gate = D.band_bloom_gate(index)
        plain = D.incremental_neardup(batch, index, "text", "doc_id", 0.25)
        gated = D.incremental_neardup(
            batch, index, "text", "doc_id", 0.25, bloom_gate=gate
        )
        key = lambda r: (r["new_id"], r["corpus_id"], r["jaccard"])
        assert sorted(map(key, plain.collect())) == sorted(
            map(key, gated.collect())
        ), "bloom gate changed the survivor set - false negative somewhere"

        # probe-cut: the fresh docs' band rows must mostly miss the gate
        batch_idx = D.build_band_index(batch, "text", "doc_id").withColumn(
            "__k", F.concat_ws(":", F.col("band").cast("string"), F.col("bh"))
        )
        probed = B.bloom_probe(batch_idx, "__k", gate)
        n_all = probed.count()
        n_pass = probed.filter(F.col("bloom_hit")).count()
        assert n_pass < n_all, (
            f"gate passed all {n_all} band rows - no probe reduction"
        )
        # every band row of a genuinely matching doc must pass
        match_ids = {r["new_id"] for r in plain.collect()}
        if match_ids:
            kept = {
                r["id"]
                for r in probed.filter(F.col("bloom_hit")).select("id").collect()
            }
            assert match_ids <= kept
    finally:
        index.unpersist()


def test_null_key_probe_is_false_not_null(spark):
    """The zero-false-negative contract must hold for NULL keys too: a
    NULL key never sets bits at build, so probing it must yield
    bloom_hit = False - not NULL, which a ``~bloom_hit`` consumer would
    silently drop (ADVICE r6). Both engine twins."""
    filt = B.bloom_build(_keys_df(spark, ["a", "b"]), "k")
    got = {
        r["k"]: r["bloom_hit"]
        for r in B.bloom_probe(
            _keys_df(spark, ["a", None]), "k", filt
        ).collect()
    }
    assert got["a"] is True
    assert got[None] is False  # False, not None

    con = duckdb.connect()
    build = B.bloom_build_sql("SELECT 'a' AS k UNION ALL SELECT 'b'", "k")
    sql = f"""
    WITH {build.strip()},
    probes AS (
      SELECT k, {B.base_hash_sql('k')} AS h FROM (
        SELECT 'a' AS k UNION ALL SELECT NULL)
    )
    SELECT k, {B.bloom_hit_sql('h')} FROM probes CROSS JOIN bloom_filt
    """
    assert dict(con.execute(sql).fetchall()) == {"a": True, None: False}
