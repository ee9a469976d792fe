"""Misra-Gries heavy-hitter sketch: the deterministic bound contract."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators.sketches import (
    misra_gries_summary,
)


def _check_bounds(spark, items, k, n_partitions=4):
    df = spark.createDataFrame([(x,) for x in items], ["term"]).repartition(
        n_partitions
    )
    got = {r["term"]: r["est"] for r in misra_gries_summary(df, "term", k).collect()}
    n = len(items)
    exact: dict[str, int] = {}
    for x in items:
        exact[x] = exact.get(x, 0) + 1
    for t, c in exact.items():
        est = got.get(t, 0)
        assert est <= c, (t, est, c)
        assert est >= c - n / (k + 1) - 1e-9, (t, est, c, n / (k + 1))
        if c > n / (k + 1):
            assert t in got, f"true heavy hitter {t} lost"
    # bounded output: at most k rows per partition survive the merge
    assert len(got) <= k * n_partitions


def test_mg_skewed_stream(spark):
    rng = random.Random(7)
    items = (
        ["alpha"] * 500 + ["beta"] * 300 + ["gamma"] * 120
        + [f"tail{rng.randrange(200)}" for _ in range(600)]
    )
    rng.shuffle(items)
    _check_bounds(spark, items, k=6)


def test_mg_uniform_stream_no_false_negatives(spark):
    rng = random.Random(11)
    items = [f"t{rng.randrange(40)}" for _ in range(2000)]
    rng.shuffle(items)
    _check_bounds(spark, items, k=10)


def test_mg_exact_when_domain_fits(spark):
    items = ["a"] * 10 + ["b"] * 5 + ["c"] * 2
    df = spark.createDataFrame([(x,) for x in items], ["term"]).coalesce(1)
    got = {r["term"]: r["est"] for r in misra_gries_summary(df, "term", 8).collect()}
    assert got == {"a": 10, "b": 5, "c": 2}


def test_kmv_source_similarity_extremes_and_bound(spark, tmp_path):
    """KMV estimator semantics the parity harness can't see: two
    sources with IDENTICAL content must estimate exactly 1000 milli
    (identical sketches), disjoint sources exactly 0, and the exact
    lane must agree - plus the within_bound contract holds on the real
    corpus (asserted over sf0.01 in test_oracle_parity's value check;
    here over the synthetic extremes)."""
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    words_a = " ".join(f"a{i}" for i in range(200))
    words_b = " ".join(f"b{i}" for i in range(200))
    rows = [
        (0, words_a, "en", "sA", 1),
        (1, words_a, "en", "sB", 1),   # sB identical to sA
        (2, words_b, "en", "sC", 1),   # sC disjoint from both
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "kmv_sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        (r["src_a"], r["src_b"]): r
        for r in DQ.QUERIES["kmv_source_similarity"](spark, d).collect()
    }
    spark.catalog.clearCache()
    assert out[("sA", "sB")]["kmv_est_milli"] == 1000
    assert out[("sA", "sB")]["exact_milli"] == 1000
    assert out[("sA", "sC")]["kmv_est_milli"] == 0
    assert out[("sB", "sC")]["n_shared"] == 0
    assert all(r["within_bound"] for r in out.values())


def test_kmv_source_novelty_extremes(spark, tmp_path):
    """Containment-novelty semantics the parity harness can't see: a
    source whose content is fully CONTAINED in another (a mirror) must
    read novelty 0 on both lanes; a source sharing nothing with the
    rest must read 1000 on both; and the estimator's tau restriction
    must still leave a live sample (n_eff >= 1) with within_bound
    everywhere."""
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    words_a = " ".join(f"a{i}" for i in range(200))
    words_b = " ".join(f"b{i}" for i in range(200))
    rows = [
        (0, words_a, "en", "sA", 1),
        (1, words_a, "en", "sMirror", 1),  # fully contained in sA
        (2, words_b, "en", "sNew", 1),     # disjoint from everything
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "kmv_nov_sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["source"]: r for r in DQ.QUERIES["kmv_source_novelty"](spark, d).collect()}
    spark.catalog.clearCache()
    assert out["sMirror"]["novelty_est_milli"] == 0
    assert out["sMirror"]["novelty_exact_milli"] == 0
    assert out["sNew"]["novelty_est_milli"] == 1000
    assert out["sNew"]["novelty_exact_milli"] == 1000
    assert all(r["n_eff"] >= 1 for r in out.values())
    assert all(r["within_bound"] for r in out.values())
