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
