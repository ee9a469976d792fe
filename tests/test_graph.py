"""connected_components + merge_upsert unit behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators import graph as G
from nyc_government_hiring_audit_data_platform_spark.operators import relational as R


def test_connected_components_two_clusters_and_chain(spark):
    # component {1,2,3} (triangle), component {10,11,12,13} (chain),
    # component {20,21} (single edge)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 13), (21, 20)],
        ["src", "dst"],
    )
    got = {
        (r.node, r.component)
        for r in G.connected_components(edges, "src", "dst").collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10), (13, 10), (20, 20), (21, 20)}
    assert got == want


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    updates = spark.createDataFrame([(2, "B"), (4, "D")], ["k", "v"])
    got = {(r.k, r.v) for r in R.merge_upsert(base, updates, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_merge_upsert_is_idempotent(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    updates = spark.createDataFrame([(2, "B")], ["k", "v"])
    once = R.merge_upsert(base, updates, ["k"])
    twice = R.merge_upsert(once, updates, ["k"])
    assert {(r.k, r.v) for r in twice.collect()} == {(r.k, r.v) for r in once.collect()}


def test_connected_components_deterministic_across_edge_order(spark):
    e1 = spark.createDataFrame([(5, 6), (6, 7)], ["src", "dst"])
    e2 = spark.createDataFrame([(6, 7), (5, 6)], ["src", "dst"])
    r1 = sorted(
        (r.node, r.component) for r in G.connected_components(e1).collect()
    )
    r2 = sorted(
        (r.node, r.component) for r in G.connected_components(e2).collect()
    )
    assert r1 == r2 == [(5, 5), (6, 5), (7, 5)]
