"""Serving-layer tests (EP4 surface without HTTP)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.serving import reports as SRV


@pytest.fixture(scope="module", autouse=True)
def registry(spark):
    SRV._REGISTRY.clear()
    df = spark.range(100).select(
        F.col("id").alias("rec_id"),
        (F.col("id") % 10 * 10).cast("double").alias("match_score"),
    )
    SRV.register_dataset(2, "salary_matches", lambda: df)
    SRV.register_dataset(3, "durations", lambda: df.limit(30))
    yield
    SRV._REGISTRY.clear()


def test_list_datasets():
    got = SRV.list_datasets()
    assert got == [
        {"id": 2, "name": "salary_matches"},
        {"id": 3, "name": "durations"},
    ]


def test_fetch_report_pagination_deterministic():
    p1 = SRV.fetch_report(2, offset=0, limit=10)
    p2 = SRV.fetch_report(2, offset=10, limit=10)
    assert len(p1) == len(p2) == 10
    assert {r["rec_id"] for r in p1}.isdisjoint({r["rec_id"] for r in p2})
    # stable across calls (explicit ordering)
    assert p1 == SRV.fetch_report(2, offset=0, limit=10)


def test_fetch_report_unknown_id():
    with pytest.raises(KeyError):
        SRV.fetch_report(99)


def test_dashboard_metrics(spark):
    df = SRV._REGISTRY[2][1]()
    lo, hi = SRV.score_bounds(df)
    assert (lo, hi) == (0.0, 90.0)
    filtered = SRV.filter_score_range(df, 40, 60)
    m = SRV.summary_metrics(filtered)
    assert m["rows"] == 30  # scores 40,50,60 x 10 each
    assert m["mean_score"] == 50.0


def test_build_app_gated():
    import importlib.util

    if importlib.util.find_spec("fastapi") is None:
        with pytest.raises(NotImplementedError, match="fastapi"):
            SRV.build_app()
