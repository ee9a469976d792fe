"""Edge-case contracts for interval_overlap_join (ADVICE r3): cells come
from raw microseconds, so sub-second overlaps that straddle a bucket
boundary are found, and degenerate empty intervals match nothing."""

from __future__ import annotations

import datetime as dt

from nyc_government_hiring_audit_data_platform_spark.operators import relational as R


def _df(spark, rows, start, end):
    return spark.createDataFrame(rows, ["id", start, end])


def test_subsecond_overlap_across_bucket_boundary(spark):
    t = dt.datetime(2024, 1, 1, 0, 0)
    # left: [0.9995s, 1.0005s) - 1ms long, straddles the 1s boundary
    left = _df(
        spark,
        [(1, t + dt.timedelta(milliseconds=999, microseconds=500),
             t + dt.timedelta(seconds=1, microseconds=500))],
        "l_start", "l_end",
    )
    # right: [1.0s, 2.0s) - overlap is [1.0s, 1.0005s), sub-millisecond
    right = _df(
        spark,
        [(2, t + dt.timedelta(seconds=1), t + dt.timedelta(seconds=2))],
        "r_start", "r_end",
    )
    got = R.interval_overlap_join(
        left, right, ["id"], ["id"], bucket_seconds=1,
        l_start="l_start", l_end="l_end", r_start="r_start", r_end="r_end",
    )
    assert got.count() == 1, "sub-second boundary-straddling overlap dropped"


def test_touching_endpoints_do_not_overlap(spark):
    t = dt.datetime(2024, 1, 1, 0, 0)
    left = _df(spark, [(1, t, t + dt.timedelta(seconds=1))], "l_start", "l_end")
    right = _df(
        spark, [(2, t + dt.timedelta(seconds=1), t + dt.timedelta(seconds=2))],
        "r_start", "r_end",
    )
    got = R.interval_overlap_join(
        left, right, ["id"], ["id"], bucket_seconds=1,
        l_start="l_start", l_end="l_end", r_start="r_start", r_end="r_end",
    )
    assert got.count() == 0, "half-open [start,end): touching must not match"


def test_degenerate_empty_interval_matches_nothing(spark):
    t = dt.datetime(2024, 1, 1, 0, 0)
    left = _df(spark, [(1, t, t)], "l_start", "l_end")  # empty [t, t)
    right = _df(
        spark, [(2, t - dt.timedelta(seconds=5), t + dt.timedelta(seconds=5))],
        "r_start", "r_end",
    )
    got = R.interval_overlap_join(
        left, right, ["id"], ["id"], bucket_seconds=1,
        l_start="l_start", l_end="l_end", r_start="r_start", r_end="r_end",
    )
    assert got.count() == 0, "empty interval contains no instant"


def test_interval_overlap_fractional_bucket_seconds(spark):
    """bucket_seconds=0.5 is a legal sub-second grid: int() truncation
    would make the cell divisor 0 and silently return an empty join."""
    from datetime import datetime as DT

    left = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 0, 0, 0, 100_000), DT(2024, 1, 1, 0, 0, 0, 700_000))],
        "lid int, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [(10, DT(2024, 1, 1, 0, 0, 0, 600_000), DT(2024, 1, 1, 0, 0, 1))],
        "rid int, r_start timestamp, r_end timestamp",
    )
    out = R.interval_overlap_join(
        left, right, ["lid"], ["rid"], bucket_seconds=0.5
    ).collect()
    assert [(r["lid"], r["rid"]) for r in out] == [(1, 10)]


def test_interval_overlap_zero_bucket_rejected(spark):
    import pytest as _pytest

    left = spark.range(0).selectExpr(
        "id AS lid", "current_timestamp() AS l_start", "current_timestamp() AS l_end"
    )
    with _pytest.raises(ValueError):
        R.interval_overlap_join(left, left, ["lid"], ["lid"], bucket_seconds=0)
