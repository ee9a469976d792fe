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
