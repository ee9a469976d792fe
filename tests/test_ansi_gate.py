"""ANSI-mode driver-session gate.

The external verifier runs `queries()` in a PLAIN SparkSession - Spark 4
defaults `spark.sql.ansi.enabled=true` there, while this repo's own
session factory (and therefore every other test) runs ANSI OFF. Under
ANSI, to_timestamp/to_date/casts THROW where non-ANSI returns null, and
getItem/element_at throw on invalid indices - a query can be green in
the whole local suite and still crash in the driver (round 2 caught
exactly this in the gold fuzzy chain). This smoke executes EVERY
declared query end-to-end with ANSI forced on, at the smallest scale
factor so the whole sweep stays cheap."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_under_ansi(spark, sf_smoke, name):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        n = QUERIES[name](spark, sf_smoke).count()
        assert n >= 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
