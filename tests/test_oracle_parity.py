"""Local replica of the driver's correctness gate.

For every query that declares an oracle: run the Spark DataFrame and the
DuckDB SQL on the same parquet tables, sort columns by name, sort rows,
and compare values exactly (after canonicalizing floats/dates to
strings). This is intentionally stricter than "close enough" - the
driver hash-compares, so any drift is a failure.

Queries without an oracle get a rows-run smoke check here (the driver
records the same weaker check).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


def _canon(v):
    """Canonicalize a value for cross-engine comparison.

    Raw list/dict cells are REJECTED outright: the driver's value-hasher
    cannot hash them (round-2 regression class) - queries must serialize
    array/map outputs to strings (array_join / to_json) on both engines.
    """
    if isinstance(v, (list, dict, set)):
        raise TypeError(
            f"unserialized collection cell {v!r}: emit array_join/to_json "
            "strings on both engines (driver hasher can't hash arrays)"
        )
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Round-3 lesson: the driver's hasher distinguishes int 9 from
        # double 9.0 AND -0.0 from 0.0 (the two red classes of r3 were
        # exactly these). The old _canon collapsed integral floats to
        # int strings and lost the zero sign, so both classes passed
        # locally and failed on the driver. repr() preserves full float
        # identity: "9.0" != "9", and repr(-0.0) == "-0.0".
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = run_duckdb(ORACLE[name], sf_dir)

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    s_set = _rowset([c.lower() for c in scols], srows)
    o_set = _rowset([c.lower() for c in ocols], orows)
    if s_set != o_set:
        diff_s = [r for r in s_set if r not in set(o_set)][:5]
        diff_o = [r for r in o_set if r not in set(s_set)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_s}\n oracle-only: {diff_o}"
        )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_smoke(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) >= 1
