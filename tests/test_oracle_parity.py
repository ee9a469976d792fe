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
import re

import duckdb
import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


# ---------------------------------------------------------------------------
# dtype-level schema parity (round-4 lesson)
#
# The driver's value-hasher is dtype-aware: DuckDB HUGEINT (what a bare
# SUM(CASE ...) widens to) hashed apart from Spark BIGINT, and DECIMAL
# literals with engine-specific precision/scale hashed apart from DOUBLE,
# even though every VALUE was identical (the two CORRECTNESS_r04 reds).
# The old value-level _canon could not see either class because DuckDB's
# fetchall() hands HUGEINT back as Python int and DECIMAL as
# decimal.Decimal, both of which str() the same as the Spark value.
#
# So: map both engines' column types into one canonical family and assert
# per-column equality, and REJECT the two poison families outright -
# DECIMAL (force CAST ... AS DOUBLE on both sides) and HUGEINT/INT128
# (force CAST ... AS BIGINT in the oracle).
# ---------------------------------------------------------------------------

# Integer WIDTHS collapse into one family: the driver stringifies values
# before hashing, so int32 42 and int64 42 hash together - only the
# int/float/decimal FAMILY matters (9 vs 9.0 was the r3 red class).
_DUCK_CANON = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "FLOAT": "float32",
    "REAL": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIME": "time",
    "BLOB": "binary",
    "INTERVAL": "interval",
}

_SPARK_CANON = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "binary": "binary",
}


def _canon_duck_type(t: str) -> str:
    t = t.strip().upper()
    if t.startswith("DECIMAL") or t == "HUGEINT" or t == "UHUGEINT":
        raise AssertionError(
            f"oracle output column has driver-poison type {t}: CAST it - "
            "DECIMAL -> DOUBLE (bare numeric literals / AVG), "
            "HUGEINT -> BIGINT (bare SUM of ints)"
        )
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith(("STRUCT", "MAP")) or t.endswith("[]") or t.startswith("LIST"):
        raise AssertionError(
            f"oracle output column has collection type {t}: serialize with "
            "array_to_string/to_json on both engines (driver hasher)"
        )
    got = _DUCK_CANON.get(t)
    assert got is not None, f"unmapped DuckDB output type {t}"
    return got


def _canon_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("decimal"):
        raise AssertionError(
            f"Spark output column has driver-poison type {t}: "
            "CAST(... AS DOUBLE) - bare numeric literals parse as DECIMAL"
        )
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith(("array", "map", "struct")):
        raise AssertionError(
            f"Spark output column has collection type {t}: serialize with "
            "array_join/to_json on both engines (driver hasher)"
        )
    got = _SPARK_CANON.get(t)
    assert got is not None, f"unmapped Spark output type {t}"
    return got


def duckdb_output_types(con, sql: str) -> dict:
    """Column name -> DuckDB type string for a query, via DESCRIBE."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0].lower(): r[1] for r in rows}


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
    types = duckdb_output_types(con, sql)
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows, types


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    try:
        srows = [tuple(r) for r in sdf.collect()]
    finally:
        # queries may persist() multi-consumer intermediates; the
        # caller-must-clearCache contract (driver_queries docstring)
        # keeps a long-lived suite run from accumulating leaked blocks
        spark.catalog.clearCache()
    ocols, orows, otypes = run_duckdb(ORACLE[name], sf_dir)

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    # dtype-level schema parity: canonical type family must match per
    # column, and poison families (DECIMAL, HUGEINT, raw collections)
    # are rejected inside the canonicalizers with a fix hint.
    stypes = {f.name.lower(): f.dataType.simpleString() for f in sdf.schema.fields}
    for col in sorted(stypes):
        s_fam = _canon_spark_type(stypes[col])
        o_fam = _canon_duck_type(otypes[col])
        assert s_fam == o_fam, (
            f"{name}.{col}: dtype family mismatch "
            f"spark={stypes[col]}({s_fam}) oracle={otypes[col]}({o_fam}) - "
            "the driver hashes dtype-aware; CAST one side"
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
    try:
        n = sdf.count()
    finally:
        spark.catalog.clearCache()
    assert n >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) >= 1
