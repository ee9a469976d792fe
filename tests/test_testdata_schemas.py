"""Testdata drift detector (snapshot of the round-3 generation).

Round-2 lesson: the driver regenerates /root/testdata between rounds
and has already changed a physical type (events.ts) - which silently
broke 13 correctness rows and the bench. This test snapshots every
table's logical schema so regeneration drift fails ONE obvious test
with a message pointing at the cause, instead of surfacing as dozens
of cryptic per-query failures.

If this test fails at the start of a round: the testdata changed.
Update the snapshot below AND audit every query touching the changed
columns (dtype-dispatch where physical types vary - see
driver_queries.normalize_event_ts).
"""

from __future__ import annotations

import pytest

# table -> {column: simpleString type}. events.ts is checked separately
# (its PHYSICAL type is allowed to vary; normalize_event_ts dispatches).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_testdata_schema_unchanged(spark, sf_dir, name):
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if name == "events":
        ts = got.pop("ts", None)
        assert ts in ("bigint", "timestamp", "timestamp_ntz"), (
            f"events.ts read as {ts!r} - a NEW physical vintage; extend "
            "driver_queries.normalize_event_ts"
        )
    missing = {k: v for k, v in EXPECTED[name].items() if got.get(k) != v}
    extra = sorted(set(got) - set(EXPECTED[name]))
    assert not missing, (
        f"TESTDATA DRIFT in {name}: expected column types {missing} but "
        f"read {({k: got.get(k) for k in missing})}. The driver likely "
        "regenerated /root/testdata - audit queries touching these "
        "columns, then update tests/test_testdata_schemas.py"
    )
    # new columns are fine (informational only)
    if extra:
        print(f"note: {name} has new columns {extra}")
