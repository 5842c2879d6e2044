"""Early-warning contract on the driver-generated testdata schemas.

The driver REGENERATES /root/testdata between rounds and has already
changed column types once (events.ts: TIMESTAMP(NANOS) in round 1 →
timestamp[us] in round 2), which silently broke 13 queries until the
driver's own bench surfaced it. This test pins the schema every reader
assumes, with an explicit allowance for the layouts load_table knows how
to normalize — drift outside that set fails HERE, at suite time, instead
of in the driver's correctness gate."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.01")

EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]"},
    },
    "events": {
        "event_id": {"int64"},
        # the layouts load_table normalizes (see sources/readers.py)
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_schema_contract(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    exp = EXPECTED[table]
    assert set(got) == set(exp), (
        f"{table}: column set drifted — got {sorted(got)}, expected {sorted(exp)}; "
        "the driver regenerated testdata with a new layout: update the readers "
        "AND this contract"
    )
    for col, allowed in exp.items():
        assert got[col] in allowed, (
            f"{table}.{col} type drifted to {got[col]!r} (allowed: {sorted(allowed)}); "
            "teach sources/readers.py to normalize it, then extend this contract"
        )
