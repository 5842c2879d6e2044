"""Golden-fixture SCD2 suite — reproduces the reference's test strategy
(``src/data_curation/tests/create_test_data.py:125-305`` /
``test_pyspark_functions.py:107-130``): tiny 3-key dataset, one full load
+ three CDC batches including a LATE-ARRIVING update that must splice
between already-applied rows, with hand-written expected tables after
every step. Comparison mirrors ``tests/compare_df.py:5-29``: sort columns
lexicographically, sort rows by (pk, extraction_timestamp), compare
values ignoring dtype width.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from iceberg_evaluation_spark.operators.scd2 import (
    bulk_insert,
    scd2_complex,
    scd2_simple,
)
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

TS = lambda s: datetime.fromisoformat(s)  # noqa: E731
SENT = TS("2250-01-01 00:00:00")
SCHEMA = "pk string, quantity int, extraction_timestamp timestamp, op string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _actual(table):
    rows = table.read().collect()
    return sorted(
        (
            r["pk"],
            r["quantity"],
            r["extraction_timestamp"],
            r["start_datetime"],
            r["end_datetime"],
            r["is_current"],
        )
        for r in rows
    )


@pytest.fixture()
def fixture_batches(spark):
    full_load = _df(
        spark,
        [("A", 1, TS("2022-01-01 00:00:00"), None), ("B", 1, TS("2022-01-01 00:00:00"), None)],
    )
    cdc_1 = _df(spark, [("A", 3, TS("2022-03-01 00:00:00"), "U")])
    cdc_2 = _df(spark, [("C", 4, TS("2022-04-01 00:00:00"), "I")])
    cdc_3 = _df(spark, [("A", 2, TS("2022-02-01 00:00:00"), "U")])  # late arrival
    return full_load, cdc_1, cdc_2, cdc_3


EXPECTED_BULK = sorted(
    [
        ("A", 1, TS("2022-01-01"), TS("2022-01-01"), SENT, True),
        ("B", 1, TS("2022-01-01"), TS("2022-01-01"), SENT, True),
    ]
)
EXPECTED_U1 = sorted(
    [
        ("A", 1, TS("2022-01-01"), TS("2022-01-01"), TS("2022-03-01"), False),
        ("A", 3, TS("2022-03-01"), TS("2022-03-01"), SENT, True),
        ("B", 1, TS("2022-01-01"), TS("2022-01-01"), SENT, True),
    ]
)
EXPECTED_U2 = sorted(
    EXPECTED_U1 + [("C", 4, TS("2022-04-01"), TS("2022-04-01"), SENT, True)]
)
EXPECTED_U3 = sorted(
    [
        ("A", 1, TS("2022-01-01"), TS("2022-01-01"), TS("2022-02-01"), False),
        ("A", 2, TS("2022-02-01"), TS("2022-02-01"), TS("2022-03-01"), False),
        ("A", 3, TS("2022-03-01"), TS("2022-03-01"), SENT, True),
        ("B", 1, TS("2022-01-01"), TS("2022-01-01"), SENT, True),
        ("C", 4, TS("2022-04-01"), TS("2022-04-01"), SENT, True),
    ]
)


def test_scd2_simple_pipeline(spark, tmp_path, fixture_batches):
    full_load, cdc_1, cdc_2, cdc_3 = fixture_batches
    table = SnapshotTable(spark, str(tmp_path / "t"))

    bulk_insert(table, full_load)
    assert _actual(table) == EXPECTED_BULK

    scd2_simple(table, cdc_1)
    assert _actual(table) == EXPECTED_U1

    scd2_simple(table, cdc_2)
    assert _actual(table) == EXPECTED_U2

    # late arrival needs the complex (re-windowing) path
    scd2_complex(table, cdc_3)
    assert _actual(table) == EXPECTED_U3


def test_scd2_complex_handles_all_batches(spark, tmp_path, fixture_batches):
    """scd2_complex must be a superset of scd2_simple (in-order batches too)."""
    full_load, cdc_1, cdc_2, cdc_3 = fixture_batches
    table = SnapshotTable(spark, str(tmp_path / "t"))
    bulk_insert(table, full_load)
    scd2_complex(table, cdc_1)
    assert _actual(table) == EXPECTED_U1
    scd2_complex(table, cdc_2)
    assert _actual(table) == EXPECTED_U2
    scd2_complex(table, cdc_3)
    assert _actual(table) == EXPECTED_U3


def test_scd2_complex_multi_update_single_batch(spark, tmp_path, fixture_batches):
    """Multiple updates for one key in a single batch slice correctly."""
    full_load, *_ = fixture_batches
    table = SnapshotTable(spark, str(tmp_path / "t"))
    bulk_insert(table, full_load)
    batch = _df(
        spark,
        [
            ("A", 5, TS("2022-02-01 00:00:00"), "U"),
            ("A", 6, TS("2022-03-01 00:00:00"), "U"),
        ],
    )
    scd2_complex(table, batch)
    assert _actual(table) == sorted(
        [
            ("A", 1, TS("2022-01-01"), TS("2022-01-01"), TS("2022-02-01"), False),
            ("A", 5, TS("2022-02-01"), TS("2022-02-01"), TS("2022-03-01"), False),
            ("A", 6, TS("2022-03-01"), TS("2022-03-01"), SENT, True),
            ("B", 1, TS("2022-01-01"), TS("2022-01-01"), SENT, True),
        ]
    )


def test_scd2_idempotent_reapply(spark, tmp_path, fixture_batches):
    """Re-applying the same batch must not duplicate or corrupt rows
    (merge key (pk, ts) guarantees idempotence — SURVEY §7 hard-point 1)."""
    full_load, cdc_1, *_ = fixture_batches
    table = SnapshotTable(spark, str(tmp_path / "t"))
    bulk_insert(table, full_load)
    scd2_complex(table, cdc_1)
    scd2_complex(table, cdc_1)
    assert _actual(table) == EXPECTED_U1


def test_scd2_complex_composite_keys(spark, tmp_path):
    # schema-generic keys: SCD2 over a 2-column business key, including a
    # late arrival for one composite key — the other key's history must
    # be untouched by the re-windowing
    schema = "region string, code int, qty int, extraction_timestamp timestamp, op string"
    table = SnapshotTable(spark, str(tmp_path / "ck"))
    full = spark.createDataFrame(
        [
            ("eu", 1, 10, TS("2022-01-01 00:00:00"), None),
            ("eu", 2, 20, TS("2022-01-01 00:00:00"), None),
            ("us", 1, 30, TS("2022-01-01 00:00:00"), None),
        ],
        schema,
    )
    keys = ["region", "code"]
    bulk_insert(table, full)
    scd2_complex(
        table,
        spark.createDataFrame([("eu", 1, 11, TS("2022-03-01 00:00:00"), "U")], schema),
        keys=keys,
    )
    scd2_complex(  # late arrival for (eu, 1) only
        table,
        spark.createDataFrame([("eu", 1, 12, TS("2022-02-01 00:00:00"), "U")], schema),
        keys=keys,
    )
    rows = sorted(
        (r["region"], r["code"], r["qty"], r["start_datetime"], r["end_datetime"], r["is_current"])
        for r in table.read().collect()
    )
    assert rows == sorted(
        [
            ("eu", 1, 10, TS("2022-01-01"), TS("2022-02-01"), False),
            ("eu", 1, 12, TS("2022-02-01"), TS("2022-03-01"), False),
            ("eu", 1, 11, TS("2022-03-01"), SENT, True),
            ("eu", 2, 20, TS("2022-01-01"), SENT, True),
            ("us", 1, 30, TS("2022-01-01"), SENT, True),
        ]
    )
