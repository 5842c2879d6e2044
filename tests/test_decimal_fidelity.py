"""Decimal money semantics (SURVEY §2 "genuinely hard" #2): DecimalType
columns must survive the table layer byte-exact — bulk insert, merge
rewrite, compaction, and time travel must neither widen, narrow, nor
drift decimal(7,2) values."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from iceberg_evaluation_spark.operators.scd2 import bulk_insert, scd2_complex
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def test_decimal_columns_roundtrip_table_layer(spark, tmp_path):
    from datetime import datetime

    schema = StructType(
        [
            StructField("pk", LongType()),
            StructField("extraction_timestamp", TimestampType()),
            StructField("price", DecimalType(7, 2)),
        ]
    )
    rows = [
        (1, datetime(2024, 1, 1), Decimal("99999.99")),
        (2, datetime(2024, 1, 1), Decimal("0.01")),
        (3, datetime(2024, 1, 1), Decimal("-12345.67")),
    ]
    t = SnapshotTable(spark, str(tmp_path / "dec"))
    bulk_insert(t, spark.createDataFrame(rows, schema))
    upd = spark.createDataFrame(
        [(1, datetime(2024, 2, 1), Decimal("88888.88"))], schema
    )
    scd2_complex(t, upd)
    t.compact()

    out = t.read()
    assert out.schema["price"].dataType == DecimalType(7, 2)
    got = {
        (r["pk"], r["price"], r["is_current"]) for r in out.collect()
    }
    assert (1, Decimal("99999.99"), False) in got
    assert (1, Decimal("88888.88"), True) in got
    assert (2, Decimal("0.01"), True) in got
    assert (3, Decimal("-12345.67"), True) in got
    # time travel to v1 sees the original decimal exactly
    v1 = {r["pk"]: r["price"] for r in t.read(version=1).collect()}
    assert v1[1] == Decimal("99999.99")
