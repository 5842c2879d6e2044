"""Hidden-partitioning transforms: byte-exact parity between the
JVM-side write expressions and the driver-side literal evaluation —
the soundness condition for pruning through a transform. A single
mismatch means a file could be pruned that holds matching rows."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_evaluation_spark.tables.transforms import (
    PartitionField,
    dir_field_for,
    parse_spec,
    spark_hash32,
)

SET = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# murmur3 mirror vs F.hash — the bucket transform's soundness
# ---------------------------------------------------------------------------
def _jvm_hashes(spark, values, dtype):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {dtype}")
    return [r[0] for r in df.select(F.hash("v")).collect()]


@given(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=50))
@SET
def test_hash_parity_int(spark, vals):
    assert _jvm_hashes(spark, vals, "int") == [
        spark_hash32(v, "int") for v in vals
    ]


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=50))
@SET
def test_hash_parity_bigint(spark, vals):
    assert _jvm_hashes(spark, vals, "bigint") == [
        spark_hash32(v, "bigint") for v in vals
    ]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=24
        ),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_hash_parity_string(spark, vals):
    assert _jvm_hashes(spark, vals, "string") == [
        spark_hash32(v, "string") for v in vals
    ]


def test_hash_parity_date_and_timestamp(spark):
    dates = [dt.date(1969, 12, 31), dt.date(1970, 1, 1), dt.date(2024, 2, 29)]
    assert _jvm_hashes(spark, dates, "date") == [
        spark_hash32(v, "date") for v in dates
    ]
    tss = [
        dt.datetime(1969, 7, 20, 20, 17, 40, 123456),
        dt.datetime(1970, 1, 1),
        dt.datetime(2024, 1, 15, 23, 59, 59, 999999),
    ]
    assert _jvm_hashes(spark, tss, "timestamp") == [
        spark_hash32(v, "timestamp") for v in tss
    ]


# ---------------------------------------------------------------------------
# expr vs eval_literal parity per transform
# ---------------------------------------------------------------------------
def _expr_values(spark, field, values, dtype):
    df = spark.createDataFrame([(v,) for v in values], schema=f"{field.source} {dtype}")
    return [r[0] for r in df.select(field.expr(dtype)).collect()]


_TS = st.datetimes(
    min_value=dt.datetime(1965, 1, 1), max_value=dt.datetime(2100, 1, 1)
)


@pytest.mark.parametrize("spec", ["days(ts)", "hours(ts)", "months(ts)", "years(ts)"])
def test_time_transform_parity_timestamp(spark, spec):
    field = parse_spec(spec)
    vals = [
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),  # floor, not trunc
        dt.datetime(1970, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 10, 0, 0, 0),
        dt.datetime(2024, 12, 31, 23, 0, 0, 1),
        dt.datetime(2038, 6, 15, 12, 30, 45, 500000),
    ]
    assert _expr_values(spark, field, vals, "timestamp") == [
        field.eval_literal(v, "timestamp") for v in vals
    ]


@given(st.lists(_TS, min_size=1, max_size=30))
@SET
def test_time_transform_parity_property(spark, vals):
    for spec in ("days(ts)", "hours(ts)", "months(ts)"):
        field = parse_spec(spec)
        assert _expr_values(spark, field, vals, "timestamp") == [
            field.eval_literal(v, "timestamp") for v in vals
        ]


@pytest.mark.parametrize("spec", ["days(d)", "months(d)", "years(d)"])
def test_time_transform_parity_date(spark, spec):
    field = parse_spec(spec)
    vals = [dt.date(1969, 3, 1), dt.date(1970, 1, 1), dt.date(2024, 2, 29)]
    assert _expr_values(spark, field, vals, "date") == [
        field.eval_literal(v, "date") for v in vals
    ]


@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=30))
@SET
def test_truncate_parity_int(spark, vals):
    field = parse_spec("truncate(10, v)")
    assert _expr_values(spark, field, vals, "bigint") == [
        field.eval_literal(v, "bigint") for v in vals
    ]


def test_truncate_parity_string(spark):
    field = parse_spec("truncate(3, v)")
    vals = ["", "ab", "abcdef", "héllo", "日本語テスト"]
    assert _expr_values(spark, field, vals, "string") == [
        field.eval_literal(v, "string") for v in vals
    ]


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=30))
@SET
def test_bucket_parity_bigint(spark, vals):
    field = parse_spec("bucket(16, v)")
    got = _expr_values(spark, field, vals, "bigint")
    assert got == [field.eval_literal(v, "bigint") for v in vals]
    assert all(0 <= b < 16 for b in got)


# ---------------------------------------------------------------------------
# spec grammar + dir naming round trip
# ---------------------------------------------------------------------------
def test_parse_and_dir_names():
    cases = {
        "ts": ("identity", "ts"),
        "days(ts)": ("days", "ts_day"),
        "day(ts)": ("days", "ts_day"),
        "hours(ts)": ("hours", "ts_hour"),
        "months(ts)": ("months", "ts_month"),
        "years(ts)": ("years", "ts_year"),
        "bucket(16, id)": ("bucket", "id_bucket16"),
        "truncate(4, name)": ("truncate", "name_trunc4"),
    }
    for spec, (t, dirname) in cases.items():
        f = parse_spec(spec)
        assert (f.transform, f.dir_name) == (t, dirname), spec


def test_parse_rejects_garbage():
    for bad in ("bucket(0, id)", "frobnicate(ts)", "days()", "bucket(x, id)"):
        with pytest.raises(ValueError):
            parse_spec(bad)


def test_dir_field_roundtrip():
    for spec in ("days(ts)", "hours(ts)", "months(ts)", "years(ts)",
                 "bucket(8, uid)", "truncate(4, name)"):
        f = parse_spec(spec)
        back = dir_field_for(f.source, f.dir_name)
        assert back == f, spec
    assert dir_field_for("ts", "ts") is None  # identity: table's own path
    assert dir_field_for("ts", "other_day") is None
    assert dir_field_for("ts", "ts_daylight") is None


# ---------------------------------------------------------------------------
# predicate translation: conservative soundness on randomized data
# ---------------------------------------------------------------------------
@given(
    st.lists(_TS, min_size=2, max_size=40),
    st.sampled_from(["=", "<", "<=", ">", ">=", "between"]),
    st.data(),
)
@SET
def test_translation_never_drops_matches_days(spark, vals, op, data):
    """For every row r satisfying `src op val`, the file holding r
    (transform value t(r)) must be kept by file_may_match."""
    field = parse_spec("days(ts)")
    if op == "between":
        a = data.draw(_TS)
        b = data.draw(_TS)
        val = (min(a, b), max(a, b))
    else:
        val = data.draw(_TS)

    def row_matches(r):
        if op == "=":
            return r == val
        if op == "<":
            return r < val
        if op == "<=":
            return r <= val
        if op == ">":
            return r > val
        if op == ">=":
            return r >= val
        return val[0] <= r <= val[1]

    for r in vals:
        if row_matches(r):
            fv = field.eval_literal(r, "timestamp")
            assert field.file_may_match(fv, op, val, "timestamp"), (r, op, val)


@given(st.lists(st.integers(-(2**50), 2**50), min_size=2, max_size=40), st.data())
@SET
def test_translation_never_drops_matches_bucket(spark, vals, data):
    field = parse_spec("bucket(8, v)")
    val = data.draw(st.sampled_from(vals))
    for r in vals:
        if r == val:
            fv = field.eval_literal(r, "bigint")
            assert field.file_may_match(fv, "=", val, "bigint")
    # range ops never prune through a bucket
    assert field.file_may_match(3, "<", 100, "bigint")
    assert field.file_may_match(3, "between", (0, 1), "bigint")
