"""Hidden partitioning end-to-end on SnapshotTable: transform dirs in
the layout, source-column predicates pruning through the transform,
spec evolution across eras, and exactness of pruned reads."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row, functions as F

from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable
from iceberg_evaluation_spark.tables.transforms import parse_spec


def _events(spark, n=400, days=10, users=20):
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            ts=base + dt.timedelta(hours=(i * 7) % (days * 24), minutes=i % 60),
            user_id=i % users,
            value=float(i) / 3.0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def _dir_segments(table):
    segs = set()
    snap = table._read_snapshot(table.current_version())
    for rel in snap["files"]:
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                segs.add(seg.split("=")[0])
    return segs


def test_transform_layout_and_schema(spark, table):
    df = _events(spark)
    table.create_or_replace(df, partition_by=["days(ts)", "bucket(4, user_id)"])
    assert _dir_segments(table) == {"ts_day", "user_id_bucket4"}
    out = table.read()
    # derived dir columns never leak into the table schema
    assert set(out.columns) == {"event_id", "ts", "user_id", "value"}
    assert out.count() == 400
    # round-trip content equality
    assert out.exceptAll(df).count() == 0 and df.exceptAll(out).count() == 0


def test_prune_through_days_transform(spark, table):
    df = _events(spark, days=10)
    table.create_or_replace(df, partition_by=["days(ts)"])
    total = len(table._read_snapshot(table.current_version())["files"])
    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 4, 23, 59, 59)
    kept = table.pruned_files([("ts", "between", (lo, hi))])
    assert 0 < len(kept) < total
    # only day-3 and day-4 dirs survive
    for rel in kept:
        day = int([s for s in rel.split(os.sep) if s.startswith("ts_day=")][0][7:])
        assert day in (
            parse_spec("days(ts)").eval_literal(lo, "timestamp"),
            parse_spec("days(ts)").eval_literal(hi, "timestamp"),
        )
    # pruned read == full filter read, exactly
    got = table.read_where([("ts", "between", (lo, hi))])
    want = table.read().filter(F.col("ts").between(lo, hi))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_prune_through_bucket_transform(spark, table):
    df = _events(spark, users=20)
    table.create_or_replace(df, partition_by=["bucket(4, user_id)"])
    total = len(table._read_snapshot(table.current_version())["files"])
    kept = table.pruned_files([("user_id", "=", 7)])
    assert 0 < len(kept) < total
    want_bucket = parse_spec("bucket(4, user_id)").eval_literal(7, "bigint")
    for rel in kept:
        b = int(
            [s for s in rel.split(os.sep) if s.startswith("user_id_bucket4=")][0]
            .split("=")[1]
        )
        assert b == want_bucket
    got = table.read_where([("user_id", "=", 7)]).agg(
        F.count("*").alias("n"), F.countDistinct("user_id").alias("u")
    ).collect()[0]
    assert got["n"] == 20 and got["u"] == 1
    # range predicates never prune through a bucket (order not preserved)
    assert len(table.pruned_files([("user_id", ">", 0)])) == total


def test_prune_composes_with_footer_stats(spark, table):
    """An hours-level predicate inside one day: the day dir keeps the
    file, the raw-column footer stats on ts still prune within it."""
    df = _events(spark, days=4)
    table.create_or_replace(df, partitions=8, partition_by=["days(ts)"])
    lo, hi = dt.datetime(2024, 1, 2, 0, 0), dt.datetime(2024, 1, 2, 2, 0)
    got = table.read_where([("ts", "between", (lo, hi))])
    want = table.read().filter(F.col("ts").between(lo, hi))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_spec_evolution_identity_to_transform(spark, table):
    """Files from the identity era keep pruning by their own layout;
    new writes land under the transform; both eras read as one table."""
    df = _events(spark)
    old = df.filter(F.col("event_id") < 200).withColumn(
        "uid_mod", (F.col("user_id") % 2).cast("int")
    )
    new = df.filter(F.col("event_id") >= 200).withColumn(
        "uid_mod", (F.col("user_id") % 2).cast("int")
    )
    table.create_or_replace(old, partition_by=["uid_mod"])
    table.set_partition_spec(["days(ts)"])
    table.append(new)
    segs = _dir_segments(table)
    assert "uid_mod" in segs and "ts_day" in segs
    assert table.read().count() == 400
    # a ts predicate prunes only the new-era files; old-era files stay
    lo = dt.datetime(2024, 1, 9)
    kept = set(table.pruned_files([("ts", ">=", lo)]))
    snap = table._read_snapshot(table.current_version())
    old_era = {r for r in snap["files"] if "uid_mod=" in r}
    assert old_era <= kept  # conservative: identity-era files all kept
    # correctness across the mixed layout
    got = table.read_where([("ts", ">=", lo)])
    want = table.read().filter(F.col("ts") >= lo)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # compact migrates everything to the current spec
    table.compact()
    segs2 = _dir_segments(table)
    assert "ts_day" in segs2 and "uid_mod" not in segs2
    assert table.read().count() == 400


def test_null_source_goes_to_default_partition_and_prunes(spark, table):
    rows = [
        Row(k=1, ts=dt.datetime(2024, 1, 1, 5)),
        Row(k=2, ts=None),
        Row(k=3, ts=dt.datetime(2024, 1, 5, 5)),
    ]
    df = spark.createDataFrame(rows)
    table.create_or_replace(df, partition_by=["days(ts)"])
    assert table.read().count() == 3
    assert table.read().filter(F.col("ts").isNull()).count() == 1
    kept = table.pruned_files([("ts", ">=", dt.datetime(2024, 1, 4))])
    # the null-partition file is provably disjoint from any ts predicate
    assert all("__HIVE_DEFAULT_PARTITION__" not in r for r in kept)
    assert len(kept) == 1


def test_merge_and_delete_preserve_transform_layout(spark, table):
    df = _events(spark, n=100, days=5)
    table.create_or_replace(df, partition_by=["days(ts)"])
    table.delete_keys(
        spark.createDataFrame([Row(event_id=i) for i in range(0, 100, 10)]),
        on=["event_id"],
    )
    assert table.read().count() == 90
    assert table.read().filter(F.col("event_id") % 10 == 0).count() == 0
    # COW rewrite landed under the transform layout again
    assert "ts_day" in _dir_segments(table)
    lo = dt.datetime(2024, 1, 3)
    got = table.read_where([("ts", ">=", lo)])
    want = table.read().filter(F.col("ts") >= lo)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_guards(spark, table):
    df = _events(spark, n=50)
    with pytest.raises(ValueError, match="not in frame"):
        table.create_or_replace(df, partition_by=["days(nope)"])
    with pytest.raises(ValueError, match="unknown partition transform"):
        table.create_or_replace(df, partition_by=["frobnicate(ts)"])
    table.create_or_replace(df, partition_by=["days(ts)"])
    with pytest.raises(ValueError, match="collides"):
        table.add_column("ts_day", "int")
    with pytest.raises(ValueError, match="transform-source"):
        table.drop_column("ts")
    # collision check on set_partition_spec: a schema column named like
    # a would-be dir column blocks the spec
    table2 = SnapshotTable(spark, table.root + "_2")
    table2.create_or_replace(df.withColumn("ts_day", F.lit(1)))
    with pytest.raises(ValueError, match="collide"):
        table2.set_partition_spec(["days(ts)"])
