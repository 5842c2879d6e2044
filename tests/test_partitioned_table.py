"""Identity-partitioned snapshot tables: directory layout, manifest
partition pruning, and interop with append/merge/compact/evolution.

The reference's tables are partitioned on a date key
(``utils/metadata/store_sales.json:105-107``); this is the snapshot
layer's equivalent of Iceberg identity partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_evaluation_spark.tables.snapshot_table import (
    MergeClause,
    SnapshotTable,
)


def _rows(df):
    return sorted(
        map(tuple, df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


BASE = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40), (5, None, 50)]


def _mk(spark, tmp_path, name="t"):
    t = SnapshotTable(spark, str(tmp_path / name))
    df = spark.createDataFrame(BASE, "id bigint, k string, v bigint")
    t.create_or_replace(df, partitions=2, partition_by=["k"])
    return t


def test_partitioned_roundtrip_and_layout(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert _rows(t.read()) == _rows(
        spark.createDataFrame(BASE, "id bigint, k string, v bigint")
    )
    assert t.read().columns == ["id", "k", "v"]  # declared order restored
    snap = t._read_snapshot(t.current_version())
    assert snap["partition_by"] == ["k"]
    assert all("k=" in rel for rel in snap["files"])


def test_partition_pruning_via_read_where(spark, tmp_path):
    t = _mk(spark, tmp_path)
    out = t.read_where([("k", "=", "a")])
    assert _rows(out) == [(1, "a", 10), (2, "a", 20)]
    # manifest pruning actually restricted the scan to the k=a directory
    scanned = out.inputFiles()
    assert scanned and all("k=a" in f for f in scanned)
    # range op over the partition value
    assert _rows(t.read_where([("k", ">=", "b")])) == [(3, "b", 30), (4, "c", 40)]


def test_partitioned_append_keeps_layout(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(6, "b", 60)], "id bigint, k string, v bigint"))
    snap = t._read_snapshot(t.current_version())
    assert all("k=" in rel for rel in snap["files"])
    assert (6, "b", 60) in _rows(t.read())


def test_partitioned_merge_both_modes_then_compact(spark, tmp_path):
    exp = {(1, "a", 11), (2, "a", 20), (3, "b", 30), (4, "c", 40), (5, None, 50),
           (7, "d", 70)}
    for mode in ("copy-on-write", "merge-on-read"):
        t = _mk(spark, tmp_path, name=f"t_{mode[:3]}")
        src = spark.createDataFrame(
            [(1, "a", 11), (7, "d", 70)], "id bigint, k string, v bigint"
        )
        t.merge(src, on=["id"], clause=MergeClause(matched_update={"v": "s.v"}),
                mode=mode)
        got = set(map(tuple, t.read().collect()))
        assert got == exp, mode
        # pruned scan with LIVE deletes (pre-compaction): partition
        # pruning must compose with the equality-delete anti join
        assert _rows(t.read_where([("k", "=", "a")])) == [
            (1, "a", 11), (2, "a", 20)
        ], mode
        # merge deltas are unpartitioned; binpack restores the layout
        t.compact(target_files=2)
        snap = t._read_snapshot(t.current_version())
        assert all("k=" in rel for rel in snap["files"])
        assert snap["delete_files"] == []
        assert set(map(tuple, t.read().collect())) == exp, mode
        # pruning still exact after the mixed-layout episode
        assert _rows(t.read_where([("k", "=", "d")])) == [(7, "d", 70)]


def test_partition_column_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError):
        t.drop_column("k")
    with pytest.raises(ValueError):
        t.compact(strategy="zorder", zorder_by=["v"])
    with pytest.raises(ValueError):
        SnapshotTable(spark, str(tmp_path / "x")).create_or_replace(
            spark.createDataFrame([(1,)], "id bigint"), partition_by=["nope"]
        )


def test_partitioned_schema_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("extra", "bigint")
    t.append(
        spark.createDataFrame([(8, "a", 80, 800)],
                              "id bigint, k string, v bigint, extra bigint")
    )
    rows = {r["id"]: r["extra"] for r in t.read().collect()}
    assert rows[8] == 800 and rows[1] is None
    assert _rows(t.read_where([("k", "=", "a"), ("extra", ">=", 1)])) == [
        (8, "a", 80, 800)
    ]


def test_null_partition_value_roundtrip_and_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # the NULL-k row survives the directory roundtrip...
    assert (5, None, 50) in _rows(t.read())
    # ...and equality pruning never returns it (NULL matches no value)
    assert all(r["k"] == "a" for r in t.read_where([("k", "=", "a")]).collect())


def test_partition_values_with_special_chars(spark, tmp_path):
    """Spark percent-escapes partition dir names (' ' → %20): pruning
    must compare the UNESCAPED value or such files are wrongly pruned."""
    t = SnapshotTable(spark, str(tmp_path / "esc"))
    df = spark.createDataFrame(
        [(1, "a b", 10), (2, "x=y", 20), (3, "plain", 30)],
        "id bigint, k string, v bigint",
    )
    t.create_or_replace(df, partitions=1, partition_by=["k"])
    assert _rows(t.read()) == _rows(df)
    assert _rows(t.read_where([("k", "=", "a b")])) == [(1, "a b", 10)]
    assert _rows(t.read_where([("k", "=", "x=y")])) == [(2, "x=y", 20)]
