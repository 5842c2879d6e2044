"""Manifest-embedded file stats: min/max bounds are written once at
commit time (Iceberg manifest model) and pruning reads the manifest,
not O(files) parquet footers per query."""

from __future__ import annotations

import datetime as dt
import decimal

import pyarrow.parquet as pq_mod
import pytest
from pyspark.sql import Row, functions as F

from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [
            Row(
                k=i,
                ts=dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
                d=dt.date(2024, 1, 1) + dt.timedelta(days=i % 7),
                s=f"name-{i:04d}",
                v=float(i) * 1.5,
            )
            for i in range(lo, hi)
        ]
    )


def test_commit_records_stats_for_every_file(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, 0, 100), partitions=4)
    snap = t._read_snapshot(t.current_version())
    stats = snap["file_stats"]
    assert set(stats) == set(snap["files"])
    for rel, entry in stats.items():
        assert entry["#rows"] > 0 and entry["#bytes"] > 0
        for col in ("k", "ts", "d", "s", "v"):
            assert col in entry, (rel, col)
    # typed decode round-trips
    entry = next(iter(stats.values()))
    mn, mx = SnapshotTable._decode_stat(entry["ts"])
    assert isinstance(mn, dt.datetime) and mn.tzinfo is None and mn <= mx
    mn, mx = SnapshotTable._decode_stat(entry["d"])
    assert isinstance(mn, dt.date) and mn <= mx
    mn, mx = SnapshotTable._decode_stat(entry["k"])
    assert isinstance(mn, int) and mn <= mx


def test_append_inherits_stats_without_rereading(spark, tmp_path, monkeypatch):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, 0, 50), partitions=2)
    v1_files = set(t._read_snapshot(t.current_version())["files"])

    seen: list[str] = []
    real = pq_mod.read_metadata

    def spying(path, *a, **kw):
        seen.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(pq_mod, "read_metadata", spying)
    t.append(_df(spark, 50, 80))
    snap = t._read_snapshot(t.current_version())
    assert set(snap["file_stats"]) == set(snap["files"])
    # only the NEW files' footers were opened during the commit
    reread_old = [p for p in seen if any(p.endswith(r) for r in v1_files)]
    assert reread_old == []


def test_pruning_runs_without_footer_io(spark, tmp_path, monkeypatch):
    """On a stats-carrying table, pruned_files + files_metadata never
    open a footer — the manifest is the whole metadata plane."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, 0, 200), partitions=8)
    t.append(_df(spark, 200, 300))

    def boom(*a, **kw):
        raise AssertionError("footer read during manifest-stats prune")

    monkeypatch.setattr(pq_mod, "read_metadata", boom)
    total = len(t._read_snapshot(t.current_version())["files"])
    kept = t.pruned_files([("k", "between", (10, 20))])
    assert 0 < len(kept) < total
    kept_ts = t.pruned_files(
        [("ts", ">=", dt.datetime(2024, 1, 9))]
    )
    assert 0 < len(kept_ts) < total
    fm = t.files_metadata()
    assert fm.agg(F.sum("record_count")).collect()[0][0] == 300


def test_pruned_read_still_exact_on_stats_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, 0, 200), partitions=8)
    got = t.read_where([("ts", "between",
                         (dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 5)))])
    want = t.read().filter(
        F.col("ts").between(dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 5))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_legacy_snapshot_without_stats_falls_back(spark, tmp_path):
    """A pre-upgrade manifest (no file_stats key) still prunes via the
    per-query footer path."""
    import json, os

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, 0, 100).repartitionByRange(4, "k"))
    v = t.current_version()
    p = t._snapshot_path(v)
    snap = json.load(open(p))
    del snap["file_stats"]
    os.remove(p)
    json.dump(snap, open(p, "w"))
    total = len(snap["files"])
    kept = t.pruned_files([("k", "<=", 10)])
    assert 0 < len(kept) < total
    got = t.read_where([("k", "<=", 10)]).count()
    assert got == 11


def test_decimal_stats_roundtrip(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k=i, m=decimal.Decimal(f"{i}.25")) for i in range(20)],
        schema="k int, m decimal(12,2)",
    )
    t.create_or_replace(df, partitions=2)
    entry = next(iter(t._read_snapshot(t.current_version())["file_stats"].values()))
    if "m" in entry:  # decimal stats present on this build of arrow
        mn, mx = SnapshotTable._decode_stat(entry["m"])
        assert isinstance(mn, decimal.Decimal) and mn <= mx
    kept = t.pruned_files([("m", ">=", decimal.Decimal("15.00"))])
    assert 0 < len(kept) <= len(t._read_snapshot(t.current_version())["files"])


def test_sort_compaction_clusters_for_pruning(spark, tmp_path):
    """compact(strategy='sort') gives files disjoint key ranges, so a
    range predicate prunes to O(1) files where the scattered layout
    kept nearly all of them."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, 0, 400), partitions=8)  # k scattered
    filt = [("k", "between", (100, 140))]
    before = len(t.pruned_files(filt))
    t.compact(strategy="sort", sort_by=["k"], target_files=8)
    snap = t._read_snapshot(t.current_version())
    assert len(snap["files"]) == 8
    after = len(t.pruned_files(filt))
    assert after < before and after <= 2
    got = t.read_where(filt).count()
    assert got == 41
    # guards
    with pytest.raises(ValueError, match="requires sort_by"):
        t.compact(strategy="sort")
    t2 = SnapshotTable(spark, str(tmp_path / "p"))
    t2.create_or_replace(
        _df(spark, 0, 50).withColumn("m", F.col("k") % 3), partition_by=["m"]
    )
    with pytest.raises(ValueError, match="not supported"):
        t2.compact(strategy="sort", sort_by=["k"])


def test_count_rows_matches_scan_count_everywhere(spark, tmp_path):
    """count_rows serves exact counts from manifest #rows stats (zero
    Spark jobs on the stats path) and MUST equal read().count() across
    every table shape: plain, partitioned, appended, merge-on-read
    deleted (fallback — raw per-file sums would overcount), compacted,
    and stats-missing (fallback)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create_or_replace(_df(spark, 0, 100), partitions=4)
    assert t.count_rows() == t.read().count() == 100

    t.append(_df(spark, 100, 130))
    assert t.count_rows() == t.read().count() == 130
    assert t.count_rows(version=1) == 100  # versioned

    # merge-on-read delete: live equality-deletes force the scan path
    victims = _df(spark, 0, 10).select("k")
    n = t.delete_keys(victims, on=["k"], mode="merge-on-read")
    assert n == 10
    snap = t._read_snapshot(t.current_version())
    assert snap["delete_files"], "precondition: live MOR deletes"
    assert t.count_rows() == t.read().count() == 120

    # compaction materializes the deletes: stats path again
    t.compact(target_files=2)
    snap = t._read_snapshot(t.current_version())
    assert not snap.get("delete_files")
    assert t.count_rows() == t.read().count() == 120

    # partitioned layout
    p = SnapshotTable(spark, str(tmp_path / "p"))
    p.create_or_replace(
        _df(spark, 0, 60).withColumn("m", F.col("k") % 3), partition_by=["m"]
    )
    assert p.count_rows() == p.read().count() == 60

    # a file with no stats entry forces the scan fallback
    snap = p._read_snapshot(p.current_version())
    rel = snap["files"][0]
    del snap["file_stats"][rel]
    import json as _json

    with open(p._snapshot_path(p.current_version()), "w") as f:
        _json.dump(snap, f)
    assert p.count_rows() == p.read().count() == 60
