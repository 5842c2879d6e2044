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


def test_evolution_crossed_with_compact_and_mor(spark, tmp_path):
    """r5 verdict #8: add_column → MOR merge → compact → drop_column
    composed on one partitioned table — schema evolution crossed with
    the layout and delete-file machinery, with time travel at each era."""
    t = _mk(spark, tmp_path, name="evo")
    v_base = t.current_version()

    t.add_column("extra", "bigint")
    v_added = t.current_version()
    t.append(
        spark.createDataFrame(
            [(6, "b", 60, 600)], "id bigint, k string, v bigint, extra bigint"
        )
    )
    # MOR merge under the EVOLVED schema: updates leave equality-delete
    # files behind; pre-evolution rows still read extra as NULL
    t.merge(
        spark.createDataFrame(
            [(1, "a", 11, 100), (7, "d", 70, 700)],
            "id bigint, k string, v bigint, extra bigint",
        ),
        on=["id"],
        clause=MergeClause(matched_update={"v": "s.v", "extra": "s.extra"}),
        mode="merge-on-read",
    )
    exp_evolved = {
        (1, "a", 11, 100), (2, "a", 20, None), (3, "b", 30, None),
        (4, "c", 40, None), (5, None, 50, None), (6, "b", 60, 600),
        (7, "d", 70, 700),
    }
    assert set(map(tuple, t.read().collect())) == exp_evolved
    snap = t._read_snapshot(t.current_version())
    assert snap["delete_files"], "MOR merge must leave equality deletes"

    # compact materializes the deletes and restores the k= layout while
    # the evolved schema (with NULL backfills) survives the rewrite
    t.compact(target_files=2)
    snap = t._read_snapshot(t.current_version())
    assert snap["delete_files"] == []
    assert set(map(tuple, t.read().collect())) == exp_evolved
    assert _rows(t.read_where([("extra", ">=", 100)])) == [
        (1, "a", 11, 100), (6, "b", 60, 600), (7, "d", 70, 700)
    ]

    # second MOR merge AFTER the compaction, then drop the evolved column
    # with those deletes still live (delete keys are id, not extra)
    t.merge(
        spark.createDataFrame(
            [(2, "a", 21, 200)], "id bigint, k string, v bigint, extra bigint"
        ),
        on=["id"],
        clause=MergeClause(matched_update={"v": "s.v", "extra": "s.extra"}),
        mode="merge-on-read",
    )
    v_pre_drop = t.current_version()
    t.drop_column("extra")
    exp_final = {
        (1, "a", 11), (2, "a", 21), (3, "b", 30), (4, "c", 40),
        (5, None, 50), (6, "b", 60), (7, "d", 70),
    }
    assert set(map(tuple, t.read().collect())) == exp_final
    assert t.read().columns == ["id", "k", "v"]

    # time travel sees each schema era: base (no extra), evolved (extra
    # NULL), pre-drop (extra populated)
    assert t.read(version=v_base).columns == ["id", "k", "v"]
    assert set(map(tuple, t.read(version=v_added).collect())) == {
        (i, k, v, None) for (i, k, v) in BASE
    }
    assert set(map(tuple, t.read(version=v_pre_drop).collect())) == (
        exp_evolved - {(2, "a", 20, None)} | {(2, "a", 21, 200)}
    )


def test_evolution_merge_compact_interleavings_property(spark, tmp_path):
    """Property: any interleaving of append / MOR merge / COW merge /
    compact around one add_column → … → drop_column pair must keep
    read() equal to a plain Python model of the table at every step.
    Red under a snapshot-schema-projection mutation (e.g. reads mapping
    files by position, or drop failing to project the column away)."""
    import itertools
    import random

    rnd = random.Random(1106)
    seqs = []
    for trial in range(6):
        mid = [rnd.choice(["append", "mor", "cow", "compact"])
               for _ in range(rnd.randint(2, 5))]
        i = rnd.randint(0, len(mid))
        j = rnd.randint(i, len(mid))
        seq = mid[:i] + ["add"] + mid[i:j] + ["drop-maybe"] + mid[j:]
        seqs.append(seq)
    # plus the fully-adversarial fixed one
    seqs.append(["add", "mor", "compact", "mor", "append", "drop-maybe",
                 "cow", "compact"])

    for n, seq in enumerate(seqs):
        t = _mk(spark, tmp_path, name=f"prop{n}")
        model = {i: {"id": i, "k": k, "v": v} for (i, k, v) in BASE}
        cols = ["id", "k", "v"]
        next_id = itertools.count(100)

        def ddl():
            return ", ".join(f"{c} bigint" if c != "k" else "k string"
                             for c in cols)

        def mkrow(i, k, v, extra):
            r = {"id": i, "k": k, "v": v}
            if "extra" in cols:
                r["extra"] = extra
            return r

        for op in seq:
            if op == "add":
                t.add_column("extra", "bigint")
                cols = cols + ["extra"]
                for r in model.values():
                    r.setdefault("extra", None)
            elif op == "drop-maybe":
                if "extra" in cols:
                    t.drop_column("extra")
                    cols = [c for c in cols if c != "extra"]
            elif op == "append":
                i = next(next_id)
                row = mkrow(i, "b", i * 10, i * 100)
                t.append(spark.createDataFrame(
                    [tuple(row[c] for c in cols)], ddl()))
                model[i] = dict(row)
            elif op in ("mor", "cow"):
                upd_id = rnd.choice(sorted(model))
                ins_id = next(next_id)
                upd = mkrow(upd_id, model[upd_id]["k"],
                            model[upd_id]["v"] + 1, 55)
                ins = mkrow(ins_id, "c", ins_id * 10, ins_id * 100)
                src = spark.createDataFrame(
                    [tuple(r[c] for c in cols) for r in (upd, ins)], ddl()
                )
                update_set = {"v": "s.v"}
                if "extra" in cols:
                    update_set["extra"] = "s.extra"
                t.merge(
                    src, on=["id"],
                    clause=MergeClause(matched_update=update_set),
                    mode="merge-on-read" if op == "mor" else "copy-on-write",
                )
                model[upd_id].update(
                    {c: upd[c] for c in update_set if c != "v"} | {"v": upd["v"]}
                )
                model[ins_id] = dict(ins)
            elif op == "compact":
                t.compact(target_files=2)
            got = set(map(tuple, t.read().collect()))
            exp = {tuple(r.get(c) for c in cols) for r in model.values()}
            assert got == exp, f"seq={seq} after op={op}"
            assert t.read().columns == cols, f"seq={seq} after op={op}"


def test_partition_spec_evolution(spark, tmp_path):
    """set_partition_spec: old files keep their layout AND their dir
    pruning; new writes land under the new spec; compact migrates."""
    t = SnapshotTable(spark, str(tmp_path / "specevo"))
    t.create_or_replace(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id bigint, k string, v bigint"
        ),
        partitions=1, partition_by=["k"],
    )
    t.set_partition_spec(["v"])
    t.append(
        spark.createDataFrame([(3, "c", 30)], "id bigint, k string, v bigint")
    )
    snap = t._read_snapshot(t.current_version())
    assert any("k=" in rel for rel in snap["files"])   # old era intact
    assert any("v=" in rel for rel in snap["files"])   # new era new spec
    # both eras prune on THEIR OWN dir columns
    assert _rows(t.read_where([("k", "=", "a")])) == [(1, "a", 10)]
    assert _rows(t.read_where([("v", ">=", 30)])) == [(3, "c", 30)]
    assert _rows(t.read()) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # compact migrates the whole table to the new spec
    t.compact(target_files=1)
    snap = t._read_snapshot(t.current_version())
    assert all("v=" in rel for rel in snap["files"])
    assert not any("k=" in rel for rel in snap["files"])
    assert _rows(t.read()) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    assert _rows(t.read_where([("v", "=", 20)])) == [(2, "b", 20)]

    # spec removal: future writes unpartitioned
    t.set_partition_spec(None)
    t.append(
        spark.createDataFrame([(4, "d", 40)], "id bigint, k string, v bigint")
    )
    snap = t._read_snapshot(t.current_version())
    newest = [r for r in snap["files"] if "v=" not in r and "k=" not in r]
    assert newest, "post-removal append should be unpartitioned"
    assert t.read().count() == 4

    with pytest.raises(ValueError, match="not in schema"):
        t.set_partition_spec(["ghost"])


def test_spec_evolution_prunes_old_era_by_dir(spark, tmp_path):
    """File-level check: after evolution, a filter on the OLD partition
    column must still drop old-era files by DIRECTORY (no footer needed)
    — the generalized any-era matcher, not current-spec-only."""
    t = SnapshotTable(spark, str(tmp_path / "oldprune"))
    t.create_or_replace(
        spark.createDataFrame(
            [(i, "k%d" % (i % 4), i) for i in range(40)],
            "id bigint, k string, v bigint",
        ),
        partitions=1, partition_by=["k"],
    )
    t.set_partition_spec(["v"])
    pruned = t.read_where([("k", "=", "k1")])
    ins = pruned.inputFiles()
    assert ins and all("k%3D" in f or "k=" in f for f in ins)
    assert all("k=k1" in f.replace("%3D", "=") for f in ins)
    assert pruned.count() == 10
