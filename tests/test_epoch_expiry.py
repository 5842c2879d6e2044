"""Exactly-once epoch markers vs snapshot expiry.

The failure mode pinned here: a sink/index's exactly-once dedup rides
in snapshot summaries, and ``expire_snapshots`` deletes old manifests.
A quiet stream whose newest marker scrolls past the retention horizon
(because RIVAL writers keep committing) would lose its replay
detection, and a crash-replayed epoch would double-apply — the exact
bug the epoch sink exists to make impossible. ``expire_snapshots``
therefore carries the per-query_id max epoch forward into an
``epoch_marks/`` sidecar BEFORE deleting any manifest, and both
consumers (``IdempotentEpochSink``, ``AnnState.append_epoch``) fold
that floor into their scans.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.ann_state import (
    build_ann_state,
    open_ann_state,
)
from iceberg_evaluation_spark.streaming.incremental import IdempotentEpochSink
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def _batch(spark, lo, n=5):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _vectors(spark, n, dim=8, seed_shift=0):
    return spark.range(n).select(
        (F.col("id") + seed_shift).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda p: (
                F.when((p % 4) == (F.col("id") + seed_shift) % 4, 1.0)
                .otherwise(0.0)
                + ((F.col("id") + seed_shift) * (p + 1) % 97) / 970.0
            ).cast("float"),
        ).alias("embedding"),
    )


def test_sink_replay_detected_after_expiry(spark, tmp_path):
    """Quiet stream + busy rival writers + expiry: the restarted sink
    must still skip its replayed epoch via the carried-forward floor."""
    table = SnapshotTable(spark, str(tmp_path / "sink"))
    sink = IdempotentEpochSink(table, query_id="qa")
    for e in range(3):
        assert sink.write(_batch(spark, e * 5), e) is True
    rows_after_epochs = table.read().count()
    # rival writer rolls the log far past the stream's newest marker
    for i in range(10):
        table.append(_batch(spark, 1000 + i * 5))
    # retention horizon excludes every marker-bearing manifest
    # (append-only history: data files stay referenced, manifests go)
    table.expire_snapshots(keep_last=3)
    for v in range(1, 4):
        assert not os.path.exists(table._snapshot_path(v))
    # restarted consumer (fresh instance = fresh watermarks)
    restarted = IdempotentEpochSink(table, query_id="qa")
    assert restarted.last_epoch() == 2
    assert restarted.write(_batch(spark, 10), 2) is False  # crash replay
    assert table.read().count() == rows_after_epochs + 50
    assert restarted.write(_batch(spark, 15), 3) is True  # stream resumes


def test_sink_floors_are_per_query_id(spark, tmp_path):
    """Two streams on one table: expiry carries BOTH floors; neither
    stream's replay detection bleeds into the other's epoch sequence."""
    table = SnapshotTable(spark, str(tmp_path / "shared"))
    a = IdempotentEpochSink(table, query_id="a")
    b = IdempotentEpochSink(table, query_id="b")
    a.write(_batch(spark, 0), 0)
    b.write(_batch(spark, 5), 7)
    for i in range(8):
        table.append(_batch(spark, 100 + i * 5))
    table.expire_snapshots(keep_last=2)
    floors = table.sink_epoch_floors()
    assert floors == {"a": 0, "b": 7}
    assert IdempotentEpochSink(table, "a").last_epoch() == 0
    assert IdempotentEpochSink(table, "b").last_epoch() == 7


def test_repeated_expiry_supersedes_mark_files(spark, tmp_path):
    """Each expiry merges the sidecar into ONE dominating file — the
    floor is monotone across expirys and the dir does not grow."""
    table = SnapshotTable(spark, str(tmp_path / "t"))
    sink = IdempotentEpochSink(table, query_id="s")
    sink.write(_batch(spark, 0), 0)
    for i in range(5):
        table.append(_batch(spark, 50 + i * 5))
    table.expire_snapshots(keep_last=2)
    sink.write(_batch(spark, 30), 1)
    for i in range(5):
        table.append(_batch(spark, 200 + i * 5))
    table.expire_snapshots(keep_last=2)
    marks = [
        n for n in os.listdir(table._epoch_marks_dir) if n.endswith(".json")
    ]
    assert len(marks) == 1
    assert table.sink_epoch_floors() == {"s": 1}


def test_plain_table_expiry_writes_no_sidecar(spark, tmp_path):
    """A table with no epoch markers pays nothing: expiry leaves no
    epoch_marks/ directory behind."""
    table = SnapshotTable(spark, str(tmp_path / "plain"))
    for i in range(6):
        table.append(_batch(spark, i * 5))
    table.expire_snapshots(keep_last=2)
    assert not os.path.isdir(table._epoch_marks_dir)


def test_ann_epoch_replay_detected_after_expiry(spark, tmp_path):
    """Streaming ANN ingest: expire the assignments history past every
    epoch marker, reopen from disk, replay the last epoch — the fold
    must be skipped and the vector count exact."""
    corpus = _vectors(spark, 80)
    cent, assign = str(tmp_path / "cent"), str(tmp_path / "assign")
    st = build_ann_state(spark, corpus, cent, assign, n_cells=4)
    assert st.append_epoch(_vectors(spark, 10, seed_shift=1000), "ing", 0) == 10
    assert st.append_epoch(_vectors(spark, 10, seed_shift=2000), "ing", 1) == 10
    # rival (marker-free) appends roll the assignments log
    for i in range(6):
        st.append(_vectors(spark, 3, seed_shift=5000 + i * 10))
    assert st.assignments.expire_snapshots(keep_last=3) >= 0
    # every marker-bearing manifest is gone from the log
    floors = st.assignments.sink_epoch_floors()
    assert floors.get("ing") == 1
    reopened = open_ann_state(spark, cent, assign)
    n_before = reopened.assignments.read().count()
    # crash-replay of epoch 1 after restart: detected via the floor
    assert (
        reopened.append_epoch(_vectors(spark, 10, seed_shift=2000), "ing", 1)
        == 0
    )
    assert reopened.assignments.read().count() == n_before
    # the stream resumes with the next epoch
    assert (
        reopened.append_epoch(_vectors(spark, 10, seed_shift=3000), "ing", 2)
        == 10
    )
