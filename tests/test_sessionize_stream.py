"""Stateful streaming sessionization (applyInPandasWithState).

A session closes in-stream the moment a later event exceeds the gap
(emitted in that micro-batch); the final open session per key lives in
state awaiting the event-time timeout, so with one availableNow batch
exactly the gap-closed sessions are emitted.
"""

from __future__ import annotations

import pytest

from datetime import datetime

from iceberg_evaluation_spark.streaming.sessionize import sessionize_stream

TS = lambda s: datetime.fromisoformat(s)  # noqa: E731
SCHEMA = "user_id bigint, ts timestamp, value double"

ROWS = [
    # user 1: session A (2 events, 10 min apart) … 2h silence … session B
    (1, TS("2024-01-01 10:00:00"), 1.50),
    (1, TS("2024-01-01 10:10:00"), 2.25),
    (1, TS("2024-01-01 12:30:00"), 4.00),  # opens session B (stays in state)
    # user 2: one event … 31 min gap closes it … second session open
    (2, TS("2024-01-01 09:00:00"), 10.00),
    (2, TS("2024-01-01 09:31:00"), 0.75),
]


def test_gap_closed_sessions_emitted(spark, tmp_path):
    src = str(tmp_path / "events_in")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"],
         r["duration_s"], r["total_value"])
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    )
    assert got == [
        # closed in-batch by the gap rule
        (1, 2, TS("2024-01-01 10:00:00"), TS("2024-01-01 10:10:00"), 600, 3.75),
        (2, 1, TS("2024-01-01 09:00:00"), TS("2024-01-01 09:00:00"), 0, 10.00),
        # closed by EVENT-TIME TIMEOUT: the availableNow final batch
        # advances the watermark to max event time (12:30), past this
        # session's last+gap (10:01); user 1's open session (timeout
        # 13:00) correctly survives in state
        (2, 1, TS("2024-01-01 09:31:00"), TS("2024-01-01 09:31:00"), 0, 0.75),
    ]


def test_batch_semantics_match_q27_shape(spark, sf_smoke):
    # the streaming operator's session boundaries must agree with the
    # batch gaps-and-islands query for sessions closed by a gap: replay
    # the testdata events through the stateful path in one batch and
    # check every emitted session exists in the batch q27 result
    from iceberg_evaluation_spark.plans import REGISTRY
    from iceberg_evaluation_spark.sources import load_table

    batch = {
        (r["user_id"], r["n_events"], r["session_start"], r["session_end"]):
            r["total_value"]
        for r in REGISTRY["q27_event_sessions"].spark(spark, sf_smoke).collect()
    }

    src_df = load_table(spark, sf_smoke, "events").select("user_id", "ts", "value")
    import tempfile

    src = tempfile.mkdtemp(prefix="events_stream_")
    src_df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id bigint, ts timestamp, value double").parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql("SELECT * FROM stream_sessions").collect()
    assert len(emitted) > 0
    # every gap-closed streaming session must BE a batch session
    # (q27 truncates bounds to seconds; same truncation here)
    for r in emitted:
        key = (
            r["user_id"],
            r["n_events"],
            r["session_start"].replace(microsecond=0),
            r["session_end"].replace(microsecond=0),
        )
        assert key in batch, f"streaming session not found in batch result: {key}"
        assert abs(batch[key] - r["total_value"]) < 1e-9


def test_idempotent_epoch_sink_skips_replayed_batches(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between sink write and
    checkpoint commit replays the epoch. The sink records epoch ids in
    the SAME atomic snapshot commit as the data, so a replay is
    detected and skipped — exactly-once by construction."""
    from iceberg_evaluation_spark.streaming.incremental import (
        IdempotentEpochSink,
    )
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "sink"))
    sink = IdempotentEpochSink(t, query_id="qA")
    b0 = spark.createDataFrame([(1, "a")], "id bigint, v string")
    b1 = spark.createDataFrame([(2, "b")], "id bigint, v string")

    assert sink.write(b0, 0) is True
    assert sink.write(b0, 0) is False           # replayed epoch: skipped
    assert t.read().count() == 1
    assert sink.write(b1, 1) is True
    assert sink.write(b1, 1) is False           # replay again
    assert sink.write(b1, 0) is False           # stale epoch after restart
    assert t.read().count() == 2
    assert sink.last_epoch() == 1

    # a SECOND query sharing the table tracks its own epochs
    sink_b = IdempotentEpochSink(t, query_id="qB")
    assert sink_b.last_epoch() == -1
    assert sink_b.write(b0, 0) is True
    assert t.read().count() == 3
    assert sink.last_epoch() == 1               # qA unaffected

    # empty batches never consume the epoch
    empty = spark.createDataFrame([], "id bigint, v string")
    assert sink.write(empty, 5) is False
    assert sink.last_epoch() == 1
    assert sink.write(b0.selectExpr("id + 10 AS id", "v"), 5)
    assert sink.last_epoch() == 5


def test_epoch_sink_requires_explicit_query_id(spark, tmp_path):
    """r8 ADVICE: a shared default query_id would silently alias two
    streams' epoch sequences on one sink table — the id is required."""
    from iceberg_evaluation_spark.streaming.incremental import (
        IdempotentEpochSink,
    )
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "sink"))
    with pytest.raises(TypeError):
        IdempotentEpochSink(t)
    with pytest.raises(ValueError):
        IdempotentEpochSink(t, query_id="")
    with pytest.raises(ValueError):
        IdempotentEpochSink(t, query_id=None)


def test_two_writers_one_sink_interleaved_epochs_exactly_once(spark, tmp_path):
    """r8 verdict #6: two streams sharing one sink table, interleaved
    commits WITH replays after crashes — each query_id's epochs land
    exactly once, neither drops the other's, and a restarted sink
    (fresh object, same query_id) recovers its watermark from the log."""
    from iceberg_evaluation_spark.streaming.incremental import (
        IdempotentEpochSink,
    )
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "shared"))
    a = IdempotentEpochSink(t, query_id="A")
    b = IdempotentEpochSink(t, query_id="B")

    def batch(stream, epoch):
        return spark.createDataFrame(
            [(stream, epoch)], "stream string, epoch bigint"
        )

    # deterministic interleaving: (sink, epoch, expect_written)
    schedule = [
        (a, 0, True), (b, 0, True),
        (a, 0, False),              # A crashes, replays epoch 0
        (b, 1, True), (a, 1, True),
        (b, 1, False), (b, 0, False),  # B replays both its epochs
        (a, 2, True),
        (b, 2, True), (a, 2, False),
    ]
    for sink, epoch, expect in schedule:
        got = sink.write(batch(sink.query_id, epoch), epoch)
        assert got is expect, (sink.query_id, epoch, expect)

    rows = {(r["stream"], r["epoch"]) for r in t.read().collect()}
    assert rows == {(s, e) for s in ("A", "B") for e in (0, 1, 2)}
    assert t.read().count() == 6  # exactly once each — no duplicates

    # restart shape: fresh sink objects share nothing in-memory; the
    # epoch watermark comes back from the snapshot log, per query_id
    a2 = IdempotentEpochSink(t, query_id="A")
    b2 = IdempotentEpochSink(t, query_id="B")
    assert a2.last_epoch() == 2 and b2.last_epoch() == 2
    assert a2.write(batch("A", 2), 2) is False
    assert b2.write(batch("B", 3), 3) is True
    assert a2.write(batch("A", 3), 3) is True
    assert t.read().count() == 8


def test_two_writers_true_concurrent_threads_exactly_once(spark, tmp_path):
    """TRUE thread-level contention (not simulated interleaving): two
    writers race 10 epochs each into one sink table from separate
    threads. The sink's client-side retry absorbs ConcurrentCommitError
    losses; every epoch lands exactly once per query_id, including the
    initial CREATE race."""
    import threading

    from iceberg_evaluation_spark.streaming.incremental import (
        IdempotentEpochSink,
    )
    from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable

    root = str(tmp_path / "race_sink")
    errs = []

    def writer(qid: str) -> None:
        try:
            sink = IdempotentEpochSink(SnapshotTable(spark, root), qid)
            for epoch in range(10):
                b = spark.createDataFrame(
                    [(qid, epoch)], "stream string, epoch bigint"
                )
                assert sink.write(b, epoch) is True
        except Exception as e:  # pragma: no cover
            errs.append((qid, repr(e)))

    threads = [
        threading.Thread(target=writer, args=(q,)) for q in ("A", "B")
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(300)
    assert not errs, errs
    t = SnapshotTable(spark, root)
    rows = [(r["stream"], r["epoch"]) for r in t.read().collect()]
    assert len(rows) == 20  # exactly once each, none lost to the race
    assert set(rows) == {(q, e) for q in ("A", "B") for e in range(10)}
    # both watermarks recoverable from the shared log
    assert IdempotentEpochSink(t, "A").last_epoch() == 9
    assert IdempotentEpochSink(t, "B").last_epoch() == 9
