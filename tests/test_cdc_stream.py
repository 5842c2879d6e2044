"""Continuous CDC consumer (streaming/incremental.cdc_consumer_stream,
r9 verdict #3): a real foreachBatch poll loop over the source snapshot
log, exactly-once by durable cursor, surviving a mid-stream restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.changelog import (
    init_replica,
    replica_cursor,
)
from iceberg_evaluation_spark.streaming.incremental import cdc_consumer_stream
from iceberg_evaluation_spark.tables.snapshot_table import (
    MergeClause,
    SnapshotTable,
)


def _tick(spark, ticks_dir, i):
    spark.range(1).select(F.lit(i).cast("bigint").alias("tick")).coalesce(
        1
    ).write.mode("append").parquet(ticks_dir)


def test_consumer_survives_restart_and_idles_cleanly(spark, tmp_path):
    base = SnapshotTable(spark, str(tmp_path / "base"))
    base.create_or_replace(
        spark.range(40).select(F.col("id"), (F.col("id") * 2).alias("v"))
    )  # v1
    rep = SnapshotTable(spark, str(tmp_path / "rep"))
    init_replica(rep, base, ["id"], at_version=1)
    ticks = str(tmp_path / "ticks")
    ckpt = str(tmp_path / "ckpt")

    # producer commit v2 while the consumer has never run
    base.merge(
        spark.range(10).select(F.col("id"), (F.col("id") + 100).alias("v")),
        on=["id"],
        clause=MergeClause(
            matched_update={"v": "s.v"}, insert_when_not_matched=False
        ),
    )
    _tick(spark, ticks, 1)
    q1 = cdc_consumer_stream(spark, ticks, rep.root, base.root, ckpt)
    q1.awaitTermination(120)
    assert int(replica_cursor(rep)["applied_version"]) == 2

    # the consumer is DOWN; producer keeps going (v3 append, v4 delete)
    base.append(
        spark.range(1000, 1005).select(F.col("id"), (F.col("id")).alias("v"))
    )
    base.merge(
        spark.range(5).select("id", F.lit(True).alias("_d")),
        on=["id"],
        clause=MergeClause(
            matched_delete_condition="s._d", insert_when_not_matched=False
        ),
    )
    # restart: NEW stream over the SAME checkpoint — resumes from the
    # on-disk cursor, told nothing
    _tick(spark, ticks, 2)
    q2 = cdc_consumer_stream(spark, ticks, rep.root, base.root, ckpt)
    q2.awaitTermination(120)
    assert int(replica_cursor(rep)["applied_version"]) == 4

    # converged: replica content == source head, exactly
    src_rows = {(r["id"], r["v"]) for r in base.read().collect()}
    rep_rows = {(r["id"], r["v"]) for r in rep.read().collect()}
    assert rep_rows == src_rows and len(rep_rows) == 40

    # idle poll: a quiet source must commit nothing to the replica
    v = rep.current_version()
    _tick(spark, ticks, 3)
    q3 = cdc_consumer_stream(spark, ticks, rep.root, base.root, ckpt)
    q3.awaitTermination(120)
    assert rep.current_version() == v


def test_step_mode_applies_one_version_per_poll(spark, tmp_path):
    base = SnapshotTable(spark, str(tmp_path / "base"))
    base.create_or_replace(spark.range(10).select("id"))         # v1
    rep = SnapshotTable(spark, str(tmp_path / "rep"))
    init_replica(rep, base, ["id"], at_version=1)
    base.append(spark.range(10, 15).select("id"))                # v2
    base.append(spark.range(15, 20).select("id"))                # v3
    ticks = str(tmp_path / "ticks")
    _tick(spark, ticks, 1)
    q = cdc_consumer_stream(
        spark, ticks, rep.root, base.root, str(tmp_path / "ckpt"), step=True
    )
    q.awaitTermination(120)
    # one tick, step mode → exactly one version advanced
    assert int(replica_cursor(rep)["applied_version"]) == 2
    assert rep.read().count() == 15
