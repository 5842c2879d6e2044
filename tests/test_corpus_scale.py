"""Physical pins for the execution-infrastructure corpus (q75–q78).

Value correctness is covered by test_oracle_parity (and the driver);
these tests pin the claims that make the queries worth registering —
the salt actually spreads the join key, and the bucketed join actually
skips the shuffle.
"""

from __future__ import annotations

import re

from iceberg_evaluation_spark.plans import REGISTRY


def _plan(spark, name: str, sf_dir: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_salted_join_key_includes_salt(spark, sf_smoke):
    plan = _plan(spark, "q77_salted_skew_join", sf_smoke)
    assert "__salt" in plan  # join key is (l_suppkey, __salt), not bare key
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_bucketed_join_has_single_exchange(spark, sf_smoke):
    """The orders⋈lineitem join must ride the bucket layout — the ONLY
    Exchange allowed is the one for the o_orderpriority re-aggregation
    (a different key than the bucketing key, so it must shuffle).

    At test scale AQE correctly prefers broadcasting the tiny orders
    side, which also skips the shuffle; broadcast is disabled here to
    expose the layout claim the query makes at fact-fact scale."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "q78_bucketed_colocated_join", sf_smoke)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) == 1, plan
    assert "SortMergeJoin" in plan


def test_streaming_queries_return_batch_results(spark, sf_smoke):
    """q75/q76 drain a real streaming job at build time and hand back a
    plain memory-sink table — re-reading the returned DataFrame must be
    stable (the sink is fully drained, not still filling)."""
    for name in ("q75_streaming_dedup", "q76_streaming_window_totals"):
        df = REGISTRY[name].spark(spark, sf_smoke)
        assert df.count() == df.count() > 0


def test_watermark_boundary_drop_vs_emit(spark, tmp_path):
    """Pin the exact late-event boundary the streaming queries (q75/q76/
    q84) rely on, measured across a checkpointed two-run replay: a late
    row is dropped iff its WINDOW END <= the checkpointed watermark — a
    row whose own timestamp is below the watermark still counts when its
    window is open, and a row in an already-emitted window vanishes
    without corrupting the emitted result."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "ts timestamp, user_id int"

    def write_batch(rows):
        spark.createDataFrame(rows, "ts string, user_id int").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def emitted():
        return sorted(
            (str(r["w"]["start"])[11:16], r["n"])
            for r in spark.read.parquet(out).collect()
        )

    # run 1: max event time 10:59 → checkpointed watermark 10:49; the
    # [10:00,10:05) window (end <= wm) is emitted and evicted
    write_batch([("2024-01-01 10:00:00", 1), ("2024-01-01 10:59:00", 1)])
    run_once()
    assert emitted() == [("10:00", 1)]

    # run 2 against watermark 10:49:
    #   10:03 → window end 10:05 <= wm: DROPPED (window already emitted)
    #   10:44 → window end 10:45 <= wm: DROPPED (never emitted at all)
    #   10:45 → row ts BELOW wm but window [10:45,10:50) end > wm: KEPT
    #   10:49 → row exactly AT wm, same window: KEPT
    #   10:50 → above wm: KEPT
    #   11:30 → advances wm to 11:20, flushing all windows ending <= 11:20
    write_batch(
        [
            ("2024-01-01 10:03:00", 1),
            ("2024-01-01 10:44:00", 1),
            ("2024-01-01 10:45:00", 1),
            ("2024-01-01 10:49:00", 1),
            ("2024-01-01 10:50:00", 1),
            ("2024-01-01 11:30:00", 1),
        ]
    )
    run_once()
    assert emitted() == [("10:00", 1), ("10:45", 2), ("10:50", 1), ("10:55", 1)]
