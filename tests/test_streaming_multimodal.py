"""Streaming (foreachBatch SCD2, watermarked windows) and multimodal
(binary payload plumbing) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.multimodal import (
    attach_binary_payload,
    extract_image_features,
    sample_frames,
)
from iceberg_evaluation_spark.operators.scd2 import bulk_insert
from iceberg_evaluation_spark.sources import load_table
from iceberg_evaluation_spark.streaming import scd2_stream, windowed_event_counts
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def test_scd2_stream_foreachbatch(spark, tmp_path):
    """CDC parquet drops consumed as a stream land in the SCD2 table with
    correct re-sliced intervals."""
    schema = "pk string, quantity int, extraction_timestamp timestamp, op string"
    full = spark.createDataFrame(
        [("A", 1, "2022-01-01 00:00:00", None), ("B", 1, "2022-01-01 00:00:00", None)],
        "pk string, quantity int, extraction_timestamp string, op string",
    ).withColumn("extraction_timestamp", F.col("extraction_timestamp").cast("timestamp"))
    table = SnapshotTable(spark, str(tmp_path / "t"))
    bulk_insert(table, full)

    cdc_dir = str(tmp_path / "cdc")
    spark.createDataFrame(
        [("A", 3, "2022-03-01 00:00:00", "U"), ("C", 4, "2022-04-01 00:00:00", "I")],
        "pk string, quantity int, extraction_timestamp string, op string",
    ).withColumn(
        "extraction_timestamp", F.col("extraction_timestamp").cast("timestamp")
    ).write.parquet(cdc_dir)

    stream = spark.readStream.schema(schema).parquet(cdc_dir)
    q = scd2_stream(
        stream, table, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    rows = {(r["pk"], r["quantity"], r["is_current"]) for r in table.read().collect()}
    assert rows == {
        ("A", 1, False),
        ("A", 3, True),
        ("B", 1, True),
        ("C", 4, True),
    }


def test_windowed_event_counts_streaming(spark, sf_smoke, tmp_path):
    """The watermarked window agg runs as a real streaming query (memory
    sink) and matches the batch result."""
    batch_events = load_table(spark, sf_smoke, "events")
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(batch_events).collect()
    }

    # replay the same rows through a file stream
    replay_dir = str(tmp_path / "events")
    batch_events.write.parquet(replay_dir)
    stream = spark.readStream.schema(batch_events.schema).parquet(replay_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("winagg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    # append mode only emits windows sealed by the watermark; everything
    # emitted must match the batch truth
    assert got
    for k, v in got.items():
        assert expected[k] == v


def test_multimodal_feature_extraction(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    media = attach_binary_payload(docs, "text", "doc_id")
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,payload:binary,media_type:string,"
        "width:int,height:int,n_frames:int>"
    )
    feats = extract_image_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 50
    r0 = rows[0]
    assert len(r0["feature"]) == 16 and len(r0["digest"]) == 16
    assert 0.0 <= r0["mean_luma"] <= 1.0
    # determinism: same payload → same digest across runs
    again = {r["media_id"]: r["digest"] for r in extract_image_features(media).collect()}
    assert all(again[r["media_id"]] == r["digest"] for r in rows)


def test_multimodal_frame_sampling(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(10)
    media = attach_binary_payload(docs, "text", "doc_id")
    frames = sample_frames(media, every_nth=2)
    per_media = (
        frames.groupBy("media_id").count().collect()
    )
    n_frames = {r["media_id"]: r["n_frames"] for r in media.collect()}
    for r in per_media:
        expected = (n_frames[r["media_id"]] + 1) // 2
        assert r["count"] == expected


def test_multimodal_stub_gate(spark, sf_smoke):
    # decode_stub=False is a real BMP codec; non-BMP payloads (here UTF-8
    # text bytes) still hit the honest NotImplementedError plug-point
    docs = load_table(spark, sf_smoke, "documents").limit(2)
    media = attach_binary_payload(docs, "text", "doc_id")
    with pytest.raises(Exception, match="NotImplementedError|24-bpp BMP"):
        extract_image_features(media, decode_stub=False).collect()


def test_bmp_codec_roundtrip(spark, sf_smoke):
    """attach_bmp_payload writes REAL BMPs; decode_bmp_features parses the
    headers back and the decoded values match the generation formulas,
    including the bottom-up row flip (top_left_luma = id%256/255)."""
    from iceberg_evaluation_spark.operators.multimodal import (
        attach_bmp_payload,
        decode_bmp_features,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(10)
    media = attach_bmp_payload(docs, "doc_id")
    got = {r["media_id"]: r for r in decode_bmp_features(media).collect()}
    assert len(got) == 10
    for mid, r in got.items():
        w, h = 16 + (mid % 8) * 4, 8 + mid % 8
        assert (r["width"], r["height"]) == (w, h)
        rowsum = sum((mid + y) % 256 for y in range(h))
        assert r["mean_luma"] == rowsum * w * 3 / (w * h * 3 * 255)
        assert r["top_left_luma"] == (mid % 256) / 255

    # the payload really is a parseable BMP file (magic + pixel offset)
    one = media.limit(1).collect()[0]["payload"]
    assert bytes(one[:2]) == b"BM"

    # real-codec feature path through the generic extractor
    feats = extract_image_features(media, dim=8, decode_stub=False).collect()
    assert all(abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-5 for r in feats)


def test_wav_codec_roundtrip(spark, sf_smoke):
    from iceberg_evaluation_spark.operators.multimodal import (
        attach_wav_payload,
        decode_wav_features,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(10)
    media = attach_wav_payload(docs, "doc_id")
    got = {r["media_id"]: r for r in decode_wav_features(media).collect()}
    assert len(got) == 10
    for mid, r in got.items():
        n = 64 + mid % 64
        assert (r["sample_rate"], r["n_samples"]) == (8000, n)
        assert r["first_sample"] == (mid * 37) % 2048 - 1024
        ss = sum(((mid * 37 + i * 101) % 2048 - 1024) ** 2 for i in range(n))
        assert abs(r["rms"] - (ss / n) ** 0.5) < 1e-12

    # corrupt payload is rejected, not silently decoded
    from pyspark.sql import functions as SF

    bad = media.withColumn("payload", SF.expr("substring(payload, 1, 10)"))
    with pytest.raises(Exception, match="missing fmt/data|not a WAV"):
        decode_wav_features(bad).collect()


def test_multimodal_resize_composes(spark, sf_smoke):
    # resize emits the same MEDIA_SCHEMA bundle → feature extraction
    # composes on it unchanged; payload length tracks the target area
    from iceberg_evaluation_spark.operators.multimodal import (
        attach_binary_payload,
        extract_image_features,
        resize_images,
    )
    from iceberg_evaluation_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    media = attach_binary_payload(docs, "text", "doc_id")
    resized = resize_images(media, target_w=32, target_h=32)
    rows = resized.collect()
    assert len(rows) == 20
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    assert all(len(r["payload"]) == max(16, 32 * 32 // 64) for r in rows)
    # deterministic: same input → same resized payload
    again = resize_images(media, target_w=32, target_h=32).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in rows} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }
    feats = extract_image_features(resized, dim=8).collect()
    assert len(feats) == 20 and all(len(f["feature"]) == 8 for f in feats)


def test_dedup_stream_drops_redelivered(spark, tmp_path):
    # the same file fed twice through a file-source stream: every event
    # is re-delivered once; dedup keeps exactly one copy per key
    from iceberg_evaluation_spark.streaming.incremental import dedup_stream

    rows = spark.range(50).selectExpr(
        "id AS event_id",
        "timestamp_micros(CAST(1700000000000000 + id * 1000000 AS LONG)) AS ts",
        "CAST(id % 7 AS DOUBLE) AS value",
    )
    src = str(tmp_path / "dup_in")
    rows.coalesce(1).write.parquet(src)
    rows.coalesce(1).write.mode("append").parquet(src)  # re-delivery

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, value double"
    ).parquet(src)
    q = (
        dedup_stream(stream, keys=["event_id"])
        .writeStream.format("memory")
        .queryName("deduped_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM deduped_events").collect()
    assert sorted(r["event_id"] for r in got) == list(range(50))


def test_stream_static_enrichment_matches_batch(spark, sf_smoke, tmp_path):
    from iceberg_evaluation_spark.sources import load_table
    from iceberg_evaluation_spark.streaming.incremental import enrich_stream

    ev_batch = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "value"
    )
    dim = spark.range(200).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).alias("tier")
    )
    src = str(tmp_path / "enrich_in")
    ev_batch.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id bigint, user_id bigint, value double"
    ).parquet(src)
    q = (
        enrich_stream(stream, dim, ["user_id"])
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["tier"])
        for r in spark.sql("SELECT event_id, tier FROM enriched").collect()
    }
    want = {
        (r["event_id"], r["tier"])
        for r in ev_batch.join(dim, ["user_id"], "left").collect()
    }
    assert got == want


def test_wds_connector_roundtrip_and_partitioning(spark, sf_smoke, tmp_path):
    """The WebDataset tar-shard connector: executor-side shard write,
    one input partition per shard on read, exact payload round-trip,
    deterministic shard bytes (mtime zeroed)."""
    import os

    from pyspark.sql import functions as F

    from iceberg_evaluation_spark.sources import load_table
    from iceberg_evaluation_spark.sources.wds import (
        register_wds,
        write_wds_shards,
    )

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = str(tmp_path / "shards")
    write_wds_shards(docs.repartition(3, "doc_id"), out, "doc_id", "payload")
    shards = sorted(n for n in os.listdir(out) if n.endswith(".tar"))
    assert len(shards) == 3 and not any(n.endswith(".tmp") for n in os.listdir(out))

    register_wds(spark)
    back = spark.read.format("wds").option("path", out).load()
    # one scan partition per shard — WebDataset's parallelism contract
    assert back.rdd.getNumPartitions() == 3
    got = {
        int(r["sample_id"]): bytes(r["payload"]).decode()
        for r in back.collect()
    }
    exp = {r["doc_id"]: r["text"] for r in load_table(
        spark, sf_smoke, "documents").select("doc_id", "text").collect()}
    assert got == exp
    # shard lineage column maps every sample to a real shard file
    assert set(
        r["shard"] for r in back.select("shard").distinct().collect()
    ) == set(shards)


def test_wds_writer_sweeps_orphaned_tmp_files(spark, sf_smoke, tmp_path):
    """ADVICE r5: a hard-killed executor (SIGKILL/OOM) leaks its
    attempt-unique shard-*.tar.tmp-* file with no Python except block to
    clean it; the writer must sweep prior jobs' orphans at job start."""
    import os

    from pyspark.sql import functions as F

    from iceberg_evaluation_spark.sources import load_table
    from iceberg_evaluation_spark.sources.wds import write_wds_shards

    out = str(tmp_path / "shards")
    os.makedirs(out)
    orphan = os.path.join(out, "shard-00007.tar.tmp-2-deadbeef")
    with open(orphan, "wb") as f:
        f.write(b"partial tar bytes from a killed attempt")

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    write_wds_shards(docs.repartition(2, "doc_id"), out, "doc_id", "payload")
    names = os.listdir(out)
    assert not any(".tmp-" in n for n in names), names
    assert sorted(n for n in names if n.endswith(".tar")) == [
        "shard-00000.tar", "shard-00001.tar",
    ]
