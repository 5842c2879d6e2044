#!/usr/bin/env python
"""The production one-pass ingest loop: quality-classify AND dedup each
delta against standing artifacts in a single scan.

    setup   corpus table + fingerprint/band artifacts + validated model
    loop    for each delta drop:
              classifier gate (broadcast B-row model; rejected rows
              never reach the dedup joins) →
              bloom exact stage → band candidates → Jaccard verify →
              fold accepted-new rows into artifacts AND corpus table
    rollout swap in a new model version mid-loop (validated once)

    python examples/gated_ingest.py [SF_DIR]

This is q115's shape as a library loop (plans/corpus_scale.py runs it
under foreachBatch with a DuckDB oracle); the embedding twin is
operators/ingest.gated_semantic_delta (q117).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.classifier import demo_weight_vector
from iceberg_evaluation_spark.operators.incremental_dedup import build_dedup_state
from iceberg_evaluation_spark.operators.ingest import GatedIngestSession
from iceberg_evaluation_spark.session import get_spark
from iceberg_evaluation_spark.sources import load_table
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gated-ingest")
    root = tempfile.mkdtemp(prefix="gated_loop_")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = SnapshotTable(spark, os.path.join(root, "corpus"))
    corpus.create_or_replace(docs)
    state = build_dedup_state(
        spark, corpus.read(), "doc_id", "text",
        os.path.join(root, "fp"), os.path.join(root, "bands"),
    )
    session = GatedIngestSession(
        state, demo_weight_vector(spark, 1024), corpus,
        id_col="doc_id", text_col="text", num_buckets=1024,
        keep_threshold=0.49,
    )
    print(f"corpus: {corpus.read().count()} docs; model validated "
          f"({session.model_validations}x)")

    # day 1: copies + jittered copies + fresh docs
    delta1 = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"),
                F.md5("text").alias("text"),
            )
        )
    )
    for day, delta in ((1, delta1),):
        out = session.process_delta(delta)
        print(f"day {day}:",
              {r["status"]: r["n"] for r in
               out.groupBy("status").agg(F.count("*").alias("n")).collect()})

    # day 2 replays day 1 under a NEW model version: accepted rows are
    # now exact dups; the rollout revalidates exactly once
    session.update_model(demo_weight_vector(spark, 1024, seed_tag="w2"))
    out = session.process_delta(delta1, append_new=False)
    print("day 2 (model v2):",
          {r["status"]: r["n"] for r in
           out.groupBy("status").agg(F.count("*").alias("n")).collect()})
    print(f"model validations: {session.model_validations}; "
          f"corpus now {corpus.read().count()} docs; "
          f"append-cap drops so far: {state.append_drops}")
    spark.stop()


if __name__ == "__main__":
    main()
