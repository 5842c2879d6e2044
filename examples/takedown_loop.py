#!/usr/bin/env python
"""The takedown lifecycle: a corpus deletion propagates to EVERY
standing artifact, then the ANN index follows the corpus's change feed
so later syncs carry takedowns and ingest alike.

    setup   corpus table + dedup artifacts + bucketed lookup + ANN index
    day 1   opt-out arrives → delete-aware MERGE on the corpus →
            CDF delete window → propagate_takedown purges the
            fingerprint/band artifacts, the lookup, and the ANN index
            (merge-on-read purge for the scattered band partitions)
    day 2   new documents land + another takedown → ONE
            AnnState.sync_from_cdf call folds the inserts exactly-once
            and purges the deletes (the epoch marker is the cursor)
    verify  a copy of a taken-down doc classifies 'new'; no ANN probe
            returns a deleted id; re-running the propagation is a no-op

    python examples/takedown_loop.py [SF_DIR]

This is q135 + q137's shape as a library loop (plans/corpus_scale.py
runs both under DuckDB oracles).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.ann_state import build_ann_state
from iceberg_evaluation_spark.operators.changelog import table_changes
from iceberg_evaluation_spark.operators.incremental_dedup import (
    build_dedup_state,
    incremental_neardup_dedup,
)
from iceberg_evaluation_spark.operators.takedown import (
    propagate_takedown,
    takedown_ids,
)
from iceberg_evaluation_spark.session import get_spark
from iceberg_evaluation_spark.sources import load_table
from iceberg_evaluation_spark.tables.bucketed_lookup import BucketedLookup
from iceberg_evaluation_spark.tables.snapshot_table import (
    MergeClause,
    SnapshotTable,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="takedown-loop")
    tmp = tempfile.mkdtemp(prefix="takedown_")
    p = lambda *a: os.path.join(tmp, *a)  # noqa: E731

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    # ---- setup: the corpus table and its standing artifacts ----------
    corpus = SnapshotTable(spark, p("corpus"))
    corpus.create_or_replace(docs)                                   # v1
    state = build_dedup_state(
        spark, docs, "doc_id", "text", p("fp"), p("bands"),
        index_partitions=8,
    )
    lookup = BucketedLookup.create(
        spark, docs, p("lookup"), "doc_id", "text", n_buckets=16
    )
    vec_corpus = SnapshotTable(spark, p("vec_corpus"))
    vec_corpus.create_or_replace(emb)                                # v1
    ann = build_ann_state(
        spark, vec_corpus.read(1), p("cent"), p("assign"), n_cells=16
    )

    # ---- day 1: an opt-out batch arrives -----------------------------
    optout = docs.filter(F.col("doc_id") % 17 == 3).select(
        "doc_id", F.lit(True).alias("_drop")
    )
    v0 = corpus.current_version()
    corpus.merge(                                                    # v2
        optout,
        on=["doc_id"],
        clause=MergeClause(
            matched_delete_condition="s._drop", insert_when_not_matched=False
        ),
    )
    ids = takedown_ids(table_changes(corpus, ["doc_id"], v0), "doc_id")
    receipt = propagate_takedown(
        ids, dedup_state=state, lookups=[lookup], mode="merge-on-read"
    )
    print("takedown receipt:", receipt)

    # the vector corpus follows suit, and ONE sync keeps the index true
    vec_corpus.merge(                                                # v2
        emb.filter(F.col("vec_id") % 17 == 3).select(
            "vec_id", F.lit(True).alias("_drop")
        ),
        on=["vec_id"],
        clause=MergeClause(
            matched_delete_condition="s._drop", insert_when_not_matched=False
        ),
    )
    print(
        "ann sync:",
        ann.sync_from_cdf(vec_corpus, ["vec_id"], query_id="loop",
                          from_version=1),
    )

    # ---- verify: the engine has genuinely forgotten -------------------
    kept = docs.filter(F.col("doc_id") % 17 != 3)
    probe = docs.filter(F.col("doc_id") % 17 == 3).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    )
    out = incremental_neardup_dedup(
        state, probe, lookup, "doc_id", "text", append_new=False
    )
    n_new = out.filter(F.col("status") == "new").count()
    print(f"copies of taken-down docs classifying 'new': {n_new}/{out.count()}")

    q = emb.filter(F.col("vec_id") % 17 == 3).limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ann.topk(q, k=5, nprobe=4)
    leaked = hits.filter(F.col("vec_id") % 17 == 3).count()
    print(f"ANN probes over deleted queries: {hits.count()} rows, "
          f"{leaked} deleted ids leaked (must be 0)")

    # re-running the same takedown is a no-op everywhere
    print("re-run receipt (all zero):",
          propagate_takedown(ids, dedup_state=state, lookups=[lookup]))
    assert kept.count() == corpus.read().count()
    spark.stop()


if __name__ == "__main__":
    main()
