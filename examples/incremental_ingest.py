#!/usr/bin/env python
"""The daily-ingest loop: dedup each new batch against PERSISTED corpus
artifacts without ever re-scanning the corpus.

    day 0   build fingerprint + MinHash-band artifacts (once)
    day 1.. for each delta drop:
              bloom-prefiltered exact stage →
              band-index candidates → Jaccard verify →
              fold new docs back into the artifacts →
              refresh the downstream materialized rollup (delta-cost)

    python examples/incremental_ingest.py [SF_DIR]

This composes the reference's daily file-drop shape
(update_tpcds.py:56-62) with the LSH dedup family: the one-shot
operators re-signature the whole corpus per run (quadratic in days);
this loop re-signatures only each day's delta.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.incremental_dedup import (
    build_dedup_state,
    incremental_neardup_dedup,
)
from iceberg_evaluation_spark.session import get_spark
from iceberg_evaluation_spark.sources import load_table
from iceberg_evaluation_spark.tables.rollup import MaterializedRollup
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="incremental-ingest")
    root = tempfile.mkdtemp(prefix="ingest_loop_")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # ---- day 0: standing state --------------------------------------
    corpus = SnapshotTable(spark, os.path.join(root, "corpus"))
    corpus.create_or_replace(docs)
    state = build_dedup_state(
        spark, docs, "doc_id", "text",
        os.path.join(root, "fp"), os.path.join(root, "bands"),
    )
    # the rollup tracks corpus size per text-length bucket — any stable
    # derived key works; the MERGE needs at least one group column
    def with_bucket(df):
        return df.withColumn(
            "len_bucket", (F.length("text") / 100).cast("int")
        )

    corpus.create_or_replace(with_bucket(docs))
    rollup = MaterializedRollup(
        spark,
        os.path.join(root, "rollup"),
        corpus,
        group_cols=["len_bucket"],
        sum_cols=[],
    )
    rollup.rebuild()
    print(f"day 0: corpus {corpus.read().count()} docs, "
          f"artifacts at v{state.fingerprints.current_version()}")

    # ---- days 1..3: deltas ------------------------------------------
    deltas = [
        # day 1: one-third replayed copies + some genuinely new docs
        docs.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 7 == 1).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.md5("text").alias("text"),
            )
        ),
        # day 2: whitespace-jittered near-dups of day-0 docs
        docs.filter(F.col("doc_id") % 5 == 2).select(
            (F.col("doc_id") + 3_000_000).alias("doc_id"),
            F.regexp_replace("text", " ", "  ").alias("text"),
        ),
        # day 3: yesterday's new docs re-sent (must all be exact dups now)
        docs.filter(F.col("doc_id") % 7 == 1).select(
            (F.col("doc_id") + 4_000_000).alias("doc_id"),
            F.md5("text").alias("text"),
        ),
    ]

    lookup = docs
    for day, delta in enumerate(deltas, start=1):
        verdicts = incremental_neardup_dedup(
            state, delta, lookup, "doc_id", "text"
        ).localCheckpoint()
        counts = {
            r["status"]: r["n"]
            for r in verdicts.groupBy("status").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        new_rows = delta.join(
            verdicts.filter(F.col("status") == "new").select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        )
        corpus.append(with_bucket(new_rows))
        n_folded = rollup.refresh()
        lookup = lookup.unionByName(new_rows)
        print(
            f"day {day}: delta {delta.count()} → "
            f"exact_dup {counts.get('exact_dup', 0)}, "
            f"near_dup {counts.get('near_dup', 0)}, "
            f"new {counts.get('new', 0)}; "
            f"rollup folded {n_folded} rows "
            f"(artifacts v{state.fingerprints.current_version()})"
        )

    total = corpus.read().count()
    tracked = rollup.read().agg(F.sum("n_rows")).first()[0]
    assert total == tracked, (total, tracked)
    print(f"final corpus {total} docs; rollup tracks {tracked} — consistent")

    # ---- day 4, after a RESTART: reopen the state from disk alone ---
    # (the production shape — tomorrow's run is a new driver; the
    # signature geometry travels with the artifacts, never with code)
    from iceberg_evaluation_spark.operators.incremental_dedup import (
        open_dedup_state,
    )

    state2 = open_dedup_state(
        spark, os.path.join(root, "fp"), os.path.join(root, "bands")
    )
    replay = deltas[2]  # day-3 docs re-sent to the reopened state
    verdicts = incremental_neardup_dedup(
        state2, replay, lookup, "doc_id", "text", append_new=False
    )
    n_dup = verdicts.filter(F.col("status") != "new").count()
    assert n_dup == replay.count(), "reopened state lost accumulation"
    print(
        f"day 4 (restarted driver): reopened artifacts at "
        f"v{state2.fingerprints.current_version()} "
        f"(shingle_n={state2.shingle_n}, cap={state2.max_bucket}); "
        f"replayed {n_dup} docs all recognized as dups"
    )
    spark.stop()


if __name__ == "__main__":
    main()
