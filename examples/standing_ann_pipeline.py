#!/usr/bin/env python
"""The daily similarity-search loop: serve top-k against a PERSISTED
IVF index without retraining per run.

    day 0   train the quantizer once; persist centroids +
            cell-partitioned inverted lists + geometry (build_ann_state)
    day 1.. for each delta drop:
              open_ann_state (geometry from disk, never the caller) →
              append: assign delta to existing centroids (one broadcast
              matmul over the delta, no corpus read) →
              topk: probe nprobe cells, file-pruned to their partitions
    weekly  maintain() — one signal-gated pass: retrain() when stale
            (the amortized full-corpus rebalance), split_cell() on hot
            cells, compact() when epoch folds fragmented the lists,
            expire_snapshots last (replay markers survive via the
            epoch_marks/ floor)

    python examples/standing_ann_pipeline.py [SF_DIR]

This is q129's shape as a library loop (plans/corpus_scale.py adds the
exact-recall twin and the driver oracle); costs are measured in
BENCH_NOTES.md ("Durable-ANN probe"): top-k stays flat at 10x corpus
when n_cells scales with the corpus.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_evaluation_spark.operators.ann_state import (
    build_ann_state,
    open_ann_state,
)
from iceberg_evaluation_spark.session import get_spark
from iceberg_evaluation_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="standing-ann-pipeline")
    work = tempfile.mkdtemp(prefix="ann_pipeline_")
    cent, assign = os.path.join(work, "cent"), os.path.join(work, "assign")

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    head = emb.filter(F.col("vec_id") % 5 != 0)

    # ---- day 0: train once, persist everything -------------------------
    st = build_ann_state(
        spark, head, cent, assign, n_cells=16, retrain_fraction=0.2
    )
    print(f"day 0: trained on {st.n_at_train} vectors, {st.n_cells} cells")

    # ---- day 1..n: reopen, fold the delta, serve ------------------------
    for day, mod in enumerate((0, 5), start=1):  # two synthetic drops
        st = open_ann_state(spark, cent, assign)  # the restart
        delta = emb.filter(
            (F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 10 == mod)
        ).select(
            (F.col("vec_id") + day * 1_000_000).alias("vec_id"), "embedding"
        )
        n = st.append(delta)
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        hits = st.topk(queries, k=3, nprobe=4)
        probe = len(st.probe_files(queries, nprobe=4))
        total = len(
            st.assignments._read_snapshot(
                st.assignments.current_version()
            )["files"]
        )
        print(
            f"day {day}: appended {n}, top-3 served for 3 queries "
            f"({hits.count()} rows) reading {probe}/{total} index files, "
            f"stale={st.stale()}"
        )

    # ---- the scheduled maintenance pass ---------------------------------
    # one signal-gated call: retrain if stale, split hot cells, bin-pack
    # stream fragments, expire old snapshots (exactly-once markers
    # survive expiry via the epoch_marks/ carry-forward)
    r = st.maintain(keep_last_snapshots=2)
    print(
        f"maintain: retrained={r['retrained']} "
        f"splits={len(r['split_cells'])} compacted={r['compacted']} "
        f"expired={r['expired']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
