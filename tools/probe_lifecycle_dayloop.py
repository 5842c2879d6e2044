#!/usr/bin/env python
"""Full-lifecycle day-loop probe (r9 verdict #8): a standing ANN index
living through DAYS of [stream-ingest epoch folds + takedown deletes +
signal-gated maintain()], measuring whether the DAILY cost stays flat
as the corpus accumulates — the 100 TB claim for the whole lifecycle,
not just ingest. Results table lives in BENCH_NOTES.md ("Lifecycle
day-loop probe").

Per day: E epoch folds (append_epoch, delta-sized broadcast-matmul),
one takedown of a slice of ids (AnnState.delete — pruned rewrite of
only the files holding a deleted id), then maintain() with a snapshot
retention budget. The receipts that must stay flat in corpus size:

- fold seconds (tracks |delta|, not corpus);
- delete seconds + files rewritten (tracks the deleted ids' cell
  locality, not corpus);
- probe files + top-k seconds after maintain (tracks nprobe/n_cells
  share of the corpus, kept flat by compaction);
- snapshot-log length (bounded by the retention budget).

Usage: python tools/probe_lifecycle_dayloop.py [--rows 120000]
       [--dim 16] [--days 8] [--epochs-per-day 5]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_evaluation_spark.operators.ann_state import (  # noqa: E402
    build_ann_state,
)
from iceberg_evaluation_spark.session import get_spark  # noqa: E402


def vectors(spark, lo, hi, dim):
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda p: (
                F.when(p == F.col("id") % dim, 1.0).otherwise(0.0)
                + (F.col("id") * (p + 3) % 997) / 9970.0
            ).cast("float"),
        ).alias("embedding"),
    )


def main() -> None:
    argv = sys.argv
    rows = int(argv[argv.index("--rows") + 1]) if "--rows" in argv else 120_000
    dim = int(argv[argv.index("--dim") + 1]) if "--dim" in argv else 16
    days = int(argv[argv.index("--days") + 1]) if "--days" in argv else 8
    epd = (
        int(argv[argv.index("--epochs-per-day") + 1])
        if "--epochs-per-day" in argv
        else 5
    )
    delta_rows = rows // 20  # 5% daily growth
    del_rows = rows // 100   # 1% daily takedown

    spark = get_spark(app_name="probe-dayloop", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="dayloop_")
    st = build_ann_state(
        spark, vectors(spark, 0, rows, dim),
        os.path.join(tmp, "cent"), os.path.join(tmp, "assign"),
        n_cells=16, train_sample_mod=20, retrain_fraction=0.5,
    )
    q = vectors(spark, 0, 5, dim).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    print(
        "day | corpus_rows | fold_s | del_s | del_files_rw | maintain_s |"
        " probe_files | topk_s | snapshots"
    )
    hi = rows
    for day in range(1, days + 1):
        t0 = time.time()
        per_epoch = max(1, delta_rows // epd)
        for e in range(epd):
            st.append_epoch(
                vectors(spark, hi + e * per_epoch, hi + (e + 1) * per_epoch, dim),
                "dayloop", day * 1000 + e,
            )
        hi += epd * per_epoch
        fold_s = time.time() - t0

        # takedown: a deterministic slice across the WHOLE corpus so
        # deletes touch old and new cells alike
        victims = (
            spark.range(0, hi)
            .filter((F.col("id") + day) % (hi // max(1, del_rows)) == 0)
            .select(F.col("id").alias("vec_id"))
        )
        a = st.assignments
        before = len(a._read_snapshot(a.current_version())["files"])
        t0 = time.time()
        st.delete(victims)
        del_s = time.time() - t0
        snap = a._read_snapshot(a.current_version())
        rw = int(snap["summary"].get("rewritten_files", 0))

        t0 = time.time()
        st.maintain(keep_last_snapshots=4)
        maintain_s = time.time() - t0

        pf = len(st.probe_files(q, nprobe=4))
        t0 = time.time()
        st.topk(q, k=10, nprobe=4).collect()
        topk_s = time.time() - t0
        n_snaps = len(a._snapshots())
        n_rows = a.read().count()
        print(
            f"{day:3d} | {n_rows:11d} | {fold_s:6.2f} | {del_s:5.2f} |"
            f" {rw:12d} | {maintain_s:10.2f} | {pf:11d} | {topk_s:6.2f} |"
            f" {n_snaps:9d}  (files_before_del={before})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
