#!/usr/bin/env python
"""CDC window-batching probe (r10 "What's missing" #3): a source that
commits MANY small CDC windows between syncs makes the per-version
`sync_from_cdf` loop pay one-plus Spark jobs per source commit even
when the total delta is tiny. `batch_windows=True` applies the whole
pending span as ONE net diff — this probe measures both on identical
histories and checks the final index contents are identical.

Results table lives in BENCH_NOTES.md ("CDC window-batching probe").

Usage: python tools/probe_sync_batching.py [--rows 100000]
       [--windows 40] [--delta 250] [--dim 16]
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
from iceberg_evaluation_spark.tables.snapshot_table import (  # noqa: E402
    MergeClause,
    SnapshotTable,
)


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
    rows = int(argv[argv.index("--rows") + 1]) if "--rows" in argv else 100_000
    n_win = int(argv[argv.index("--windows") + 1]) if "--windows" in argv else 40
    delta = int(argv[argv.index("--delta") + 1]) if "--delta" in argv else 250
    dim = int(argv[argv.index("--dim") + 1]) if "--dim" in argv else 16

    spark = get_spark(app_name="probe-sync-batching", shuffle_partitions=32)

    def setup(tag):
        work = tempfile.mkdtemp(prefix=f"syncb_{tag}_")
        corpus = SnapshotTable(spark, os.path.join(work, "corpus"))
        corpus.create_or_replace(vectors(spark, 0, rows, dim))       # v1
        st = build_ann_state(
            spark, corpus.read(1),
            os.path.join(work, "cent"), os.path.join(work, "assign"),
            n_cells=16, train_sample_mod=20, retrain_fraction=10.0,
        )
        hi = rows
        for w in range(n_win):
            if w % 5 == 4:  # every fifth window is a small takedown
                corpus.merge(
                    corpus.read().filter(
                        (F.col("vec_id") + w) % (rows // 50) == 0
                    ).select("vec_id", F.lit(True).alias("_d")),
                    on=["vec_id"],
                    clause=MergeClause(
                        matched_delete_condition="s._d",
                        insert_when_not_matched=False,
                    ),
                )
            else:
                corpus.append(vectors(spark, hi, hi + delta, dim))
                hi += delta
        return corpus, st

    results = {}
    for tag, batched in (("per-version", False), ("batched", True)):
        corpus, st = setup(tag[:4])
        v0 = st.assignments.current_version()
        t0 = time.time()
        r = st.sync_from_cdf(
            corpus, ["vec_id"], query_id="p", from_version=1,
            delete_mode="merge-on-read", batch_windows=batched,
        )
        wall = time.time() - t0
        commits = st.assignments.current_version() - v0
        ids = st.assignments.read().select("vec_id")
        src = corpus.read().select("vec_id")
        clean = ids.exceptAll(src).isEmpty() and src.exceptAll(ids).isEmpty()
        results[tag] = (wall, commits, r, clean)
        print(
            f"{tag:12s} | windows {r['windows']:3d} | folded {r['folded']:6d}"
            f" | purged {r['purged']:5d} | index_commits {commits:3d}"
            f" | sync_s {wall:7.2f} | contents==corpus {clean}"
        )
    pv, bw = results["per-version"], results["batched"]
    assert pv[3] and bw[3], "contents diverged from the corpus"
    print(
        f"speedup {pv[0] / max(bw[0], 1e-9):.1f}x, commit reduction "
        f"{pv[1]}→{bw[1]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
