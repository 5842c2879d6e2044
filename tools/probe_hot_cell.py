#!/usr/bin/env python
"""Hot-cell stress probe (r8 verdict #3): measure how an IVF probe's
cost degrades when an adversarial embedding distribution piles into ONE
inverted-list cell, and what `AnnState.split_cell` (cell evolution)
restores. Results table lives in BENCH_NOTES.md ("Hot-cell probe").

Usage: python tools/probe_hot_cell.py [--rows 200000] [--dim 16]
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


def skewed_corpus(spark, rows, dim, hot_frac):
    """hot_frac of vectors point (with jitter) along dim 0; the rest
    spread across the other axes — vanilla k-means leaves a fat cell."""
    cut = int(hot_frac * 10)
    return spark.range(rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda p: (
                F.when((F.col("id") % 10 < cut) & (p == 0), 1.0)
                .when(
                    (F.col("id") % 10 >= cut)
                    & (p == 1 + F.col("id") % (dim - 1)),
                    1.0,
                )
                .otherwise(0.0)
                + (F.col("id") * (p + 3) % 997) / 9970.0
            ).cast("float"),
        ).alias("embedding"),
    )


def probe_cost(st, q, nprobe=1):
    files = st.probe_files(q, nprobe)
    nbytes = sum(
        os.path.getsize(os.path.join(st.assignments.root, f)) for f in files
    )
    cells = st.probe_cells(q, nprobe)
    rows = (
        st.assignments.read()
        .filter(F.col("_ann_cell").isin(cells))
        .count()
    )
    t0 = time.time()
    st.topk(q, k=10, nprobe=nprobe).collect()
    wall = time.time() - t0
    return len(files), rows, nbytes, wall


def main():
    rows = 200_000
    dim = 16
    args = sys.argv[1:]
    if "--rows" in args:
        rows = int(args[args.index("--rows") + 1])
    if "--dim" in args:
        dim = int(args[args.index("--dim") + 1])
    spark = get_spark(app_name="probe-hot-cell", shuffle_partitions=16)
    root = tempfile.mkdtemp(prefix="hotcell_")
    corpus = skewed_corpus(spark, rows, dim, hot_frac=0.7)

    st = build_ann_state(
        spark, corpus,
        os.path.join(root, "cent"), os.path.join(root, "assign"),
        n_cells=16, kmeans_iters=2,
    )
    sizes = st.cell_sizes()
    hot = max(sizes, key=sizes.get)
    med = sorted(sizes.values())[len(sizes) // 2]
    print(f"cells: {len(sizes)}, hot cell {hot}: {sizes[hot]:,} B "
          f"vs median {med:,} B ({sizes[hot] / med:.1f}x)")

    hot_qid = (
        st.assignments.read()
        .filter(F.col("_ann_cell") == hot)
        .agg(F.min("vec_id").alias("m"))
        .collect()[0]["m"]
    )
    q = corpus.filter(F.col("vec_id") == hot_qid).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    f0, r0, b0, w0 = probe_cost(st, q)
    print(f"hot probe BEFORE split: {f0} files, {r0:,} rows, "
          f"{b0:,} B, {w0:.2f} s")

    t0 = time.time()
    new_ids = st.split_cell(hot, n_sub=16)
    t_split = time.time() - t0
    print(f"split_cell({hot}, 16) -> {len(new_ids)} sub-cells "
          f"in {t_split:.2f} s (one-partition rewrite)")

    f1, r1, b1, w1 = probe_cost(st, q)
    print(f"hot probe AFTER split:  {f1} files, {r1:,} rows, "
          f"{b1:,} B, {w1:.2f} s")
    print(f"rows/probe reduction: {r0:,} -> {r1:,} ({r0 / max(r1, 1):.1f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
