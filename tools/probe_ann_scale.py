#!/usr/bin/env python
"""Durable-ANN scale probe: the standing pipeline's daily similarity
cost must track |delta| + probed cells, never the corpus. Measures
build (one-off), a fixed 5k-vector append, and a 10-query top-k probe
at 1x and 10x corpus; plus the amortized retrain for context. Results
table lives in BENCH_NOTES.md ("Durable-ANN probe").

Usage: python tools/probe_ann_scale.py [--rows 100000]
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
    open_ann_state,
)
from iceberg_evaluation_spark.session import get_spark  # noqa: E402

DIM = 32


def vectors(spark, n, shift=0):
    return spark.range(n).select(
        (F.col("id") + shift).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda p: (
                ((F.col("id") + shift) * (p + 3) % 997) / 997.0
            ).cast("double"),
        ).alias("embedding"),
    )


def probe(spark, rows, n_cells, label):
    work = tempfile.mkdtemp(prefix=f"probe_ann_{label}_")
    corpus = vectors(spark, rows)
    t0 = time.time()
    st = build_ann_state(
        spark, corpus, os.path.join(work, "cent"), os.path.join(work, "assign"),
        n_cells=n_cells, kmeans_iters=2, train_sample_mod=max(1, rows // 20_000),
    )
    build_s = time.time() - t0

    st2 = open_ann_state(
        spark, os.path.join(work, "cent"), os.path.join(work, "assign")
    )
    t0 = time.time()
    st2.append(vectors(spark, 5_000, shift=50_000_000))
    append_s = time.time() - t0

    queries = vectors(spark, 10, shift=90_000_000).withColumnRenamed(
        "vec_id", "query_id"
    )
    all_files = len(
        st2.assignments._read_snapshot(st2.assignments.current_version())[
            "files"
        ]
    )
    probed_files = len(st2.probe_files(queries, nprobe=4))
    t0 = time.time()
    st2.topk(queries, k=10, nprobe=4).count()
    topk_s = time.time() - t0

    t0 = time.time()
    st2.retrain()
    retrain_s = time.time() - t0
    print(
        f"{label}: rows={rows} cells={n_cells} build={build_s:.1f}s "
        f"append5k={append_s:.1f}s topk10={topk_s:.1f}s "
        f"probe_files={probed_files}/{all_files} retrain={retrain_s:.1f}s"
    )


def main():
    rows = 100_000
    argv = sys.argv[1:]
    if "--rows" in argv:
        rows = int(argv[argv.index("--rows") + 1])
    spark = get_spark(app_name="probe_ann_scale")
    # sizing rule: cells scale with the corpus (like bucket counts), so
    # per-cell bytes — and therefore probe cost — stay roughly constant
    probe(spark, rows, 64, "1x")
    probe(spark, rows * 10, 640, "10x")
    spark.stop()


if __name__ == "__main__":
    main()
