#!/usr/bin/env python
"""Inverted-list fragmentation probe: measure how a long-lived
streaming ingest loop (one file per touched cell per epoch fold)
degrades IVF probe latency, and what `AnnState.compact()` restores.
Results table lives in BENCH_NOTES.md ("Fragmentation probe").

Usage: python tools/probe_ann_fragmentation.py [--rows 200000]
       [--dim 16] [--epochs 40]
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


def probe_cost(st, q, nprobe=4):
    files = st.probe_files(q, nprobe)
    t0 = time.time()
    st.topk(q, k=10, nprobe=nprobe).collect()
    return len(files), time.time() - t0


def main() -> None:
    rows = int(sys.argv[sys.argv.index("--rows") + 1]) if "--rows" in sys.argv else 200_000
    dim = int(sys.argv[sys.argv.index("--dim") + 1]) if "--dim" in sys.argv else 16
    epochs = int(sys.argv[sys.argv.index("--epochs") + 1]) if "--epochs" in sys.argv else 40

    spark = get_spark(app_name="probe-ann-frag", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="annfrag_")
    corpus = vectors(spark, 0, rows, dim)
    st = build_ann_state(
        spark, corpus,
        os.path.join(tmp, "cent"), os.path.join(tmp, "assign"),
        n_cells=16, train_sample_mod=20,
    )
    q = vectors(spark, 0, 8, dim).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = max(1, rows // (epochs * 20))  # ~5% of corpus streamed in
    f0, t0 = probe_cost(st, q)
    print(f"fresh index:      files_probed={f0:4d} topk_s={t0:.2f}")

    for e in range(epochs):
        st.append_epoch(
            vectors(spark, rows + e * batch, rows + (e + 1) * batch, dim),
            "frag-probe", e,
        )
    f1, t1 = probe_cost(st, q)
    n_files_frag = len(
        st.assignments._read_snapshot(st.assignments.current_version())["files"]
    )
    print(
        f"after {epochs} epochs:  files_probed={f1:4d} topk_s={t1:.2f} "
        f"(table files={n_files_frag})"
    )

    receipt = st.compact()
    f2, t2 = probe_cost(st, q)
    print(
        f"after compact():  files_probed={f2:4d} topk_s={t2:.2f} "
        f"(table files {receipt['files_before']} -> {receipt['files_after']})"
    )


if __name__ == "__main__":
    main()
