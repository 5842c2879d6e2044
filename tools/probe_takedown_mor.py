#!/usr/bin/env python
"""Takedown write-amplification probe: copy-on-write vs merge-on-read
purge of a scattered victim set from a band-partitioned dedup index.
Results table lives in BENCH_NOTES.md ("Takedown MOR probe").

An id-keyed takedown scatters across the (band, bucket) hash layout, so
the COW path rewrites ~every partition the victims' 16 band rows land
in, while MOR writes one equality-delete file of |victims| keys. The
probe measures both on the same index, plus the read-side cost the MOR
path defers (classification before/after compact()).

The ANN section (r10 verdict #1) runs the same experiment on the IVF
inverted lists: takedown victims are content-arbitrary, so their
vectors scatter across cells exactly as band hashes scatter across
partitions — COW rewrites one file per victim-holding cell, MOR writes
one equality-delete file of |victims| keys; the probe asserts the
top-k results are IDENTICAL under both modes and times the
maintain() materialization MOR defers.

Usage: python tools/probe_takedown_mor.py [--docs 50000] [--victims 500]
       [--vecs 200000] [--dim 32] [--cells 32]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_evaluation_spark.operators.incremental_dedup import (  # noqa: E402
    build_dedup_state,
)
from iceberg_evaluation_spark.session import get_spark  # noqa: E402


def docs_frame(spark, n):
    # word-salad docs: deterministic, unique, ~15 tokens each
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), ((F.col("id") * (j + 3)) % 9973))
                for j in range(15)
            ],
        ).alias("text"),
    )


def main() -> None:
    argv = sys.argv
    n_docs = int(argv[argv.index("--docs") + 1]) if "--docs" in argv else 50_000
    n_vic = (
        int(argv[argv.index("--victims") + 1]) if "--victims" in argv else 500
    )
    spark = get_spark(app_name="probe-takedown", shuffle_partitions=32)
    docs = docs_frame(spark, n_docs).localCheckpoint()
    victims = docs.filter(F.col("doc_id") % (n_docs // n_vic) == 0).select(
        "doc_id"
    )
    print(f"docs={n_docs} victims={victims.count()}  (index_partitions=32)")
    print("mode | delete_s | rewritten_files | delete_files | files_total")
    for mode in ("copy-on-write", "merge-on-read"):
        tmp = tempfile.mkdtemp(prefix=f"tkdn_{mode[:3]}_")
        state = build_dedup_state(
            spark, docs, "doc_id", "text",
            os.path.join(tmp, "fp"), os.path.join(tmp, "bands"),
            index_partitions=32,
        )
        t0 = time.time()
        state.apply_deletes(victims, mode=mode)
        dt = time.time() - t0
        snap = state.bands._read_snapshot(state.bands.current_version())
        print(
            f"{mode:14s} | {dt:8.2f} | {snap['summary'].get('rewritten_files', 0):15d} |"
            f" {len(snap.get('delete_files') or []):12d} | {len(snap['files']):11d}"
        )
        if mode == "merge-on-read":
            t0 = time.time()
            state.compact()
            print(f"  compact (materializes deletes): {time.time() - t0:.2f}s")

    # ---------------------------------------------------------- ANN section
    from iceberg_evaluation_spark.operators.ann_state import build_ann_state

    n_vecs = int(argv[argv.index("--vecs") + 1]) if "--vecs" in argv else 200_000
    dim = int(argv[argv.index("--dim") + 1]) if "--dim" in argv else 32
    cells = int(argv[argv.index("--cells") + 1]) if "--cells" in argv else 32
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda p: (
                F.when(p == F.col("id") % dim, 1.0).otherwise(0.0)
                + (F.col("id") * (p + 3) % 997) / 9970.0
            ).cast("float"),
        ).alias("embedding"),
    ).localCheckpoint()
    # an ODD victim stride: a round stride (n/victims = 400) shares the
    # synthetic corpus's power-of-two direction-group period, which
    # accidentally concentrates every victim into ~2 cells — real
    # takedown batches are content-arbitrary, so the probe must scatter
    # (odd ⇒ coprime with the dim-periodic group structure, victims hit
    # every direction group and therefore ~every cell)
    stride = max(3, (n_vecs // n_vic) | 1)
    ann_victims = vecs.filter(
        F.col("vec_id") % stride == 0
    ).select("vec_id")
    q = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    print(
        f"\nANN: vecs={n_vecs} dim={dim} cells={cells} "
        f"victims={ann_victims.count()}"
    )
    print(
        "mode | delete_s | rewritten_files | delete_files | files_total"
        " | topk_s"
    )
    results = {}
    for mode in ("copy-on-write", "merge-on-read"):
        tmp = tempfile.mkdtemp(prefix=f"tkdn_ann_{mode[:3]}_")
        st = build_ann_state(
            spark, vecs, os.path.join(tmp, "cent"),
            os.path.join(tmp, "assign"), n_cells=cells,
            train_sample_mod=50,
        )
        t0 = time.time()
        st.delete(ann_victims, mode=mode)
        dt = time.time() - t0
        snap = st.assignments._read_snapshot(
            st.assignments.current_version()
        )
        t0 = time.time()
        results[mode] = sorted(
            (r["query_id"], r["vec_id"], r["rk"], r["cosine_sim"])
            for r in st.topk(q, k=10, nprobe=4).collect()
        )
        topk_s = time.time() - t0
        print(
            f"{mode:14s} | {dt:8.2f} |"
            f" {snap['summary'].get('rewritten_files', 0):15d} |"
            f" {len(snap.get('delete_files') or []):12d} |"
            f" {len(snap['files']):11d} | {topk_s:6.2f}"
        )
        if mode == "merge-on-read":
            t0 = time.time()
            st.maintain()
            print(
                f"  maintain (materializes deletes): {time.time() - t0:.2f}s"
            )
    assert results["copy-on-write"] == results["merge-on-read"], (
        "probe results diverged between modes"
    )
    print("probe results identical under both modes: OK")
    spark.stop()


if __name__ == "__main__":
    main()
