#!/usr/bin/env python
"""Takedown write-amplification probe: copy-on-write vs merge-on-read
purge of a scattered victim set from a band-partitioned dedup index.
Results table lives in BENCH_NOTES.md ("Takedown MOR probe").

An id-keyed takedown scatters across the (band, bucket) hash layout, so
the COW path rewrites ~every partition the victims' 16 band rows land
in, while MOR writes one equality-delete file of |victims| keys. The
probe measures both on the same index, plus the read-side cost the MOR
path defers (classification before/after compact()).

Usage: python tools/probe_takedown_mor.py [--docs 50000] [--victims 500]
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
    spark.stop()


if __name__ == "__main__":
    main()
