#!/usr/bin/env python
"""Metadata-plane probe: manifest-embedded file stats vs per-query
footer reads. Results table lives in BENCH_NOTES.md ("Manifest stats
probe").

Iceberg's scan planner never opens data-file footers at query time —
lower/upper bounds ride the manifest, written once per commit. This
probe builds a snapshot table with N files, then times pruned_files()
both ways on the SAME snapshot: (a) as committed (manifest stats),
(b) with the file_stats key stripped (the pre-upgrade fallback that
re-reads every footer per query). At 100 TB / ~1M files the fallback
is O(files) driver IO per query; the manifest walk is a dict scan.

Also receipts that both paths keep EXACTLY the same file set — the
stats are a cache of the same bounds, so pruning decisions must be
byte-identical.

Usage: python tools/probe_manifest_stats.py [--files 400] [--rows 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_evaluation_spark.session import get_spark  # noqa: E402
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=400)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="probe_mstats_")
    t = SnapshotTable(spark, root)

    # k is range-clustered so predicates genuinely prune
    df = (
        spark.range(args.rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 37 % 1000).alias("grp"),
            (F.col("id").cast("double") / 7.0).alias("v"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        )
        .repartitionByRange(args.files, "k")
    )
    t.create_or_replace(df)
    snap = t._read_snapshot(t.current_version())
    n_files = len(snap["files"])
    filters = [("k", "between", (args.rows // 2, args.rows // 2 + args.rows // 100))]

    def timed(fn):
        best = None
        for _ in range(args.trials):
            t0 = time.perf_counter()
            out = fn()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return out, best

    kept_manifest, s_manifest = timed(lambda: t.pruned_files(filters))

    # strip the stats → the per-query footer fallback
    p = t._snapshot_path(t.current_version())
    stripped = dict(snap)
    stripped.pop("file_stats", None)
    os.remove(p)
    with open(p, "w") as f:
        json.dump(stripped, f)
    t2 = SnapshotTable(spark, root)
    kept_footer, s_footer = timed(lambda: t2.pruned_files(filters))

    same = sorted(kept_manifest) == sorted(kept_footer)
    print(
        json.dumps(
            {
                "files": n_files,
                "kept": len(kept_manifest),
                "prune_identical": same,
                "manifest_s": round(s_manifest, 4),
                "footer_s": round(s_footer, 4),
                "speedup": round(s_footer / max(s_manifest, 1e-9), 1),
            }
        )
    )
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
