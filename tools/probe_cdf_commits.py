#!/usr/bin/env python
"""CDF window-growth probe (r7 verdict #8): a table_changes window
spanning MANY small commits must cost O(|changes| + window file count),
not O(commit count) per se. Fixed 30k-row change volume split across
10/100/300 append commits, writer right-sized (one file per tiny
commit, as a production ingest writer does); plus one sloppy-writer row
(32 files per 100-row commit) to price the small-files anti-pattern the
table layer's compact() exists for. Results in BENCH_NOTES.md
("CDF window-growth probe").

Usage: python tools/probe_cdf_commits.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_evaluation_spark.operators.changelog import table_changes  # noqa: E402
from iceberg_evaluation_spark.session import get_spark  # noqa: E402
from iceberg_evaluation_spark.tables.snapshot_table import SnapshotTable  # noqa: E402


def run(spark, n_commits, rows_total, files_per_commit, label):
    work = tempfile.mkdtemp(prefix=f"probe_cdfc_{label}_")
    t = SnapshotTable(spark, os.path.join(work, "t"))
    t.create_or_replace(
        spark.range(100_000).selectExpr(
            "id", "id * 3 AS v", "CAST(id % 8 AS STRING) AS grp"
        ),
        partitions=8,
    )
    per = rows_total // n_commits
    for i in range(n_commits):
        lo = 1_000_000 + i * per
        t.append(
            spark.range(lo, lo + per)
            .selectExpr("id", "id * 3 AS v", "CAST(id % 8 AS STRING) AS grp")
            .coalesce(files_per_commit)
        )
    n_files = len(t._read_snapshot(t.current_version())["files"]) - 8
    t0 = time.time()
    ch = table_changes(t, ["id"], 1, 1 + n_commits)
    n = ch.count()
    wall = time.time() - t0
    assert n == per * n_commits, (n, per * n_commits)
    print(
        f"{label}: commits={n_commits} window_files={n_files} "
        f"change_rows={n} cdf_wall={wall:.2f}s"
    )
    return wall


def main():
    spark = get_spark(app_name="probe_cdf_commits")
    for n in (10, 100, 300):
        run(spark, n, 30_000, 1, f"sized_{n}")
    # the anti-pattern: a 100-row append exploded into 32 files/commit
    run(spark, 100, 30_000, 32, "sloppy_100x32")
    spark.stop()


if __name__ == "__main__":
    main()
