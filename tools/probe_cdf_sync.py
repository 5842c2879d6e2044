#!/usr/bin/env python
"""CDF replica-sync scale probe: apply_changes' cost must track the
CHANGE volume, not the table size. Measures (a) one base size with
growing change windows and (b) a 10x base with the same fixed window.
Results table lives in BENCH_NOTES.md ("CDF replica-sync probe").

Usage: python tools/probe_cdf_sync.py [--rows 600000]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_evaluation_spark.operators.changelog import (  # noqa: E402
    apply_changes,
    table_changes,
)
from iceberg_evaluation_spark.session import get_spark  # noqa: E402
from iceberg_evaluation_spark.tables.snapshot_table import (  # noqa: E402
    MergeClause,
    SnapshotTable,
)


def build(spark, rows, files, root):
    t = SnapshotTable(spark, root)
    t.create_or_replace(
        spark.range(rows).selectExpr(
            "id", "id * 3 AS v", "CAST(id % 97 AS STRING) AS grp"
        ).repartition(files, "id"),
        partitions=files,
    )
    return t


def probe(spark, rows, files, pct, label):
    work = tempfile.mkdtemp(prefix=f"probe_cdf_{label}_")
    src = build(spark, rows, files, os.path.join(work, "src"))
    rep = SnapshotTable(spark, os.path.join(work, "rep"))
    rep.create_or_replace(src.read())
    n_upd = max(1, int(rows * pct))
    step = max(1, rows // n_upd)
    src.merge(
        spark.range(0, rows, step).selectExpr(
            "id", "id * 3 + 1 AS v", "CAST(id % 97 AS STRING) AS grp"
        ),
        on=["id"],
        clause=MergeClause(matched_update={"v": "s.v"}),
    )
    t0 = time.time()
    ch = table_changes(src, ["id"], 1, 2)
    n = apply_changes(rep, ch, ["id"])
    wall = time.time() - t0
    # spot-verify the sync
    a = rep.read().agg(F.sum("v")).collect()[0][0]
    b = src.read().agg(F.sum("v")).collect()[0][0]
    assert a == b, "replica diverged"
    print(
        f"{label}: rows={rows} window={pct:.3%} change_rows={n} "
        f"sync={wall:.2f}s"
    )


def main():
    rows = 600_000
    argv = sys.argv[1:]
    if "--rows" in argv:
        rows = int(argv[argv.index("--rows") + 1])
    spark = get_spark(app_name="probe_cdf_sync")
    for pct in (0.001, 0.01, 0.1):
        probe(spark, rows, 32, pct, f"1x_{pct}")
    probe(spark, rows * 10, 64, 0.001, "10x_0.001")
    spark.stop()


if __name__ == "__main__":
    main()
